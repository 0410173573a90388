"""stdlib-HTMLParser document walk for extract_html_text.

Lives in its own module so the Arrow worker imports exactly this file
(plus ``html.parser``) — no Spark imports in the kernel path.
"""

from __future__ import annotations

from html.parser import HTMLParser

_SKIP = {"script", "style", "template", "noscript"}
# block-level elements that imply a word boundary even without
# surrounding whitespace in the source
_BLOCK = {
    "p", "div", "br", "li", "ul", "ol", "table", "tr", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "section", "article", "header",
    "footer", "blockquote", "pre", "hr", "nav", "aside", "form",
}


class _TextWalker(HTMLParser):
    def __init__(self):
        # convert_charrefs=True (default) decodes the FULL entity table
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.title_parts: list[str] = []
        self.skip_depth = 0
        self.in_title = False
        self.in_link = 0
        self.link_chars = 0
        self.total_chars = 0
        self.n_links = 0
        self.n_tags = 0

    def handle_starttag(self, tag, attrs):
        self.n_tags += 1
        if tag in _SKIP:
            self.skip_depth += 1
        elif tag == "title":
            self.in_title = True
        elif tag == "a":
            if any(k == "href" for k, _ in attrs):
                self.n_links += 1
            self.in_link += 1
        if tag in _BLOCK:
            self.parts.append(" ")

    def handle_startendtag(self, tag, attrs):
        self.n_tags += 1
        if tag == "a" and any(k == "href" for k, _ in attrs):
            self.n_links += 1
        if tag in _BLOCK:
            self.parts.append(" ")

    def handle_endtag(self, tag):
        if tag in _SKIP and self.skip_depth > 0:
            self.skip_depth -= 1
        elif tag == "title":
            self.in_title = False
        elif tag == "a" and self.in_link > 0:
            self.in_link -= 1
        if tag in _BLOCK:
            self.parts.append(" ")

    def handle_data(self, data):
        if self.skip_depth:
            return
        if self.in_title:
            self.title_parts.append(data)
            return
        self.parts.append(data)
        n = len(data)
        self.total_chars += n
        if self.in_link:
            self.link_chars += n


def parse_html(html) -> tuple:
    """(text, title, n_links, n_tags, link_density) for one document.

    ``html.parser`` never raises on malformed markup; NULL/non-string
    input yields the all-empty row rather than killing the task.
    """
    if not isinstance(html, str):
        return ("", None, 0, 0, 0.0)
    w = _TextWalker()
    w.feed(html)
    w.close()
    text = " ".join("".join(w.parts).split())
    title = " ".join("".join(w.title_parts).split()) or None
    density = (w.link_chars / w.total_chars) if w.total_chars else 0.0
    return (text, title, w.n_links, w.n_tags, round(density, 6))
