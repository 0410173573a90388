"""URL canonicalization / URL dedup / HTML extraction (scale/web.py)."""

import pytest
from pyspark.sql import functions as F

from trackintel_spark.scale import (
    canonicalize_url,
    dedup_url,
    extract_html_text,
    strip_html_expr,
    url_host,
)
from trackintel_spark.scale._htmlkernel import parse_html

CANON_CASES = [
    # (input, expected canonical with strip_www=True)
    ("HTTPS://WWW.Example.COM:443/a//b/?utm_source=x&b=2&a=1#frag", "https://example.com/a/b?a=1&b=2"),
    ("https://example.com/a/b?a=1&b=2", "https://example.com/a/b?a=1&b=2"),
    ("http://example.com:8080/path/", "http://example.com:8080/path"),
    ("https://example.com", "https://example.com/"),
    ("http://Example.com:80/", "http://example.com/"),
    ("https://example.com/a/b?b=2&a=1&fbclid=XYZ", "https://example.com/a/b?a=1&b=2"),
    ("https://example.com/?UTM_CAMPAIGN=x", "https://example.com/"),  # tracking match is case-insensitive
    ("https://example.com/p?ref=abc&q=1", "https://example.com/p?q=1"),
    ("https://example.com/p?refresh=1", "https://example.com/p?refresh=1"),  # prefix must not over-match
    ("https://sub.www.example.com/x", "https://sub.www.example.com/x"),  # only LEADING www. strips
    ("  https://example.com/x  ", "https://example.com/x"),
    ("not a url", "not a url"),
    ("ftp://example.com/x", "ftp://example.com/x"),  # non-http(s) untouched
    ("https://example.com:444/x", "https://example.com:444/x"),  # non-default port kept
]


def _urls_df(spark, pairs):
    return spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(pairs)], "doc_id long, url string"
    )


def test_canonicalize_url_rules(spark):
    df = _urls_df(spark, CANON_CASES)
    got = {r.doc_id: r.c for r in df.select("doc_id", canonicalize_url("url").alias("c")).collect()}
    for i, (inp, want) in enumerate(CANON_CASES):
        assert got[i] == want, f"{inp!r}: {got[i]!r} != {want!r}"


def test_canonicalize_url_idempotent(spark):
    df = _urls_df(spark, CANON_CASES)
    once = df.select("doc_id", canonicalize_url("url").alias("c"))
    twice = once.select("doc_id", canonicalize_url("c").alias("c2"), "c")
    assert twice.filter(F.col("c") != F.col("c2")).count() == 0


def test_canonicalize_keep_www(spark):
    df = _urls_df(spark, [("https://www.example.com/x", None)])
    got = df.select(canonicalize_url("url", strip_www=False).alias("c")).collect()[0].c
    assert got == "https://www.example.com/x"


def test_url_host(spark):
    df = _urls_df(
        spark,
        [
            ("https://WWW.Example.com:8443/a?b=1", None),
            ("http://foo.bar.baz/", None),
        ],
    )
    got = [r.h for r in df.select(url_host("url").alias("h")).collect()]
    assert got == ["example.com", "foo.bar.baz"]


def test_dedup_url_keeps_min_id_and_counts(spark):
    rows = [
        (10, "https://www.example.com/a/?utm_source=t"),
        (3, "https://example.com/a"),
        (7, "HTTPS://EXAMPLE.COM:443/a"),
        (5, "https://example.com/b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r.doc_id: r for r in dedup_url(df).collect()}
    assert set(out) == {3, 5}
    assert out[3].url_dup_count == 3 and out[3].canonical_url == "https://example.com/a"
    assert out[5].url_dup_count == 1


def test_dedup_url_single_exchange(spark):
    df = spark.createDataFrame([(1, "https://example.com/a")], "doc_id long, url string")
    plan = dedup_url(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


HTML_DOC = (
    "<html><head><title>The Title</title><style>p {color: red}</style></head>"
    "<body><h1>Head&nbsp;line</h1><p>First paragraph with <b>bold</b> text.</p>"
    "<script type='text/javascript'>var x = '<p>not text</p>';</script>"
    "<!-- a comment with <p>markup</p> -->"
    "<ul><li>item one</li><li>item two</li></ul>"
    "<a href='/next'>next page</a> trailing &amp; done</body></html>"
)
HTML_BODY_WORDS = (
    "Head line First paragraph with bold text. item one item two next page trailing & done"
)


def test_strip_html_expr(spark):
    df = spark.createDataFrame([(0, HTML_DOC)], "doc_id long, html string")
    got = df.select(strip_html_expr("html").alias("t")).collect()[0].t
    # the codegen path keeps <title> text (documented contract)
    assert got == "The Title " + HTML_BODY_WORDS


def test_strip_html_expr_is_codegen_only(spark):
    df = spark.createDataFrame([(0, HTML_DOC)], "doc_id long, html string")
    out = df.select(strip_html_expr("html").alias("t"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan, plan


def test_extract_html_text_kernel(spark):
    df = spark.createDataFrame(
        [(0, HTML_DOC), (1, "<p>broken <b>markup"), (2, None)], "doc_id long, html string"
    )
    got = {r.doc_id: r for r in extract_html_text(df).collect()}
    assert got[0].text == HTML_BODY_WORDS
    assert got[0].title == "The Title"
    assert got[0].n_links == 1
    assert 0.0 < got[0].link_density < 0.5
    assert got[1].text == "broken markup"  # tolerant of unclosed tags
    assert got[2].text == "" and got[2].n_links == 0


def test_extract_html_text_no_shuffle(spark):
    df = spark.createDataFrame([(0, HTML_DOC)], "doc_id long, html string")
    out = extract_html_text(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_parse_html_full_entity_table():
    text, title, links, tags, dens = parse_html("<p>caf&eacute; &copy; 2024 &#x2713;</p>")
    assert text == "café © 2024 ✓"


def test_strip_vs_kernel_word_parity(spark):
    """On entity-light, title-less fragments the fast path and the exact
    parser agree word-for-word."""
    frags = [
        (i, f"<div><p>alpha {i} beta</p><script>no();</script><span>gamma</span></div>")
        for i in range(20)
    ]
    df = spark.createDataFrame(frags, "doc_id long, html string")
    fast = {r.doc_id: r.t for r in df.select("doc_id", strip_html_expr("html").alias("t")).collect()}
    exact = {r.doc_id: r.text for r in extract_html_text(df).collect()}
    assert fast == exact


# -- differential fuzz: Spark canonicalization vs a urllib reference ----------


def _py_canonicalize(u, strip_www=True):
    """Independent reference implementation on Python stdlib parsing."""
    import re
    from urllib.parse import urlsplit

    u = u.strip()
    if not re.match(r"^[Hh][Tt][Tt][Pp][Ss]?://[^/?#]+", u):
        return u
    nofrag = re.sub(r"#.*$", "", u)
    parts = urlsplit(nofrag)
    scheme = parts.scheme.lower()
    hostport = parts.netloc.lower()
    m = re.search(r":(\d+)$", hostport)
    port = m.group(1) if m else ""
    host = re.sub(r":\d+$", "", hostport)
    if strip_www:
        host = re.sub(r"^www\.", "", host)
    if (scheme == "http" and port == "80") or (scheme == "https" and port == "443") or not port:
        portpart = ""
    else:
        portpart = ":" + port
    path = re.sub(r"/{2,}", "/", parts.path)
    if path == "":
        path = "/"
    elif path != "/" and path.endswith("/"):
        path = path[:-1]
    track = re.compile(
        r"^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|dclid|mc_cid|mc_eid|igshid|"
        r"spm|ref|ref_src|_ga|_gl)(=.*)?$"
    )
    params = sorted(p for p in parts.query.split("&") if p and not track.match(p.lower()))
    q = ("?" + "&".join(params)) if params else ""
    return f"{scheme}://{host}{portpart}{path}{q}"


def test_canonicalize_url_differential_fuzz(spark):
    """Random URLs assembled from parts: the Spark expression chain and
    the urllib-based reference must agree exactly, and the result must
    be a fixed point."""
    import random

    rng = random.Random(20260816)
    schemes = ["http", "https", "HTTP", "Https"]
    hosts = ["Example.com", "www.Example.com", "sub.www.host.ORG", "a-b.c0.net"]
    ports = ["", ":80", ":443", ":8080", ":65535"]
    paths = ["", "/", "/a", "/a/", "/a//b", "/a/b/c/", "//x", "/%7Euser"]
    params = ["", "a=1", "b=2", "utm_source=x", "UTM_MEDIUM=y", "fbclid=1", "z", "ref=5", "refx=6"]
    frags = ["", "#f", "#a/b?c=1"]
    urls = []
    for i in range(300):
        q = "&".join(rng.sample(params, rng.randint(0, 4)))
        u = (
            rng.choice(schemes) + "://" + rng.choice(hosts) + rng.choice(ports)
            + rng.choice(paths) + (("?" + q) if q else "") + rng.choice(frags)
        )
        urls.append((i, u))
    # plus hostile non-URLs that must pass through untouched (mod trim)
    for j, junk in enumerate(["", "   ", "no scheme here", "http:/half", "mailto:x@y.z"]):
        urls.append((1000 + j, junk))
    df = spark.createDataFrame(urls, "doc_id long, url string")
    got = {
        r.doc_id: (r.c, r.c2)
        for r in df.select(
            "doc_id",
            canonicalize_url("url").alias("c"),
        ).withColumn("c2", canonicalize_url(F.col("c"))).collect()
    }
    for i, u in urls:
        want = _py_canonicalize(u)
        c, c2 = got[i]
        assert c == want, f"{u!r}: spark={c!r} ref={want!r}"
        assert c2 == c, f"not idempotent: {u!r} -> {c!r} -> {c2!r}"


def test_url_dedup_incremental_composition(spark):
    """Nightly crawl-frontier dedup: canonicalize, then reuse the exact
    incremental index keyed on the canonical string (scale/incremental.py
    generalizes over its text_col). History wins over the shard; a
    re-fetch under fresh tracking params is recognized."""
    from trackintel_spark.scale import canonicalize_url
    from trackintel_spark.scale.incremental import (
        build_exact_index,
        dedup_against_index,
        merge_exact_index,
    )

    day1 = spark.createDataFrame(
        [(0, "https://example.com/a"), (1, "https://example.com/b")],
        "doc_id long, url string",
    ).withColumn("canonical_url", canonicalize_url("url"))
    index = build_exact_index(day1, text_col="canonical_url")

    day2 = spark.createDataFrame(
        [
            (10, "https://WWW.example.com/a/?utm_source=mail"),  # re-fetch of 0
            (11, "https://example.com/c"),
            (12, "https://example.com/c?fbclid=x"),  # within-shard dup of 11
        ],
        "doc_id long, url string",
    ).withColumn("canonical_url", canonicalize_url("url"))
    out = {r.doc_id: r for r in dedup_against_index(day2, index, text_col="canonical_url").collect()}
    assert out[10].dup_of == 0 and not out[10].is_new
    assert out[11].is_new and out[11].dup_of is None
    assert out[12].dup_of == 11 and not out[12].is_new

    kept = dedup_against_index(day2, index, text_col="canonical_url").filter("is_new")
    merged = merge_exact_index(index, build_exact_index(kept, text_col="canonical_url"))
    assert merged.count() == 3  # a, b, c


# -- robots.txt gate ------------------------------------------------------------


ROBOTS = """
# crawler policy
User-agent: specialbot
Disallow: /

User-agent: *
Disallow: /private/
Disallow: /tmp
Allow: /private/public/
Disallow:
"""


def test_parse_robots_txt_groups():
    from trackintel_spark.scale import parse_robots_txt

    rules = parse_robots_txt(ROBOTS)
    assert rules == [(False, "/private/"), (False, "/tmp"), (True, "/private/public/")]
    # exact agent group beats *
    assert parse_robots_txt(ROBOTS, agent="specialbot") == [(False, "/")]
    assert parse_robots_txt(ROBOTS, agent="otherbot") == rules
    assert parse_robots_txt("") == []
    # empty Disallow line adds no rule (allow-all)
    assert parse_robots_txt("User-agent: *\nDisallow:") == []


def test_filter_by_robots_longest_match(spark):
    from trackintel_spark.scale import filter_by_robots

    robots = spark.createDataFrame(
        [("example.com", ROBOTS), ("closed.org", "User-agent: *\nDisallow: /")],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [
            (0, "https://example.com/open/page"),          # no rule -> allowed
            (1, "https://example.com/private/secret"),     # disallow /private/
            (2, "https://example.com/private/public/x"),   # longest match ALLOW
            (3, "https://example.com/tmpfile"),            # prefix match (no slash needed)
            (4, "https://closed.org/anything"),            # blanket disallow
            (5, "https://norobots.net/x"),                 # no robots row
        ],
        "doc_id long, url string",
    )
    got = {r.doc_id: r.robots_allowed for r in filter_by_robots(urls, robots).collect()}
    assert got == {0: True, 1: False, 2: True, 3: False, 4: False, 5: True}
    strict = {r.doc_id: r.robots_allowed
              for r in filter_by_robots(urls, robots, keep_unmatched=False).collect()}
    assert strict[5] is False and strict[0] is True and strict[2] is True
