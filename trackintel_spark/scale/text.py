"""Text-analysis operators for training-data pipelines.

All pure Column expressions (JVM-side, codegen) — designed to sweep
100 TB of documents without Python in the hot path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A small multilingual stopword sample per language for the n-gram/
# stopword-ratio language heuristic. Public knowledge (common words).
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    # common function words, mutually disambiguating (shared forms like
    # es/pt "que" appear for both and wash out; unique ones decide)
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "une", "que", "pas"),
    "es": ("el", "la", "los", "y", "es", "una", "que", "no"),
    "it": ("il", "che", "di", "non", "per", "sono", "una", "gli"),
    "pt": ("o", "de", "que", "não", "uma", "para", "com", "são"),
    "nl": ("de", "het", "een", "van", "niet", "dat", "zijn", "ook"),
    "pl": ("nie", "się", "jest", "czy", "tak", "ale", "jak", "być"),
    "sv": ("och", "att", "det", "som", "är", "inte", "jag", "med"),
    "tr": ("bir", "bu", "ve", "için", "değil", "gibi", "daha", "çok"),
    "id": ("yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "adalah"),
}

_EN_STOPWORDS = _LANG_MARKERS["en"] + ("a", "an", "for", "on", "with", "as", "at", "by")


def tokens(text: Column) -> Column:
    """Whitespace tokenization with lowercasing; empty strings removed."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def token_count(text: Column, method: str = "whitespace") -> Column:
    """Token count: 'whitespace' splits on runs of whitespace; 'bpe_ish'
    counts word-piece-like units (letter runs, digit runs, punctuation
    singletons) via regex — a cheap stand-in for BPE vocab size."""
    if method == "whitespace":
        return F.size(tokens(text))
    if method == "bpe_ish":
        return F.size(
            F.filter(
                F.split(F.lower(text), r"([^a-z0-9]+)|(?<=[a-z]{6})"), lambda t: t != ""
            )
        )
    raise ValueError(f"unknown method {method!r}")


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document-quality features + a combined score in [0,1].

    length / mean word length / punctuation ratio / stopword ratio /
    uppercase ratio — the standard cheap pre-filters of web-scale
    corpora pipelines.
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    mean_tok_len = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(F.lit(0.0))
    stop_arr = F.array(*[F.lit(s) for s in _EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0,
        (n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))).cast("double") / n_chars,
    ).otherwise(F.lit(0.0))
    upper_ratio = F.when(
        n_chars > 0,
        (n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))).cast("double") / n_chars,
    ).otherwise(F.lit(0.0))

    score = (
        F.when(n_tokens >= 10, F.lit(0.25)).otherwise(n_tokens.cast("double") / 40.0)
        + F.when((mean_tok_len >= 3) & (mean_tok_len <= 12), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.least(stop_ratio * 2.5, F.lit(0.25))
        + F.when(punct_ratio <= 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("mean_token_len", mean_tok_len)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("upper_ratio", upper_ratio)
        .withColumn("quality", score)
    )


def detect_language(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic: the language whose stopword set
    hits the most tokens wins; NULL when nothing matches."""
    toks = tokens(F.col(text_col))
    hit_cols = []
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        hit_cols.append(F.size(F.filter(toks, lambda x: F.array_contains(arr, x))).alias(f"__hits_{lang}"))
    out = df.select("*", *hit_cols)
    best = None
    langs = list(_LANG_MARKERS)
    score = F.greatest(*[F.col(f"__hits_{lang}") for lang in langs])
    for lang in langs:
        cond = (F.col(f"__hits_{lang}") == score) & (score > 0)
        best = F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
    out = out.withColumn("lang_pred", best.otherwise(F.lit(None)))
    return out.drop(*[f"__hits_{lang}" for lang in langs])


def document_fingerprint(df: DataFrame, text_col: str = "text", normalize: bool = True) -> DataFrame:
    """Deterministic content fingerprint: md5 over the whitespace- and
    case-normalized text. The normalization makes trivially-reformatted
    duplicates collide — the first stage of every dedup pipeline."""
    t = F.col(text_col)
    if normalize:
        t = F.regexp_replace(F.trim(F.lower(t)), r"\s+", " ")
    return df.withColumn("fingerprint", F.md5(t))


_PII_PATTERNS: dict[str, tuple[str, str]] = {
    # name -> (regex, replacement token). Order matters: emails before
    # phone-ish digit runs so the user part is not half-eaten, and IBANs
    # before phones so grouped digit runs are not misread as numbers.
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "iban": (r"\b[A-Z]{2}\d{2}(?: ?[A-Z0-9]{4}){3,7}\b", "<IBAN>"),
    "phone": (r"(?<![\d.])(?:\+?\d{1,3}[ .-]?)?(?:\(\d{2,4}\)[ .-]?)?\d{3,4}[ .-]\d{3,4}(?:[ .-]\d{2,4})?(?![\d.])", "<PHONE>"),
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] = ("email", "ipv4", "ssn", "iban", "phone"),
    out_col: str | None = None,
    count_col: str = "n_redactions",
) -> DataFrame:
    """Mask common PII shapes with typed placeholder tokens — the
    standard pretraining-corpus scrubbing pass, as chained
    ``regexp_replace`` expressions (whole-stage codegen, no UDF).

    Heuristic by design (regex PII detection always is): emails, IPv4,
    US-SSN-shaped ids, international-ish phone numbers, IBANs.
    ``count_col`` records how many spans were masked per document so
    downstream filters can drop PII-dense documents entirely.
    """
    unknown = set(kinds) - set(_PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown PII kinds {sorted(unknown)}; available: {sorted(_PII_PATTERNS)}")
    out = F.col(text_col)
    for k in kinds:
        pat, repl = _PII_PATTERNS[k]
        out = F.regexp_replace(out, pat, repl)
    n = sum(
        (F.size(F.split(out, _PII_PATTERNS[k][1].replace("<", "\\<"), -1)) - 1) for k in kinds
    )
    return df.withColumn(out_col or text_col, out).withColumn(count_col, n.cast("int"))


def _word_ngrams(toks: Column, n: int) -> Column:
    """Word n-grams WITH multiplicity (unlike dedup.shingles, which
    dedups) — built from n-1 shifted copies zipped with concat, so it
    stays O(tokens) per document. concat yields NULL past the end;
    trailing partials drop in the filter."""
    out = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0)))
        out = F.zip_with(out, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(out, lambda x: x.isNotNull())


def _dup_char_frac(arr: Column, total_chars: Column) -> Column:
    """Fraction of ``total_chars`` covered by elements of ``arr`` that
    occur more than once. One sorted-array scan per row via
    ``aggregate`` (run-length over equal neighbours) — no explode, no
    shuffle, no UDF."""
    s = F.array_sort(arr)
    state = F.struct(
        F.lit("").alias("prev"), F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("dup"),
    )
    closed = lambda acc: F.when(  # noqa: E731  chars of the run being closed
        acc["run"] > 1, acc["run"] * F.length(acc["prev"])
    ).otherwise(F.lit(0).cast("long"))
    agg = F.aggregate(
        s,
        state,
        lambda acc, x: F.when(
            x == acc["prev"],
            F.struct(acc["prev"].alias("prev"), (acc["run"] + 1).alias("run"), acc["dup"].alias("dup")),
        ).otherwise(
            F.struct(x.alias("prev"), F.lit(1).cast("long").alias("run"), (acc["dup"] + closed(acc)).alias("dup"))
        ),
        lambda acc: acc["dup"] + closed(acc),
    )
    return F.when(total_chars > 0, agg.cast("double") / total_chars).otherwise(F.lit(0.0))


def _top_run_char_frac(arr: Column, total_chars: Column) -> Column:
    """Fraction of ``total_chars`` covered by the MOST FREQUENT element
    of ``arr`` (count × its length). Same sorted-scan shape as
    :func:`_dup_char_frac`."""
    s = F.array_sort(arr)
    state = F.struct(
        F.lit("").alias("prev"), F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best_run"), F.lit(0).cast("long").alias("best_chars"),
    )

    def merge(acc, x):
        extend = F.struct(
            acc["prev"].alias("prev"), (acc["run"] + 1).alias("run"),
            acc["best_run"].alias("best_run"), acc["best_chars"].alias("best_chars"),
        )
        better = acc["run"] > acc["best_run"]
        reset = F.struct(
            x.alias("prev"), F.lit(1).cast("long").alias("run"),
            F.when(better, acc["run"]).otherwise(acc["best_run"]).alias("best_run"),
            F.when(better, acc["run"] * F.length(acc["prev"])).otherwise(acc["best_chars"]).alias("best_chars"),
        )
        return F.when(x == acc["prev"], extend).otherwise(reset)

    agg = F.aggregate(
        s,
        state,
        merge,
        lambda acc: F.when(
            acc["run"] > acc["best_run"], acc["run"] * F.length(acc["prev"])
        ).otherwise(acc["best_chars"]),
    )
    return F.when(total_chars > 0, agg.cast("double") / total_chars).otherwise(F.lit(0.0))


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    top_ngram_ns: tuple[int, ...] = (2, 3, 4),
    dup_ngram_ns: tuple[int, ...] = (5, 10),
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, table A1):

    - ``dup_line_frac`` / ``dup_para_frac`` — fraction of lines /
      paragraphs occurring more than once;
    - ``dup_line_char_frac`` / ``dup_para_char_frac`` — fraction of
      characters inside those duplicated lines / paragraphs;
    - ``top_{n}gram_char_frac`` — characters covered by the single most
      frequent word n-gram (n = 2..4 in the paper);
    - ``dup_{n}gram_char_frac`` — characters covered by word n-grams
      occurring more than once (n = 5..10 in the paper).

    Every signal is one sorted-array scan inside a row — pure
    expressions, no explode/shuffle/UDF — so the pass is a single
    projection over the corpus scan at any scale. Denominator is the
    (trimmed) document character count.
    """
    t = F.col(text_col)
    total_chars = F.length(t)
    lines = F.filter(
        F.transform(F.split(t, r"\n"), F.trim), lambda x: x != ""
    )
    paras = F.filter(
        F.transform(F.split(t, r"\n{2,}"), F.trim), lambda x: x != ""
    )
    toks = tokens(t)

    def dup_elem_frac(arr: Column) -> Column:
        n = F.size(arr)
        return F.when(
            n > 0, (n - F.size(F.array_distinct(arr))).cast("double") / n
        ).otherwise(F.lit(0.0))

    out = (
        df.withColumn("dup_line_frac", dup_elem_frac(lines))
        .withColumn("dup_line_char_frac", _dup_char_frac(lines, total_chars))
        .withColumn("dup_para_frac", dup_elem_frac(paras))
        .withColumn("dup_para_char_frac", _dup_char_frac(paras, total_chars))
    )
    for n in top_ngram_ns:
        out = out.withColumn(
            f"top_{n}gram_char_frac", _top_run_char_frac(_word_ngrams(toks, n), total_chars)
        )
    for n in dup_ngram_ns:
        out = out.withColumn(
            f"dup_{n}gram_char_frac", _dup_char_frac(_word_ngrams(toks, n), total_chars)
        )
    return out


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    lowercase: bool = False,
) -> DataFrame:
    """Canonicalize text for dedup/fingerprinting: strip control
    characters, squeeze all whitespace runs to single spaces, trim, and
    optionally lowercase. Pure expressions."""
    t = F.col(text_col)
    t = F.regexp_replace(t, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    if lowercase:
        t = F.lower(t)
    return df.withColumn(out_col or text_col, t)


def c4_filters(
    df: DataFrame,
    text_col: str = "text",
    min_line_words: int = 3,
    min_sentences: int = 3,
    drop: bool = False,
) -> DataFrame:
    """C4-style cleaning (Raffel et al. 2020, "Colossal Clean Crawled
    Corpus" heuristics) as pure array expressions — no Python in the
    data path:

    line level (rebuilt into ``clean_text``): keep only lines that end
    in terminal punctuation (. ! ? ") and have >= ``min_line_words``
    words; document level (flag columns): ``has_lorem`` (placeholder
    text), ``has_brace`` ('{' — code, not prose), ``n_sentences`` of
    the cleaned text and ``c4_keep`` = no flags and >=
    ``min_sentences`` sentences. ``drop=True`` filters to the keep set
    and swaps ``clean_text`` in for ``text_col``.
    """
    t = F.col(text_col)
    lines = F.split(t, r"\n")
    kept = F.filter(
        lines,
        lambda ln: F.trim(ln).rlike(r'[.!?"]$')
        & (F.size(F.filter(F.split(F.trim(ln), r"\s+"), lambda w: w != "")) >= min_line_words),
    )
    clean = F.array_join(F.transform(kept, F.trim), "\n")
    lower = F.lower(t)
    has_lorem = lower.contains("lorem ipsum")
    has_brace = t.contains("{")
    n_sent = F.size(F.filter(F.split(clean, r"[.!?]"), lambda s: F.length(F.trim(s)) > 0))
    out = (
        df.withColumn("clean_text", clean)
        .withColumn("has_lorem", has_lorem)
        .withColumn("has_brace", has_brace)
        .withColumn("n_sentences", n_sent)
        .withColumn(
            "c4_keep",
            ~has_lorem & ~has_brace & (n_sent >= min_sentences) & (F.length(clean) > 0),
        )
    )
    if drop:
        out = (
            out.filter(F.col("c4_keep"))
            .withColumn(text_col, F.col("clean_text"))
            .drop("clean_text", "has_lorem", "has_brace", "c4_keep", "n_sentences")
        )
    return out


def compression_ratio(df: DataFrame, text_col: str = "text", out_col: str = "compression_ratio") -> DataFrame:
    """Per-document zlib compression ratio (compressed/raw bytes) — the
    classic machine-repetitiveness signal (highly compressible text is
    boilerplate/template/spam; natural prose lands ~0.3-0.6). Used as a
    filter axis alongside :func:`repetition_signals` (which measures
    specific Gopher A1 fractions; this is the holistic one-number
    variant).

    One Arrow-batched UDF (zlib is C-speed); empty docs get NULL.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(texts: pd.Series) -> pd.Series:
        import zlib

        def one(t):
            if not t:
                return None
            raw = t.encode("utf-8", errors="replace")
            return len(zlib.compress(raw, 6)) / len(raw)

        return texts.map(one)

    return df.withColumn(out_col, _ratio(F.col(text_col)))


def gopher_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
    drop: bool = False,
) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, arXiv:2112.11446
    Appendix A1.1) as pure column expressions — the repetition half of
    that appendix is :func:`repetition_signals`; this is the
    quality-heuristic half, the standard companion to
    :func:`c4_filters` in web-scale pipelines:

    * word count in [``min_words``, ``max_words``] (whitespace words);
    * mean word length in [``min_mean_word_len``, ``max_mean_word_len``];
    * symbol-to-word ratio (``#`` or ``...``/``…`` occurrences per
      word) <= ``max_symbol_word_ratio``;
    * < ``max_bullet_line_frac`` of lines start with a bullet
      (``-``, ``*``, ``•``, ``‣``, ``·``);
    * < ``max_ellipsis_line_frac`` of lines end with ``...`` / ``…``;
    * >= ``min_alpha_word_frac`` of words contain an alphabetic char;
    * >= ``min_stop_hits`` distinct hits from the paper's stop set
      (the, be, to, of, and, that, have, with).

    Emits one flag column per rule plus ``gopher_keep``; ``drop=True``
    filters to the keep set. Scale shape: zero shuffle, zero Python —
    every rule is an array fold over the existing row, so the filter
    runs at scan speed and composes with any downstream dedup."""
    t = F.col(text_col)
    words = F.filter(F.split(t, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    total_chars = F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w))
    mean_wl = F.when(n_words > 0, total_chars / n_words)
    n_hash = F.size(F.split(t, r"#", -1)) - 1
    n_ellipsis = F.size(F.split(t, r"\.\.\.", -1)) - 1 + F.size(F.split(t, r"…", -1)) - 1
    sym_ratio = F.when(n_words > 0, (n_hash + n_ellipsis) / n_words)
    lines = F.filter(F.transform(F.split(t, r"\n"), F.trim), lambda ln: ln != "")
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda ln: ln.rlike(r"^[-*•‣·]"))) / n_lines,
    )
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda ln: ln.rlike(r"(\.\.\.|…)$"))) / n_lines,
    )
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(words, lambda w: w.rlike(r"[A-Za-z]"))) / n_words,
    )
    low_words = F.transform(words, lambda w: F.lower(w))
    stops = ("the", "be", "to", "of", "and", "that", "have", "with")
    stop_hits = sum(
        [F.array_contains(low_words, s).cast("int") for s in stops[1:]],
        F.array_contains(low_words, stops[0]).cast("int"),
    )
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len)
        & (sym_ratio <= max_symbol_word_ratio)
        & (F.coalesce(bullet_frac, F.lit(0.0)) < max_bullet_line_frac)
        & (F.coalesce(ellipsis_frac, F.lit(0.0)) < max_ellipsis_line_frac)
        & (alpha_frac >= min_alpha_word_frac)
        & (stop_hits >= min_stop_hits)
    )
    out = (
        df.withColumn("n_words", n_words)
        .withColumn("mean_word_len", mean_wl)
        .withColumn("symbol_word_ratio", sym_ratio)
        .withColumn("bullet_line_frac", bullet_frac)
        .withColumn("ellipsis_line_frac", ellipsis_frac)
        .withColumn("alpha_word_frac", alpha_frac)
        .withColumn("stop_hits", stop_hits)
        .withColumn("gopher_keep", F.coalesce(keep, F.lit(False)))
    )
    if drop:
        out = out.filter(F.col("gopher_keep")).drop(
            "n_words", "mean_word_len", "symbol_word_ratio", "bullet_line_frac",
            "ellipsis_line_frac", "alpha_word_frac", "stop_hits", "gopher_keep",
        )
    return out
