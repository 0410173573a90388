"""Corpus profiling for training-data pipelines — one-pass statistics
built on Spark's mergeable sketches.

At 100 TB you never profile with exact global passes per question; you
compute, per partition/shard, SKETCHES that merge associatively —
HyperLogLog for distinct counts (Apache DataSketches via
``hll_sketch_agg``), ``percentile_approx`` (KLL-style) for quantiles —
and union them. Everything here is a single ``groupBy`` aggregation
with map-side partials; nothing collects more than the group
cardinality.

* :func:`corpus_profile` — per-group (or whole-corpus) document/token/
  char stats with approximate quantiles and an approximate vocabulary
  size, in ONE scan of the documents table plus one exploded-token
  aggregation.
* :func:`vocab_sketch` / :func:`union_vocab_sketches` — the shard
  story: sketch each corpus (or date partition, or source) separately,
  persist the sketch bytes, union later to answer "how many distinct
  tokens across all shards" without rescanning anything.
* :func:`top_tokens` — exact heavy hitters: hash aggregation with
  map-side combine bounded by vocabulary size, then per-partition
  top-k heaps (TakeOrdered) — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trackintel_spark.scale.text import tokens

_QUANTILES = [0.1, 0.5, 0.9, 0.99]


def corpus_profile(
    docs: DataFrame,
    text_col: str = "text",
    group_by: str | list[str] | None = None,
    quantiles: list[float] = _QUANTILES,
    hll_lg_k: int = 12,
) -> DataFrame:
    """Per-group corpus statistics in one documents scan + one token
    aggregation: ``n_docs``, ``total_tokens``, ``total_chars``,
    ``tokens_per_doc_q``/``chars_per_doc_q`` (approximate quantiles at
    ``quantiles``), ``avg_token_len``, and ``vocab_size_approx`` (HLL,
    ±~1.6% at the default lg_k=12, 4 KB of state per group).

    ``group_by`` = None profiles the whole corpus as one row; a column
    (or list) profiles per source/language/shard — the group count is
    the ONLY cardinality that ever reaches the driver's result.
    """
    gb = [group_by] if isinstance(group_by, str) else list(group_by or [])
    t = F.col(text_col)
    per_doc = docs.select(
        *gb,
        F.length(t).alias("__chars"),
        F.size(tokens(t)).alias("__toks"),
    )
    doc_stats = per_doc.groupBy(*gb).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__toks").alias("total_tokens"),
        F.sum("__chars").alias("total_chars"),
        F.percentile_approx("__toks", quantiles).alias("tokens_per_doc_q"),
        F.percentile_approx("__chars", quantiles).alias("chars_per_doc_q"),
    )
    tok = docs.select(*gb, F.explode(tokens(t)).alias("__tok"))
    tok_stats = tok.groupBy(*gb).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("__tok", F.lit(hll_lg_k))).alias(
            "vocab_size_approx"
        ),
        F.avg(F.length("__tok")).alias("avg_token_len"),
    )
    if gb:
        return doc_stats.join(tok_stats, on=gb, how="left")
    return doc_stats.crossJoin(tok_stats)


def vocab_sketch(
    docs: DataFrame,
    text_col: str = "text",
    group_by: str | list[str] | None = None,
    hll_lg_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketch of the distinct-token set, as bytes.

    The sketch column is mergeable: persist it per shard / ingest day,
    then :func:`union_vocab_sketches` answers cross-shard distinct
    questions without touching the text again — the only profiling
    shape that survives a corpus you cannot rescan.
    """
    gb = [group_by] if isinstance(group_by, str) else list(group_by or [])
    tok = docs.select(*gb, F.explode(tokens(F.col(text_col))).alias("__tok"))
    return tok.groupBy(*gb).agg(
        F.hll_sketch_agg("__tok", F.lit(hll_lg_k)).alias("vocab_sketch")
    )


def union_vocab_sketches(sketches: DataFrame, sketch_col: str = "vocab_sketch") -> DataFrame:
    """Union previously-built sketches → one row with
    ``vocab_size_approx`` for the combined corpus."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias("vocab_size_approx")
    )


def top_tokens(
    docs: DataFrame,
    k: int = 100,
    text_col: str = "text",
    min_len: int = 1,
) -> DataFrame:
    """Exact top-``k`` tokens by occurrence count: (token, count),
    count-descending. One hash aggregation (map-side combine collapses
    each partition to its local vocabulary) + TakeOrdered heaps."""
    tok = docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
    if min_len > 1:
        tok = tok.filter(F.length("token") >= min_len)
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("count").desc(), F.col("token").asc())
        .limit(k)
    )


def _host_expr(url_col: str):
    """Normalized host: parse_url HOST (or first path segment for
    scheme-less values), lowercased, leading ``www.`` stripped — the
    same site must fold to ONE host whichever syntax the crawler
    recorded."""
    raw = F.coalesce(
        F.parse_url(F.col(url_col), F.lit("HOST")),
        F.regexp_extract(F.col(url_col), r"^([^/\s:]+)", 1),
    )
    return F.regexp_replace(F.lower(raw), r"^www\.", "")


def host_stats(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    quality_col: str | None = None,
) -> DataFrame:
    """Per-host corpus statistics — the domain-level curation view
    (RefinedWeb-style pipelines block/keep whole hosts before touching
    documents): (host, n_docs, total_chars[, avg_quality]).

    Host extraction is ``parse_url(.., 'HOST')`` (JVM expression);
    scheme-less values fall back to the first path segment. One hash
    aggregation; host cardinality bounds the result.
    """
    host = _host_expr(url_col)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(text_col)).alias("total_chars"),
    ]
    if quality_col:
        aggs.append(F.avg(quality_col).alias("avg_quality"))
    return docs.withColumn("host", host).groupBy("host").agg(*aggs)


def filter_hosts(
    docs: DataFrame,
    blocklist: list[str],
    url_col: str = "url",
    keep: bool = False,
) -> DataFrame:
    """Drop (or with ``keep=True`` retain only) documents whose URL
    host is in ``blocklist`` — exact, case-insensitive host match. The
    list rides the plan as a literal ``isin`` (blocklists are bounded);
    pass a DataFrame-join for multi-million-entry lists instead.
    """
    host = _host_expr(url_col)
    members = host.isin(*[h.lower() for h in blocklist]) if blocklist else F.lit(False)
    return docs.filter(members if keep else ~F.coalesce(members, F.lit(False)))
