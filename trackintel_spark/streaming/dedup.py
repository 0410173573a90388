"""Streaming exact deduplication for document ingest.

The online counterpart of :func:`trackintel_spark.scale.dedup_exact`:
fingerprint each arriving document (md5 of whitespace/case-normalized
text, same normalization as the batch path) and keep the first
occurrence per fingerprint. State is bounded by the event-time
watermark via ``dropDuplicatesWithinWatermark`` — two copies arriving
within the watermark window dedup exactly; copies farther apart than
the delay threshold may both pass (the documented trade-off of any
bounded-state streaming dedup; run the batch pass for full-corpus
guarantees).

100 TB design: state is one (fingerprint → timestamp) entry per
distinct in-window document, hash-partitioned across executors by
Structured Streaming's state store; no shuffle beyond the state
exchange, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    normalize: bool = True,
    exact_text: bool = False,
) -> DataFrame:
    """Deduplicate a streaming DataFrame of documents.

    ``docs`` must be a streaming DataFrame with an event-time column
    ``ts_col``. Returns the stream with duplicate documents (same
    fingerprint within the watermark) dropped and a ``fingerprint``
    column added. ``exact_text=True`` keys on the raw text instead of
    the md5 fingerprint (no collisions, more state per entry).
    """
    t = F.col(text_col)
    if normalize:
        t = F.regexp_replace(F.trim(F.lower(t)), r"\s+", " ")
    key = t if exact_text else F.md5(t)
    out = docs.withColumn("fingerprint", F.md5(t)).withColumn("__key", key)
    if not out.isStreaming:
        # batch fallback: first occurrence by event time wins (deterministic,
        # unlike dropDuplicates' arbitrary pick under parallelism)
        from pyspark.sql import Window

        w = Window.partitionBy("__key").orderBy(F.col(ts_col).asc())
        return (
            out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__key")
        )
    return (
        out.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__key"])
        .drop("__key")
    )


def url_dedup_stream(
    docs: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    strip_www: bool = True,
) -> DataFrame:
    """Online canonical-URL deduplication — crawl-frontier stage 0.

    The streaming counterpart of :func:`trackintel_spark.scale.dedup_url`:
    each arriving fetch gets its ``canonical_url``
    (:func:`trackintel_spark.scale.canonicalize_url` — the SAME codegen
    expression the batch pass runs, so a page kept online is the page
    the batch census would keep) and the first fetch per canonical URL
    within the watermark passes. Same bounded-state contract as
    :func:`dedup_stream`: re-fetches farther apart than the watermark
    may both pass; run the batch ``dedup_url`` census for full-corpus
    guarantees.

    100 TB design: state is one (canonical_url -> timestamp) entry per
    distinct in-window URL — short near-uniform strings, hash-partitioned
    by the state store; the canonicalization itself is a map-side
    projection, no Python, no extra shuffle.
    """
    from trackintel_spark.scale.web import canonicalize_url

    out = docs.withColumn("canonical_url", canonicalize_url(url_col, strip_www=strip_www))
    if not out.isStreaming:
        from pyspark.sql import Window

        w = Window.partitionBy("canonical_url").orderBy(F.col(ts_col).asc())
        return (
            out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    return out.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["canonical_url"]
    )
