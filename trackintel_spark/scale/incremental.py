"""Incremental deduplication against a persisted corpus index.

At 100 TB the corpus is not re-deduplicated from scratch when a daily
shard arrives — the pipeline keeps a COMPACT index of what it has
already accepted and checks only the new shard against it:

* **exact**: one 32-hex-char md5 digest per distinct accepted text
  (~40 bytes/doc — a 100 TB corpus of 100 B docs indexes in ~4 TB,
  and usually far less after dedup). A shard joins the index on
  ``digest``; history is never rescanned.
* **near-dup**: the MinHash-LSH banding of the batch path
  (:func:`trackintel_spark.scale.dedup.minhash_lsh_candidates`) frozen
  into an index of ``(band, bhash, doc_id, minhash)`` rows. A shard
  computes its own signatures, joins the index on the band keys, and
  verifies candidates by estimated Jaccard — the exact batch verify
  rule, so shard-vs-history decisions match what one global batch run
  would have decided (pinned in tests/test_scale_incremental.py).

Store the index with
:func:`trackintel_spark.plans.partitioning.write_bucketed` on the join
key (``digest`` / ``("band", "bhash")``): the nightly join then plans
with NO exchange on the index side — only the (small) shard shuffles,
never the history (plan-pinned in tests/test_plan_quality.py).

The reference engine has no incremental path (its dedup-adjacent
surface is batch-only); this module is part of the LLM-training-data
extension surface, like :mod:`trackintel_spark.scale.decontaminate`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trackintel_spark.scale.dedup import minhash_signature

__all__ = [
    "build_exact_index",
    "merge_exact_index",
    "dedup_against_index",
    "build_neardup_index",
    "merge_neardup_index",
    "neardup_against_index",
]


def _digest(text_col: str) -> Column:
    # md5 of the raw text: identical hex in Spark and DuckDB, so the
    # oracle can rebuild the index in SQL. Collision risk at 128 bits
    # is negligible at any corpus size.
    return F.md5(F.col(text_col))


def build_exact_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One ``(digest, first_id)`` row per distinct accepted text.

    ``first_id`` is the smallest accepted id carrying the digest — the
    canonical survivor, so downstream joins can report WHAT a rejected
    shard document duplicated, not just that it did. Map-side partial
    min keeps the aggregation one shuffle of digests, never text.
    """
    return (
        df.select(_digest(text_col).alias("digest"), F.col(id_col).alias("first_id"))
        .groupBy("digest")
        .agg(F.min("first_id").alias("first_id"))
    )


def merge_exact_index(index: DataFrame, additions: DataFrame) -> DataFrame:
    """Fold a shard's accepted digests into the index. Idempotent:
    merging the same additions twice is a no-op, and
    ``merge(build(A), build(B)) == build(A ∪ B)`` (pinned in tests)."""
    return index.unionByName(additions).groupBy("digest").agg(
        F.min("first_id").alias("first_id")
    )


def dedup_against_index(
    shard: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-dedup a new shard against the accepted-corpus index AND
    within itself, in one pass.

    Returns the shard's columns plus:

    * ``dup_of`` — the accepted id this text duplicates (from history,
      or the earliest shard occurrence for within-shard dups); NULL
      when the text is genuinely new;
    * ``is_new`` — ``dup_of IS NULL``; ``filter("is_new")`` is the
      keep-list, and ``build_exact_index(kept)`` (or its digests) is
      what :func:`merge_exact_index` folds back in.

    Within-shard first-occurrence uses the same min-id rule as
    :func:`trackintel_spark.scale.dedup.dedup_exact`, and history wins
    over any shard row — so accept/reject decisions equal one global
    batch dedup over history ∪ shard (pinned in tests).

    100 TB: the join key is the 16-byte digest — text never shuffles.
    With the index stored bucketed on ``digest`` only the shard side
    exchanges; AQE broadcast kicks in when a day's digests fit in
    memory.

    Works on a STREAMING shard too (ingest-time gating): the check
    becomes the stream-static join against the index only — the
    within-shard census is a streaming aggregation (not append-safe),
    and within-STREAM duplicates are
    :func:`trackintel_spark.streaming.dedup_stream`'s stateful job.
    """
    digested = shard.withColumn("__digest", _digest(text_col))
    hist = index.select(
        F.col("digest").alias("__digest"), F.col("first_id").alias("__hist_id")
    )
    if shard.isStreaming:
        out = (
            digested.join(hist, on="__digest", how="left")
            .withColumn("dup_of", F.col("__hist_id"))
            .withColumn("is_new", F.col("dup_of").isNull())
        )
        return out.drop("__digest", "__hist_id")
    # earliest occurrence within the shard (min-id rule of dedup_exact)
    shard_first = digested.groupBy("__digest").agg(
        F.min(id_col).alias("__shard_first")
    )
    out = (
        digested.join(shard_first, on="__digest")
        .join(hist, on="__digest", how="left")
        .withColumn(
            "dup_of",
            F.coalesce(
                "__hist_id",
                F.when(F.col(id_col) != F.col("__shard_first"), F.col("__shard_first")),
            ),
        )
        .withColumn("is_new", F.col("dup_of").isNull())
    )
    return out.drop("__digest", "__shard_first", "__hist_id")


# ---------------------------------------------------------------------------
# near-duplicate index (MinHash-LSH)
# ---------------------------------------------------------------------------


def _banded_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int,
    bands: int,
    shingle_n: int,
) -> DataFrame:
    """(id, minhash, band, bhash) rows — the banding of
    ``minhash_lsh_candidates`` (scale/dedup.py:178) factored out so the
    index build and the shard probe use byte-identical keys."""
    if not 0 < bands <= num_perm:
        raise ValueError(f"bands must be in (0, num_perm={num_perm}], got {bands}")
    if num_perm % bands != 0:
        raise ValueError(f"num_perm ({num_perm}) must be divisible by bands ({bands})")
    rows = num_perm // bands
    sig = (
        minhash_signature(df, text_col, num_perm, shingle_n, id_col=id_col)
        .select(F.col(id_col).alias("__id"), "minhash")
        .filter(F.col("minhash").isNotNull())
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.element_at("minhash", b * rows + r + 1) for r in range(rows)]
                    )
                ).alias("bhash"),
            )
            for b in range(bands)
        ]
    )
    return sig.select("__id", "minhash", F.explode(band_structs).alias("__b")).select(
        "__id", "minhash", F.col("__b.band").alias("band"), F.col("__b.bhash").alias("bhash")
    )


def build_neardup_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """The accepted corpus's LSH banding as an index: one
    ``(band, bhash, doc_id, minhash)`` row per (document, band).

    num_perm longs + band keys per doc (~300 B at the defaults) —
    compact enough to keep for the whole corpus, rich enough that the
    probe can run the batch verify rule without touching history text.
    """
    return _banded_signatures(df, text_col, id_col, num_perm, bands, shingle_n).select(
        "band", "bhash", F.col("__id").alias("doc_id"), "minhash"
    )


def merge_neardup_index(index: DataFrame, additions: DataFrame) -> DataFrame:
    """Fold a shard's accepted banded signatures into the index
    (idempotent — re-merging drops duplicates on the natural key)."""
    return index.unionByName(additions).dropDuplicates(["band", "bhash", "doc_id"])


def neardup_against_index(
    shard: DataFrame,
    index: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Flag shard documents near-duplicating the accepted corpus.

    Shard signatures are banded with the index's own keying; (band,
    bhash) collisions become candidates; candidates are verified by
    estimated Jaccard (fraction of matching signature positions — the
    ``minhash_lsh_candidates`` rule) against ``threshold``. Returns
    one row per shard document: shard columns + ``dup_of`` (the
    best-matching accepted id — highest estimate, ties to the smallest
    id — NULL if none) + ``jaccard_est`` + ``is_new``.

    ``num_perm``/``bands``/``shingle_n`` must match the index build —
    band keys are positional. Within-shard near-dups are NOT decided
    here (run the batch ``minhash_lsh_candidates`` on the kept shard,
    or chain shards through :func:`merge_neardup_index`): one shard is
    a day, history is the 100 TB problem.
    """
    probe = _banded_signatures(shard, text_col, id_col, num_perm, bands, shingle_n)
    idx = index.select(
        "band", "bhash", F.col("doc_id").alias("__hist_id"), F.col("minhash").alias("__hist_sig")
    )
    eq = F.aggregate(
        F.zip_with("minhash", "__hist_sig", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    matches = (
        probe.join(idx, on=["band", "bhash"])
        # near-identical pairs collide in EVERY band — verify each
        # (shard, hist) pair once, like the batch candidate path
        .dropDuplicates(["__id", "__hist_id"])
        .withColumn("__est", eq.cast("double") / F.size("minhash"))
        .filter(F.col("__est") >= F.lit(float(threshold)))
        .groupBy("__id")
        .agg(
            F.max_by(
                F.struct(F.col("__hist_id").alias("dup_of"), F.col("__est").alias("jaccard_est")),
                # best estimate first, then smallest accepted id
                F.struct(F.col("__est"), -F.col("__hist_id")),
            ).alias("__best")
        )
        .select(
            F.col("__id"),
            F.col("__best.dup_of").alias("dup_of"),
            F.col("__best.jaccard_est").alias("jaccard_est"),
        )
    )
    return (
        shard.join(matches, on=F.col(id_col) == F.col("__id"), how="left")
        .drop("__id")
        .withColumn("is_new", F.col("dup_of").isNull())
    )
