"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard hygiene pass of large-scale training-data pipelines
(13-gram overlap in GPT-3's appendix; 10-grams in later pipelines):
any training document containing an n-gram that also occurs in a
held-out benchmark is flagged (or stripped) before training.

100 TB design: the benchmark side is always tiny relative to the
corpus (thousands of eval documents vs billions of training docs), so
its distinct shingle set is **broadcast**; the corpus explodes its
shingles and hits the broadcast hash table map-side — the full corpus
is never shuffled. Only the (rare) matched rows shuffle into the
per-document aggregate, and the aggregate (again small) is broadcast
back onto the corpus for the final flag. Plan shape:

    corpus ──explode──▶ BHJ(bench shingles) ──groupBy(doc)──▶ matches
    corpus ◀──────────── BHJ(matches) ◀──────────────────────────┘

No sort, no corpus-sized shuffle, no UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trackintel_spark.scale.dedup import shingles


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Per corpus document: how many of its distinct word ``n``-grams
    occur anywhere in ``benchmark``.

    Returns one row per matched corpus document:
    ``(doc_id, n_shingles, matched_shingles, overlap_frac)``.
    Documents with zero matches are omitted (join them back with
    :func:`decontaminate` for the full flag column).
    """
    bench_text = bench_text_col or text_col
    bench_sh = (
        benchmark.select(F.explode(shingles(F.col(bench_text), n)).alias("shingle"))
        .distinct()
    )
    corpus_sh = corpus.select(
        F.col(id_col), shingles(F.col(text_col), n).alias("sh")
    ).withColumn("n_shingles", F.size("sh"))
    exploded = corpus_sh.select(id_col, "n_shingles", F.explode("sh").alias("shingle"))
    matched = exploded.join(F.broadcast(bench_sh), "shingle")
    return matched.groupBy(id_col, "n_shingles").agg(
        F.count("*").alias("matched_shingles")
    ).withColumn(
        "overlap_frac",
        F.col("matched_shingles").cast("double") / F.greatest("n_shingles", F.lit(1)),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    min_matches: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    keep_contaminated: bool = False,
) -> DataFrame:
    """Flag (and by default drop) corpus documents sharing ≥
    ``min_matches`` distinct word ``n``-grams with ``benchmark``.

    With ``keep_contaminated=True`` returns the full corpus with
    ``matched_shingles``/``overlap_frac``/``contaminated`` columns
    (audit mode); otherwise returns only the clean rows, original
    schema preserved.
    """
    overlap = ngram_overlap(
        corpus, benchmark, n=n, text_col=text_col, id_col=id_col,
        bench_text_col=bench_text_col,
    ).select(id_col, "matched_shingles", "overlap_frac")
    # contamination is rare by construction -> broadcast the matches
    # back onto the corpus instead of shuffling the corpus by id.
    out = corpus.join(F.broadcast(overlap), id_col, "left")
    out = out.withColumn(
        "matched_shingles", F.coalesce("matched_shingles", F.lit(0))
    ).withColumn(
        "overlap_frac", F.coalesce("overlap_frac", F.lit(0.0))
    ).withColumn("contaminated", F.col("matched_shingles") >= min_matches)
    if keep_contaminated:
        return out
    return out.filter(~F.col("contaminated")).select(*corpus.columns)


def collect_benchmark_shingles(
    benchmark: DataFrame, n: int = 13, text_col: str = "text"
) -> list[str]:
    """Distinct benchmark shingles as a driver-side list — the bounded
    artifact :func:`decontaminate_map_side` broadcasts. Same
    justification as the broadcast in :func:`ngram_overlap`: benchmark
    sets are small by definition; persist the list once and reuse it
    across batch jobs AND streams."""
    return [
        r["shingle"]
        for r in benchmark.select(
            F.explode(shingles(F.col(text_col), n)).alias("shingle")
        )
        .distinct()
        .collect()
    ]


def decontaminate_map_side(
    corpus: DataFrame,
    bench_shingles: list[str],
    n: int = 13,
    min_matches: int = 1,
    text_col: str = "text",
    keep_contaminated: bool = False,
) -> DataFrame:
    """:func:`decontaminate` with ZERO shuffle — and therefore
    streaming-composable: the batch version's explode → join →
    groupBy(doc) is a streaming aggregation (append mode rejects it),
    while this variant broadcasts the benchmark shingle SET and counts
    matches per document inside an Arrow batch. Use it as the
    ingest-time filter on a live crawl (`readStream` → this →
    `writeStream`), or in batch when the corpus-side shuffle of matched
    rows is worth avoiding.

    Flags match :func:`decontaminate` exactly (same shingle semantics,
    pinned by a parity test); ``overlap_frac`` denominators too.
    """
    spark = corpus.sparkSession
    bench_bc = spark.sparkContext.broadcast(frozenset(bench_shingles))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("matched_shingles int, n_shingles int")
    def _match(texts: pd.Series) -> pd.DataFrame:
        bset = bench_bc.value
        matched, total = [], []
        for t in texts:
            toks = [w for w in (t or "").lower().split() if w]
            sh = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
            total.append(len(sh))
            matched.append(len(sh & bset) if sh else 0)
        return pd.DataFrame({"matched_shingles": matched, "n_shingles": total})

    out = (
        corpus.withColumn("__m", _match(F.col(text_col)))
        .withColumn("matched_shingles", F.col("__m.matched_shingles"))
        .withColumn(
            "overlap_frac",
            F.col("__m.matched_shingles").cast("double")
            / F.greatest(F.col("__m.n_shingles"), F.lit(1)),
        )
        .withColumn("contaminated", F.col("matched_shingles") >= min_matches)
        .drop("__m")
    )
    if keep_contaminated:
        return out
    return out.filter(~F.col("contaminated")).select(*corpus.columns)
