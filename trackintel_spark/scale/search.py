"""Keyword search over the documents table — Okapi BM25 (Robertson &
Zaragoza 2009), the lexical-retrieval side of data curation (find
target-domain seeds for DSIR, audit what a filter kept, build eval
pools).

Scale shape: there is no materialized inverted index to maintain — the
"index" is the corpus scan with a map-side prune. The query's token
set is a literal array, so ``arrays_overlap`` eliminates non-matching
documents BEFORE any shuffle (at 100 TB this is the difference between
scanning and shuffling); term frequencies then aggregate per (doc,
term), the per-term document frequencies are a <= |query|-row side
(broadcast), and the final top-k is per-partition heaps (TakeOrdered).
Corpus statistics (N, avgdl) come from one aggregation and ride a
1-row broadcast — pass ``stats`` to amortize them across many queries
against the same corpus.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trackintel_spark.scale.text import tokens


def corpus_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """1-row frame (n_docs, avgdl) for :func:`bm25_search`'s ``stats``
    — compute once per corpus, reuse across queries."""
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(tokens(F.col(text_col)))).alias("avgdl"),
    )


def _query_tokens(query: str) -> list[str]:
    # mirror scale.text.tokens: lowercase, split on whitespace runs
    return [t for t in re.split(r"\s+", query.lower()) if t]


def bm25_search(
    docs: DataFrame,
    query: str,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents for ``query`` by BM25: returns
    (id_col, score, rank), score-descending, ties to the smaller id.

    IDF is the Robertson–Sparck Jones form
    ``ln(1 + (N - df + 0.5) / (df + 0.5))`` (always positive); term
    frequency saturates with ``k1`` and length-normalizes with ``b``
    against the corpus mean document length.
    """
    q_toks = _query_tokens(query)
    if not q_toks:
        raise ValueError("empty query")
    q_lit = F.array(*[F.lit(t) for t in sorted(set(q_toks))])

    base = docs.select(
        F.col(id_col).alias("__did"), tokens(F.col(text_col)).alias("__toks")
    ).withColumn("__dl", F.size("__toks"))
    # map-side prune: only documents sharing >= 1 query token survive
    # the scan — no shuffle for the rest of the corpus
    hits = base.filter(F.arrays_overlap("__toks", q_lit))
    tf = (
        hits.select(
            "__did", "__dl", F.explode("__toks").alias("__term")
        )
        .filter(F.array_contains(q_lit, F.col("__term")))
        .groupBy("__did", "__dl", "__term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    df_ = tf.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))
    st = stats if stats is not None else corpus_stats(docs, text_col)
    scored = (
        tf.join(F.broadcast(df_), on="__term")
        .crossJoin(F.broadcast(st))
        .withColumn(
            "__idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
            ),
        )
        .withColumn(
            "__s",
            F.col("__idf")
            * (F.col("__tf") * (k1 + 1))
            / (
                F.col("__tf")
                + k1 * (1 - b + b * F.col("__dl") / F.col("avgdl"))
            ),
        )
        .groupBy("__did")
        .agg(F.sum("__s").alias("score"))
    )
    # rank (and the top-k cutoff) on the ROUNDED score: two
    # mathematically-tied documents sum their per-term scores in a
    # nondeterministic order inside Spark, so raw-float ordering lets
    # sub-ulp noise (~1e-15) defeat the id tie-break and swap ranks
    # run-to-run (the round-8 driver flake, commit fc103f7). Rounding
    # at 1e-9 — six orders above the noise floor — makes true ties
    # explicit and the (score, id) order total; the returned `score`
    # stays unrounded.
    r9 = F.round(F.col("score"), 9)
    top = (
        scored.orderBy(r9.desc(), F.col("__did").asc())
        .limit(k)
        .select(F.col("__did").alias(id_col), "score")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.round(F.col("score"), 9).desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w))
