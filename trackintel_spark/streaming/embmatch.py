"""ONLINE embedding similarity matching — a stream of vectors vs a
static corpus index.

The retrieval/dedup primitive of an online ingest pipeline: each
arriving embedding (a freshly-embedded document, an incoming query) is
matched against every corpus vector with cosine >= ``min_cosine``.
Same architecture as :mod:`trackintel_spark.streaming.trajmatch` —
entirely STATELESS, so it is streaming-legal in append mode with no
state store and no watermark:

1. the CORPUS is sign-LSH bucketed ahead of time
   (:func:`index_embedding_corpus`) — each vector lands in exactly ONE
   bucket; persist or write it, it is the reusable index;
2. each arriving vector probes its own bucket plus (multiprobe) the
   n_planes single-bit-flip neighbors: one stream-static equi-join on
   the bucket string meets every candidate;
3. the exact cosine refines as a Column expression; only survivors of
   ``min_cosine`` emit. A corpus vector occupies one bucket and probe
   buckets are distinct, so a (query, corpus) pair can match at most
   once — no streaming dedup needed.

Top-k semantics need per-query aggregation (state); do that downstream
in ``foreachBatch`` with :func:`trackintel_spark.scale.similarity.
cosine_topk_bruteforce` over the (tiny) match set, or run the batch
``lsh_bucketed_topk`` offline. Works identically on a batch probe
frame (the unified-API convention); stream == batch == brute force is
pinned in tests/test_streaming_embmatch.py.

Recall contract is the LSH one: a pair whose buckets differ in >= 2
sign bits is not probed (multiprobe covers 1-bit misses). For exact
guarantees run the batch ``dedup_embedding_cosine`` census.

The reference engine has no embedding surface at all; this extends the
LLM-pipeline family (scale/similarity.py, scale/incremental.py) to
online ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trackintel_spark.scale.similarity import _dot, _hyperplanes, _norm

__all__ = ["index_embedding_corpus", "embedding_match_stream"]


def _bucket_bits(v, planes) -> "F.Column":
    bits = [
        F.when(
            _dot(v, F.array(*[F.lit(float(x)) for x in p])) >= 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def index_embedding_corpus(
    corpus: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """The reusable corpus index: (bucket, vec_id, vec, norm) with one
    row — one bucket — per corpus vector. Persist it (or write it
    bucketed on ``bucket``); the plane geometry is (dim, n_planes,
    seed)-derived, so the SAME three values must be passed to
    :func:`embedding_match_stream`."""
    if dim is None:
        first = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None:
            raise ValueError("empty corpus")
        dim = first["d"]
    planes = _hyperplanes(dim, n_planes, seed)
    return (
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("vec"),
        )
        .withColumn("norm", _norm(F.col("vec")))
        .withColumn("bucket", _bucket_bits(F.col("vec"), planes))
        .filter(F.col("norm") > 0)
    )


def embedding_match_stream(
    queries: DataFrame,
    index: DataFrame,
    min_cosine: float,
    n_planes: int = 8,
    seed: int = 42,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    multiprobe: bool = True,
) -> DataFrame:
    """Match a (streaming or batch) vector frame against the corpus
    index: returns ``(query_id, vec_id, cosine)`` for every pair with
    exact cosine >= ``min_cosine`` whose buckets collide (multiprobe:
    within one sign-bit).

    Plan shape: the query side explodes to <= 1 + n_planes bucket
    probes BEFORE the join (bounded fan-out of the small side), the
    corpus never re-shuffles between micro-batches when the index is
    persisted/bucketed, and the cosine refine is whole-stage codegen.
    No state store, no watermark — append-mode legal.
    """
    if dim is None:
        first = index.select(F.size(F.col("vec")).alias("d")).first()
        if first is None:
            raise ValueError("empty index")
        dim = first["d"]
    planes = _hyperplanes(dim, n_planes, seed)
    q = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("__qv"),
        )
        .withColumn("__qn", _norm(F.col("__qv")))
        .filter(F.col("__qn") > 0)
        .withColumn("__b0", _bucket_bits(F.col("__qv"), planes))
    )
    if multiprobe:
        flips = F.array(
            F.col("__b0"),
            *[
                F.concat(
                    F.substring("__b0", 1, i),
                    F.when(F.substring("__b0", i + 1, 1) == "1", F.lit("0")).otherwise(
                        F.lit("1")
                    ),
                    F.substring("__b0", i + 2, n_planes - i - 1),
                )
                for i in range(n_planes)
            ],
        )
        q = q.withColumn("bucket", F.explode(flips))
    else:
        q = q.withColumn("bucket", F.col("__b0"))
    scored = q.join(index, on="bucket").withColumn(
        "cosine", _dot(F.col("__qv"), F.col("vec")) / (F.col("__qn") * F.col("norm"))
    )
    return scored.filter(F.col("cosine") >= F.lit(float(min_cosine))).select(
        "query_id", "vec_id", "cosine"
    )
