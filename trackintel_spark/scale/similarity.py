"""Similarity search over embedding columns (array<float>).

* ``cosine_topk_bruteforce`` — exact: broadcast the (small) query set,
  score every row with codegen'd zip_with/aggregate expressions,
  row_number window for top-k. The baseline every ANN variant is
  validated against.
* ``lsh_bucketed_topk`` — approximate scale path: random-hyperplane
  (sign) LSH buckets both sides; only same-bucket (and optionally
  neighboring-probe) pairs are scored. Hyperplanes are derived from a
  fixed seed so plans are deterministic and reproducible across runs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: returns (query_id, vec_id, cosine, rank).

    The query side is broadcast — at 100 TB the corpus scan dominates
    and stays embarrassingly parallel; no shuffle until the final
    per-query top-k (tiny).
    """
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("__cv")
    ).withColumn("__cn", _norm(F.col("__cv")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("__qv")
    ).withColumn("__qn", _norm(F.col("__qv")))
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine", _dot(F.col("__cv"), F.col("__qv")) / (F.col("__cn") * F.col("__qn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: sign-LSH bucket equi-join, then exact cosine.

    ``multiprobe`` also probes the n_planes single-bit-flip neighbor
    buckets of each query (classic multi-probe LSH), trading compute for
    recall without growing the corpus index.
    """
    if dim is None:
        first = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None:
            raise ValueError("empty corpus")
        dim = first["d"]
    planes = _hyperplanes(dim, n_planes, seed)

    def bucket_bits(v):
        bits = [
            F.when(_dot(v, F.array(*[F.lit(float(x)) for x in p])) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for p in planes
        ]
        return F.concat(*bits)

    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("__cv")
    ).withColumn("__cn", _norm(F.col("__cv"))).withColumn("__bucket", bucket_bits(F.col("__cv")))

    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("__qv")
    ).withColumn("__qn", _norm(F.col("__qv"))).withColumn("__b0", bucket_bits(F.col("__qv")))

    if multiprobe:
        flips = F.array(
            F.col("__b0"),
            *[
                F.concat(
                    F.substring("__b0", 1, i),
                    F.when(F.substring("__b0", i + 1, 1) == "1", F.lit("0")).otherwise(F.lit("1")),
                    F.substring("__b0", i + 2, n_planes - i - 1),
                )
                for i in range(n_planes)
            ],
        )
        q = q.withColumn("__bucket", F.explode(flips))
    else:
        q = q.withColumn("__bucket", F.col("__b0"))

    scored = c.join(F.broadcast(q), on="__bucket").withColumn(
        "cosine", _dot(F.col("__cv"), F.col("__qv")) / (F.col("__cn") * F.col("__qn"))
    )
    scored = scored.dropDuplicates(["query_id", "vec_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    center_stride: int = 32,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index.

    Coarse quantizer: every ``center_stride``-th corpus vector (by id) is
    a center — a deterministic sampled quantizer, the zero-build-cost
    baseline; at scale swap the center set for an offline k-means run,
    the plan below is unchanged. Corpus vectors assign to their nearest
    center with a map-side ``max_by`` aggregation (the broadcast join
    explodes N x C rows but combines back to N before any shuffle);
    queries probe their ``n_probe`` nearest centers and rescore exact
    cosine inside the matched cells only.

    With ``n_probe`` >= the center count this is EXACTLY brute force —
    the recall/test anchor.
    """
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("__cv")
    ).withColumn("__cn", _norm(F.col("__cv")))
    centers = c.filter(F.col("vec_id") % center_stride == 0).select(
        F.col("vec_id").alias("__cid"), F.col("__cv").alias("__center"), F.col("__cn").alias("__cnorm")
    )

    assigned = (
        c.select(F.col("vec_id"), F.col("__cv").alias("__v"), F.col("__cn").alias("__n"))
        .crossJoin(F.broadcast(centers))
        .withColumn("__ccos", _dot(F.col("__v"), F.col("__center")) / (F.col("__n") * F.col("__cnorm")))
        .groupBy("vec_id")
        .agg(
            F.max_by("__cid", F.struct(F.col("__ccos"), -F.col("__cid"))).alias("__cid"),
            F.first("__v").alias("__cv"),
            F.first("__n").alias("__cn"),
        )
    )

    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("__qv")
    ).withColumn("__qn", _norm(F.col("__qv")))
    q_scored = q.crossJoin(F.broadcast(centers)).withColumn(
        "__ccos", _dot(F.col("__qv"), F.col("__center")) / (F.col("__qn") * F.col("__cnorm"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("__ccos").desc(), F.col("__cid").asc())
    probes = (
        q_scored.withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= n_probe)
        .select("query_id", "__qv", "__qn", "__cid")
    )

    scored = assigned.join(F.broadcast(probes), on="__cid").withColumn(
        "cosine", _dot(F.col("__cv"), F.col("__qv")) / (F.col("__cn") * F.col("__qn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
