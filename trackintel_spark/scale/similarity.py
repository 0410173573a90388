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
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Rows-x-centers similarity chunk: the (rows x k) matmul temp stays a
# small REUSED buffer (guide §4.2). 2M float64 elements = 16 MiB per
# worker — large enough for BLAS efficiency at any k, small enough
# that the one-time first-touch page-fault wave across all concurrent
# workers stays negligible (r13; at the former 8M/64 MiB the first
# evaluation paid ~2 GiB of faults across 32 workers). Chunking along
# rows only regroups dgemm calls — each output element is a fixed
# k-dim reduction, so cid/ccos are bit-identical for any chunk size.
_CHUNK_ELEMS = 2_000_000


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
    # rank (and the top-k cutoff) on the ROUNDED cosine, like
    # bm25_search: mathematically-tied vectors dot-sum in a
    # nondeterministic float order, and sub-ulp noise would defeat the
    # id tie-break and swap boundary ranks run-to-run / engine-to-
    # engine. The emitted cosine stays unrounded.
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 9).desc(), F.col("vec_id").asc()
    )
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
    # rank (and the top-k cutoff) on the ROUNDED cosine, like
    # bm25_search: mathematically-tied vectors dot-sum in a
    # nondeterministic float order, and sub-ulp noise would defeat the
    # id tie-break and swap boundary ranks run-to-run / engine-to-
    # engine. The emitted cosine stays unrounded.
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 9).desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def nearest_center_expr(
    vec: "F.Column",
    norm: "F.Column",
    centers: list[list[float]],
    codegen_max_terms: int = 20_000,
    cleanups: list | None = None,
):
    """Column ``struct(cid long, ccos double)``: the cosine-nearest
    center of ``vec`` and the cosine achieved — map-side and
    shuffle-free in both shapes (shared by :func:`kmeans_centers`,
    :func:`trackintel_spark.scale.dedup.semantic_dedup`):

    * small ``k*dim``: an ``array_max`` over literal center arrays,
      fully inside whole-stage codegen;
    * large ``k*dim`` (> ``codegen_max_terms`` literal nodes would
      balloon Catalyst analysis): an Arrow-batched pandas UDF doing one
      BLAS matmul + argmax per batch against a broadcast numpy matrix —
      the center set never becomes part of the plan. The broadcast
      handle is appended to ``cleanups`` (if given) so the caller can
      ``destroy()`` it once the job ran.

    Ties break to the smallest center id in both shapes.
    """
    k = len(centers)
    norms = [float(np.linalg.norm(ctr)) or 1.0 for ctr in centers]
    dim = len(centers[0])
    if k * dim <= codegen_max_terms:
        # zero-norm guard: callers filter zero vectors out semantically,
        # but a pushed-down predicate on the output (e.g. a cluster_id
        # routing filter pushed through the rank window into the same
        # Filter as the norm>0 conjunct) can evaluate this expression on
        # a zero row first — under ANSI mode that's a task-killing
        # DIVIDE_BY_ZERO. Dividing by +inf instead yields ccos=0 for a
        # row whose output is discarded anyway, and leaves norm>0 rows
        # bit-identical. (The BLAS path below guards with nm[nm==0]=1.)
        norm = F.when(norm > 0, norm).otherwise(F.lit(float("inf")))
        lits = [F.array(*[F.lit(float(x)) for x in ctr]) for ctr in centers]
        best = F.array_max(
            F.array(*[
                F.struct(
                    (_dot(vec, lits[i]) / (norm * F.lit(norms[i]))).alias("c"),
                    F.lit(-i).alias("negi"),
                )
                for i in range(k)
            ])
        )
        return F.struct(
            (-best["negi"]).cast("long").alias("cid"), best["c"].alias("ccos")
        )

    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf

    spark = SparkSession.getActiveSession()
    mat_bc = spark.sparkContext.broadcast(
        (np.asarray(centers, dtype=np.float64) / np.asarray(norms)[:, None]).T.copy()
    )
    if cleanups is not None:
        cleanups.append(mat_bc)

    @pandas_udf("cid long, ccos double")
    def _nearest(vs: pd.Series) -> pd.DataFrame:
        import numpy as _np
        import pandas as _pd

        mat = mat_bc.value  # (dim, k)
        m = _np.stack(vs.to_numpy())  # (batch, dim)
        mu = _unit_rows(m)
        cid, ccos = _chunked_assign(mu, mat, want_cos=True)
        return _pd.DataFrame({"cid": cid, "ccos": ccos})

    return _nearest(vec)


def _unit_rows(m: np.ndarray) -> np.ndarray:
    """Row-L2-normalize, zero rows mapped through norm 1 (the shared
    zero-norm guard of the BLAS assignment paths)."""
    nm = np.linalg.norm(m, axis=1)
    nm[nm == 0] = 1.0
    return m / nm[:, None]


def _chunked_assign(mu: np.ndarray, mat: np.ndarray, want_cos: bool = False):
    """First-argmax (= smallest-center-id tie-break) assignment of
    unit-normalized rows against the (dim, k) unit-center matrix —
    the ONE implementation shared by ``nearest_center_expr``'s pandas
    UDF and ``_lloyd_update_fused`` so the two can never drift.

    The matmul is chunked through a small buffer so the (rows x k)
    similarity temp stays ~``_CHUNK_ELEMS`` float64s: one full
    (batch x k) allocation per batch is hundreds of MB per worker at
    large k, and the first-touch page faults across every concurrent
    worker dominated the first evaluation (measured 170 s first vs
    6 s warm at 1.6M x 3200 on 32 cores). Chunking along rows only
    regroups dgemm calls (each output element is a fixed k-dim
    reduction), so cid/ccos are bit-identical for any chunk size.
    """
    n_rows, n_k = len(mu), mat.shape[1]
    cid = np.empty(n_rows, dtype="int64")
    ccos = np.empty(n_rows, dtype="float64") if want_cos else None
    step = max(1, _CHUNK_ELEMS // max(n_k, 1))
    buf = np.empty((min(step, n_rows), n_k), dtype="float64")
    for s in range(0, n_rows, step):
        e = min(s + step, n_rows)
        np.dot(mu[s:e], mat, out=buf[: e - s])
        # argmax takes the FIRST maximum — the min-id tie-break
        cid[s:e] = np.argmax(buf[: e - s], axis=1)
        if want_cos:
            ccos[s:e] = buf[np.arange(e - s), cid[s:e]]
    return cid, ccos


def kmeans_centers(
    corpus: DataFrame,
    n_centers: int = 32,
    iters: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codegen_max_terms: int = 20_000,
) -> list[list[float]]:
    """Distributed spherical k-means (Lloyd) for the IVF coarse quantizer.

    Per iteration, ONE corpus scan and one k*dim-sized shuffle:

    * assignment is map-side and shuffle-free in both shapes: literal
      ``array_max`` expressions inside whole-stage codegen while
      k*dim <= ``codegen_max_terms`` (bigger literal trees balloon
      Catalyst analysis), else an Arrow-batched pandas UDF doing one
      BLAS matmul + argmax per batch against a broadcast numpy center
      matrix (k*dim doubles — the legitimate broadcast case);
    * the center update posexplodes assigned vectors to (center, dim)
      cells and averages — hash aggregation with map-side combine, so
      the shuffle carries ~k*dim rows per partition, not N*dim.

    Empty clusters keep their previous center. Means are L2-normalized
    each round (spherical k-means — the right objective under cosine).
    Init is k-means++ (greedy D^2 seeding) over a bounded deterministic
    sample: the ``50*k`` vectors with smallest ``xxhash64(id, seed)``
    (TakeOrdered — per-partition heaps, no full sort) come to the
    driver and numpy picks spread-out seeds; naive uniform seeding
    routinely drops a true cluster (two seeds in one blob) and Lloyd
    cannot recover from that.
    """
    c = corpus.select(
        F.col(id_col).alias("__id"), F.col(vec_col).cast("array<double>").alias("__v")
    ).withColumn("__n", _norm(F.col("__v"))).filter(F.col("__n") > 0)

    # bounded driver state at ANY k: the seeding sample is capped at 100k
    # rows regardless of n_centers (50/center is ideal; fewer per center
    # still seeds fine because Lloyd repairs)
    sample = (
        c.select("__id", "__v")
        .orderBy(F.xxhash64(F.col("__id"), F.lit(seed)))
        .limit(max(min(50 * n_centers, 100_000), n_centers))
        .collect()
    )
    if not sample:
        raise ValueError("empty corpus")
    pts = np.asarray([r["__v"] for r in sample], dtype=float)
    pts_unit = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    rng = np.random.RandomState(seed)
    if n_centers > 512:
        # greedy D^2 seeding is O(k * sample * dim) — prohibitive past a
        # few hundred centers. Hash-spread sample rows + Lloyd repair is
        # the standard large-k init (what faiss does); the sample order
        # is xxhash64-uniform, so taking a prefix IS a uniform draw.
        chosen = list(range(min(n_centers, len(pts))))
    else:
        first = int(rng.randint(len(pts)))
        chosen = [first]
        # cosine distance d = 1 - cos; greedy D^2 re-weighting per pick
        d2 = (1.0 - pts_unit @ pts_unit[first]) ** 2
        for _ in range(1, min(n_centers, len(pts))):
            tot = float(d2.sum())
            if tot <= 0:
                remaining = [i for i in range(len(pts)) if i not in set(chosen)]
                if not remaining:
                    break
                nxt = remaining[0]
            else:
                nxt = int(np.searchsorted(np.cumsum(d2 / tot), rng.random_sample()))
                nxt = min(nxt, len(pts) - 1)
            chosen.append(nxt)
            d2 = np.minimum(d2, (1.0 - pts_unit @ pts_unit[nxt]) ** 2)
    centers = [pts[i].tolist() for i in chosen]

    k, dim = len(centers), len(centers[0])
    for _ in range(max(iters, 0)):
        if k * dim > codegen_max_terms:
            # Fused Lloyd update for the BLAS regime (r13, guide §2.3
            # "aggregate before you shuffle" + §4.2): ONE mapInPandas
            # pass computes the assignment (same normalization /
            # chunked matmul / first-argmax tie-break as
            # nearest_center_expr's pandas path) AND the per-partition
            # (sum, count) partials per center — shipping k*dim partial
            # rows per partition to the driver instead of posexploding
            # N*dim cells through a shuffle. Mean = sum/count with
            # row-order partial accumulation, the same structure as the
            # posexplode path's F.avg (per-partition partials merged
            # then divided), so results agree to float-merge-order
            # noise; empty clusters keep their previous center as
            # before.
            centers = _lloyd_update_fused(c, centers)
        else:
            cleanups: list = []
            assign = nearest_center_expr(
                F.col("__v"), F.col("__n"), centers, codegen_max_terms, cleanups
            )["cid"]
            cell = (
                c.withColumn("__cid", assign)
                .select("__cid", F.posexplode("__v").alias("__pos", "__x"))
                .groupBy("__cid", "__pos")
                .agg(F.avg("__x").alias("__m"))
            )
            rows = cell.collect()  # k*dim cells — bounded driver state
            for bc in cleanups:  # the assignment job is done; release now
                bc.destroy()
            new = [None] * len(centers)
            for r in rows:
                if new[r["__cid"]] is None:
                    new[r["__cid"]] = [0.0] * dim
                new[r["__cid"]][r["__pos"]] = r["__m"]
            centers = [
                (np.asarray(m) / (np.linalg.norm(m) or 1.0)).tolist() if m is not None else old
                for m, old in zip(new, centers)
            ]
    return centers


def _lloyd_update_fused(c: DataFrame, centers: list[list[float]]) -> list[list[float]]:
    """One Lloyd iteration for the large-k (BLAS) regime: assignment +
    per-partition (sum, count) partials in a single ``mapInPandas``
    pass over the ``__v`` column only. See :func:`kmeans_centers` for
    the equivalence argument; the assignment replicates
    :func:`nearest_center_expr`'s pandas path exactly (unit-normalized
    rows against the broadcast unit-center matrix, reused chunk
    buffer, first-maximum = smallest-id tie-break)."""
    import pandas as pd
    from pyspark.sql import SparkSession

    k, dim = len(centers), len(centers[0])
    norms = [float(np.linalg.norm(ctr)) or 1.0 for ctr in centers]
    spark = SparkSession.getActiveSession()
    mat_bc = spark.sparkContext.broadcast(
        (np.asarray(centers, dtype=np.float64) / np.asarray(norms)[:, None]).T.copy()
    )

    def part(batches):
        mat = mat_bc.value  # (dim, k)
        sums = np.zeros((k, dim), dtype="float64")
        cnts = np.zeros(k, dtype="int64")
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            m = np.stack(pdf["__v"].to_numpy())
            cid, _ = _chunked_assign(_unit_rows(m), mat)
            np.add.at(sums, cid, m)  # raw vectors, row order
            cnts += np.bincount(cid, minlength=k)
        if not seen:
            return
        nz = np.flatnonzero(cnts)
        yield pd.DataFrame(
            {
                "__cid": nz.astype("int64"),
                "__sum": [sums[i] for i in nz],
                "__cnt": cnts[nz],
            }
        )

    parts = c.select("__v").mapInPandas(
        part, schema="__cid long, __sum array<double>, __cnt long"
    )
    pdfc = parts.toPandas()  # <= n_partitions * k tiny rows
    mat_bc.destroy()
    tot = np.zeros((k, dim), dtype="float64")
    cnt = np.zeros(k, dtype="int64")
    # toPandas concatenates partitions in partition order — the merge
    # order is deterministic
    for cid_v, sum_v, cnt_v in zip(pdfc["__cid"], pdfc["__sum"], pdfc["__cnt"]):
        tot[cid_v] += np.asarray(sum_v, dtype="float64")
        cnt[cid_v] += cnt_v
    out = []
    for i, old in enumerate(centers):
        if cnt[i]:
            m = tot[i] / cnt[i]
            out.append((m / (np.linalg.norm(m) or 1.0)).tolist())
        else:
            out.append(old)
    return out


def sample_centers(
    corpus: DataFrame,
    n_centers: int,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """A FIXED-SIZE deterministic coarse quantizer: the ``n_centers``
    non-zero vectors with the smallest ``xxhash64(id, seed)`` — the same
    bounded-sample device :func:`kmeans_centers` uses for seeding.
    TakeOrdered (per-partition heaps), so the cost is one corpus scan
    and ``n_centers * dim`` driver doubles — independent of corpus size.
    """
    if n_centers <= 0:
        raise ValueError(f"n_centers must be positive, got {n_centers}")
    rows = (
        corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).cast("array<double>").alias("__v"))
        .withColumn("__n", _norm(F.col("__v")))
        .filter(F.col("__n") > 0)
        .select("__id", "__v")
        .orderBy(F.xxhash64(F.col("__id"), F.lit(seed)), F.col("__id"))
        .limit(n_centers)
        .collect()
    )
    if not rows:
        raise ValueError("empty corpus")
    return [list(map(float, r["__v"])) for r in rows]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centers: int = 64,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centers: list[list[float]] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index.

    Coarse quantizer: pass ``centers`` (e.g. from :func:`kmeans_centers`)
    for a trained quantizer; without it, a FIXED-SIZE deterministic
    hash-sample of ``n_centers`` corpus vectors (:func:`sample_centers`)
    is the zero-build-cost default — bounded driver state regardless of
    corpus size. (An earlier stride-derived quantizer made the center
    count grow with the corpus — an N x C quadratic join plus a
    data-sized broadcast; the fixed sample is the scale-safe default.)
    Corpus assignment is map-side in BOTH cases via
    :func:`nearest_center_expr` (codegen argmax, or one BLAS matmul per
    Arrow batch past ``codegen_max_terms``) — no N x C intermediate, no
    shuffle. Queries probe their ``n_probe`` nearest centers and rescore
    exact cosine inside the matched cells only.

    With ``n_probe`` >= the center count this is EXACTLY brute force —
    the recall/test anchor.
    """
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("__cv")
    ).withColumn("__cn", _norm(F.col("__cv")))
    if centers is None:
        centers = sample_centers(corpus, n_centers, seed=seed, id_col=id_col, vec_col=vec_col)
    centers = [list(map(float, ctr)) for ctr in centers]
    spark = corpus.sparkSession
    centers_df = spark.createDataFrame(
        [(i, ctr) for i, ctr in enumerate(centers)],
        "__cid long, __center array<double>",
    ).withColumn("__cnorm", _norm(F.col("__center")))

    # known center list: pure map-side assignment, no N x C rows,
    # no shuffle (codegen argmax or BLAS batch past the term cap)
    assigned = c.filter(F.col("__cn") > 0).withColumn(
        "__cid", nearest_center_expr(F.col("__cv"), F.col("__cn"), centers)["cid"]
    )

    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("__qv")
    ).withColumn("__qn", _norm(F.col("__qv")))
    q_scored = q.crossJoin(F.broadcast(centers_df)).withColumn(
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
    # rank (and the top-k cutoff) on the ROUNDED cosine, like
    # bm25_search: mathematically-tied vectors dot-sum in a
    # nondeterministic float order, and sub-ulp noise would defeat the
    # id tie-break and swap boundary ranks run-to-run / engine-to-
    # engine. The emitted cosine stays unrounded.
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 9).desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def random_project(
    emb: DataFrame,
    out_dim: int,
    seed: int = 42,
    vec_col: str = "embedding",
    out_col: str | None = None,
    normalize: bool = True,
) -> DataFrame:
    """Johnson–Lindenstrauss random projection of an embedding column to
    ``out_dim`` — the standard compression step before storing or
    indexing billions of vectors (JL: random Gaussian projections
    preserve pairwise geometry within ~sqrt(ln n / d) distortion; with
    ``normalize`` the projected vectors are re-unit-normalized so
    downstream cosine math is unchanged).

    Map-side only: the d_in x d_out Gaussian matrix (scaled by
    1/sqrt(out_dim)) derives from ``seed``, rides one executor
    broadcast, and each Arrow batch projects with a single BLAS matmul
    — no shuffle, deterministic across runs and partitionings.
    Composes with :func:`cosine_topk_bruteforce` / :func:`ivf_topk` /
    :func:`lsh_bucketed_topk` on the projected column.
    """
    if out_dim <= 0:
        raise ValueError("out_dim must be positive")
    first = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("empty input")
    d_in = first["d"]
    rng = np.random.RandomState(seed)
    mat = (rng.standard_normal((d_in, out_dim)) / np.sqrt(out_dim)).astype(np.float64)
    spark = emb.sparkSession
    mat_bc = spark.sparkContext.broadcast(mat)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def _proj(vs: pd.Series) -> pd.Series:
        m = mat_bc.value
        x = np.stack(vs.to_numpy()).astype(np.float64)  # (batch, d_in)
        y = x @ m  # (batch, out_dim)
        if normalize:
            nrm = np.linalg.norm(y, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            y = y / nrm
        return pd.Series(list(y))

    return emb.withColumn(out_col or vec_col, _proj(F.col(vec_col).cast("array<double>")))
