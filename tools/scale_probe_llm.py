#!/usr/bin/env python
"""LLM-pipeline operator scale probe: wall-clock at multiple synthetic
sizes, pure compute (spark.range inputs, no IO). Times

* line_dedup on corpora where every doc shares boilerplate lines;
* semantic_dedup on blob-structured embeddings (fixed centers, so the
  number is the dedup scan, not Lloyd iterations);
* asof_join left/right merge-scan;
* DSIR fit + weight (hashed-ngram model, map-side scoring).

Usage:  python tools/scale_probe_llm.py [--docs N ...] [--vecs N ...]
        [--asof N ...]
Defaults: docs 1M/4M, vecs 100k/400k, asof 10M/40M, bm25 1M/4M.
Results go to SCALE.md's measured-scaling rows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def docs_input(spark, n: int):
    """Docs with 6 lines each: 2 corpus-wide boilerplate lines, 3
    semi-shared lines (1000-way duplicated), 1 unique line."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            "\n",
            F.lit("subscribe to our newsletter for updates"),
            F.concat(F.lit("shared block number "), (F.col("id") % 1000).cast("string"), F.lit(" lorem ipsum dolor sit amet")),
            F.concat(F.lit("unique content line for document "), F.col("id").cast("string"), F.lit(" with several words of payload")),
            F.concat(F.lit("another shared fragment "), (F.col("id") % 1000).cast("string"), F.lit(" consectetur adipiscing elit")),
            F.lit("copyright footer all rights reserved"),
            F.concat(F.lit("trailing unique token "), F.xxhash64("id").cast("string")),
        ).alias("text"),
    )


def blob_centers(blobs: int, dim: int = 32):
    import numpy as np

    return (np.random.RandomState(0).standard_normal((blobs, dim)) * 3.0).tolist()


def vecs_input(spark, n: int, centers):
    """Blob-structured vectors built by joining a broadcast center table
    and adding hash noise; every 3rd id is a near-clone of its
    predecessor (clone groups share the noise keyed on ``base``)."""
    blobs = len(centers)
    spark_ = spark
    centers_df = spark_.createDataFrame(
        [(b, centers[b]) for b in range(blobs)], "b long, c array<double>"
    )
    base = (F.col("id") / 3).cast("long")
    return (
        spark_.range(n)
        .withColumn("b", base % blobs)
        .join(F.broadcast(centers_df), on="b")
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                "c",
                lambda x, i: x
                + F.pmod(F.xxhash64((F.col("id") / 3).cast("long"), i), F.lit(1000)).cast(
                    "double"
                )
                / 2000.0
                + F.pmod(F.xxhash64("id", i, F.lit(7)), F.lit(100)).cast("double") / 50000.0,
            ).alias("embedding"),
        )
    )


def run_line_dedup(spark, n: int) -> dict:
    from trackintel_spark.scale import line_dedup

    t0 = time.time()
    out = line_dedup(docs_input(spark, n), min_count=2)
    removed = out.agg(F.sum("n_lines_removed")).collect()[0][0]
    w = time.time() - t0
    return {"op": "line_dedup", "rows": n, "wall_s": round(w, 1), "removed": int(removed), "rows_per_s": int(n / w)}


def run_substring_dedup(spark, n: int) -> dict:
    """Span removal at corpus scale: the docs_input corpus duplicates
    its boilerplate lines corpus-wide and its shared blocks 1000-way,
    so chunk windows covering them flag and merge into spans."""
    from trackintel_spark.scale import dedup_substrings

    t0 = time.time()
    out = dedup_substrings(docs_input(spark, n), window=8, stride=2)
    removed = out.agg(F.sum("n_tokens_removed")).collect()[0][0]
    w = time.time() - t0
    return {"op": "substring_dedup", "rows": n, "wall_s": round(w, 1),
            "removed": int(removed), "rows_per_s": int(n / w)}


def run_semantic_dedup(spark, n: int, max_compare: int | None = None) -> dict:
    """SemDeDup contract: cluster count grows with the corpus (~n/500
    here, the paper's cluster-size regime), so the per-cluster
    quadratic term stays bounded; at these k*dim the BLAS pandas-UDF
    assignment path (past codegen_max_terms) is what runs.
    ``max_compare`` measures the per-cluster cap (the paper's sampling
    lever) that linearizes the within-cluster pair join."""
    from trackintel_spark.scale import semantic_dedup

    centers = blob_centers(max(64, n // 500))
    # materialize the synthetic input BEFORE the clock: the generator's
    # 2*dim xxhash calls per row would otherwise re-run inside the
    # operator DAG on every branch evaluation and dominate the timing
    inp = vecs_input(spark, n, centers).localCheckpoint()
    t0 = time.time()
    out = semantic_dedup(inp, threshold=0.995, centers=centers, max_compare=max_compare)
    kept = out.filter("is_kept").count()
    w = time.time() - t0
    return {
        "op": "semantic_dedup", "rows": n, "wall_s": round(w, 1), "kept": kept,
        "rows_per_s": int(n / w), "max_compare": max_compare,
    }


def run_embedding_dedup_stack(spark, n: int) -> dict:
    """The COMPOSED embedding dedup recipe end-to-end (the
    examples/llm_data_pipeline.py stage 3c shape at scale):
    dedup_embedding_cosine(method='lsh') candidate pairs (exact-cosine
    verified) -> dedup_clusters (connected components + canonical pick)
    -> keep-list count. Anisotropic unit vectors with planted 4-member
    near-dup groups; reports recall of dropped duplicates."""
    from trackintel_spark.scale import dedup_embedding_cosine
    from trackintel_spark.scale.dedup import dedup_clusters

    inp = aniso_unit_vecs_input(spark, n).localCheckpoint()
    t0 = time.time()
    pairs = dedup_embedding_cosine(inp, threshold=0.95, method="lsh")
    keep = dedup_clusters(
        inp.select(F.col("vec_id").alias("doc_id")), pairs.select("id_a", "id_b")
    )
    kept = keep.filter("is_canonical").count()
    w = time.time() - t0
    # ideal keep-count = one per planted 4-group
    return {
        "op": "embedding_dedup_stack", "rows": n, "wall_s": round(w, 1),
        "kept": kept, "dup_recall": round((n - kept) / (n - n // 4), 3),
        "rows_per_s": int(n / w),
    }


def run_semantic_dedup_defaults(spark, n: int) -> dict:
    """The NO-PARAMETER contract: ``semantic_dedup(emb, threshold)``
    alone must stay near-linear — n_centers auto-derived from one
    count() (~n/500, clamped to [16, 4096]) and the default
    max_compare=1024 cap. Includes the in-line spherical k-means, so
    this measures the full untrained path a first-time caller gets.

    Stage attribution: the probe replays the defaults flow through its
    own public pieces — the sizing count(), ``kmeans_centers`` (the
    inline Lloyd iterations), then ``semantic_dedup(centers=...)`` with
    the default cap (assignment + rank + capped pair join) — and
    reports each wall separately, so a throughput regression names its
    stage. The staged total IS the defaults path (semantic_dedup with
    ``centers is None`` runs exactly these steps in sequence)."""
    from trackintel_spark.scale import semantic_dedup
    from trackintel_spark.scale.similarity import kmeans_centers

    centers = blob_centers(max(64, n // 500))
    inp = vecs_input(spark, n, centers).localCheckpoint()
    t0 = time.time()
    placeable = inp.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n_centers = int(min(4096, max(16, -(-placeable.count() // 500))))
    t1 = time.time()
    trained = kmeans_centers(
        placeable, n_centers=n_centers, iters=3, seed=42,
        id_col="vec_id", vec_col="embedding",
    )
    t2 = time.time()
    out = semantic_dedup(inp, threshold=0.995, centers=trained)
    kept = out.filter("is_kept").count()
    t3 = time.time()
    # contrast: the opt-in grouped-BLAS pair mode on the same centers
    # (healthy-cluster fast path — see semantic_dedup's pair_mode docs)
    kept_g = (
        semantic_dedup(inp, threshold=0.995, centers=trained, pair_mode="grouped")
        .filter("is_kept")
        .count()
    )
    t4 = time.time()
    w = t3 - t0
    return {
        "op": "semantic_dedup_defaults", "rows": n, "wall_s": round(w, 1),
        # kept_grouped is reported rather than asserted equal: decisions
        # may differ only at float-rounding distance from the threshold
        # (see pair_mode docs) and a probe must not kill the bench run
        "kept": kept, "kept_grouped": kept_g, "rows_per_s": int(n / w),
        "count_s": round(t1 - t0, 1),
        "kmeans_s": round(t2 - t1, 1),
        "dedup_s": round(t3 - t2, 1),
        "dedup_grouped_s": round(t4 - t3, 1),
    }


def aniso_unit_vecs_input(spark, n: int, dim: int = 64, group: int = 4):
    """Anisotropic unit-norm embedding stand-in: groups of ``group``
    consecutive ids share a base direction whose spectrum decays
    exp(-j/24) (real sentence/CLIP embeddings concentrate variance in a
    few directions), plus small per-row noise — intra-group cosine
    ~0.99 (planted near-dups), inter-group cosine far below 0.95."""
    import math as _math

    base = (F.col("id") / group).cast("long")
    comps = []
    for j in range(dim):
        scale = _math.exp(-j / 24.0)
        ctr = (
            (F.pmod(F.xxhash64(base, F.lit(j)), F.lit(2001)).cast("double") - 1000.0) / 1000.0
        ) * scale
        noise = (
            (F.pmod(F.xxhash64("id", F.lit(j), F.lit(7)), F.lit(2001)).cast("double") - 1000.0)
            / 1000.0
        ) * 0.02
        comps.append(ctr + noise)
    raw = F.array(*comps)
    nrm = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda a, x: a + x * x))
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(raw, lambda x: x / nrm).alias("embedding"),
    )


def run_embedding_dedup(
    spark, n: int, method: str = "exact", threshold: float = 0.95, n_planes: int = 20
) -> dict:
    """dedup_embedding_cosine on UNIT-NORM anisotropic vectors — the
    case where the old L2-norm banding degenerated to all-pairs.
    method='exact' (lossless PCA banding) is the moderate-N / verifier
    path; method='lsh' with ~log2(N) planes is the 1M+ scale path
    (candidates ~ N * probes, not a shared-cell quadratic)."""
    from trackintel_spark.scale import dedup_embedding_cosine

    inp = aniso_unit_vecs_input(spark, n).localCheckpoint()
    t0 = time.time()
    pairs = dedup_embedding_cosine(
        inp, threshold=threshold, method=method, n_planes=n_planes
    ).count()
    w = time.time() - t0
    return {
        "op": "embedding_dedup", "rows": n, "wall_s": round(w, 1), "pairs": int(pairs),
        "rows_per_s": int(n / w), "method": method,
    }


def run_web_stage0(spark, n: int) -> dict:
    """Crawl stage 0 throughput: n synthetic frontier URLs (25% dup
    groups with case/port/tracking-param/userinfo variants, hosts drawn
    from 50k sites with a 1k-host robots table) through canonicalize ->
    robots gate -> URL dedup — the codegen-only pipeline, one exchange
    on the canonical string plus the broadcast host join."""
    from trackintel_spark.scale import dedup_url
    from trackintel_spark.scale.web import filter_by_robots

    ids = spark.range(n)
    host = F.concat(F.lit("site"), (F.col("id") % 50_000).cast("string"), F.lit(".com"))
    variant = F.col("id") % 4
    base = (F.col("id") % (n // 4 if n >= 4 else 1)).cast("string")
    url = (
        F.when(variant == 0, F.concat(F.lit("https://www."), host, F.lit(":443/p/"), base, F.lit("/?utm_source=x&b=2&a=1")))
        .when(variant == 1, F.concat(F.lit("HTTPS://"), F.upper(host), F.lit("/p//"), base, F.lit("?a=1&b=2")))
        .when(variant == 2, F.concat(F.lit("https://u:p@"), host, F.lit("/p/"), base, F.lit("?b=2&fbclid=z&a=1")))
        .otherwise(F.concat(F.lit("https://"), host, F.lit("/q/"), F.col("id").cast("string")))
    )
    urls = ids.select(F.col("id").alias("doc_id"), url.alias("url"))
    robots = spark.range(1_000).select(
        F.concat(F.lit("site"), F.col("id").cast("string"), F.lit(".com")).alias("host"),
        F.when(F.col("id") % 2 == 0, F.lit("User-agent: *\nDisallow: /q/"))
        .otherwise(F.lit("User-agent: *\nAllow: /")).alias("robots_txt"),
    )
    t0 = time.time()
    gated = filter_by_robots(urls, robots).filter("robots_allowed")
    kept = dedup_url(gated).count()
    w = time.time() - t0
    return {
        "op": "web_stage0", "rows": n, "wall_s": round(w, 1), "kept": int(kept),
        "rows_per_s": int(n / w),
    }


def run_asof(spark, n: int, direction: str = "backward") -> dict:
    from trackintel_spark.operators import asof_join

    left = spark.range(n).select(
        F.col("id").alias("lid"), (F.col("id") % 100_000).alias("k"),
        (F.pmod(F.xxhash64("id"), F.lit(10_000_000)).cast("double")).alias("t"),
    )
    right = spark.range(n // 10).select(
        (F.col("id") % 100_000).alias("k"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000_000)).cast("double")).alias("t"),
        F.col("id").alias("rv"),
    )
    t0 = time.time()
    out = asof_join(left, right, on="t", by="k", direction=direction)
    matched = out.filter("rv is not null").count()
    w = time.time() - t0
    return {
        "op": "asof_join", "rows": n, "wall_s": round(w, 1), "matched": matched,
        "rows_per_s": int(n / w), "direction": direction,
    }


def run_dsir(spark, n: int) -> dict:
    from trackintel_spark.scale import dsir_log_weights, fit_ngram_model

    docs = docs_input(spark, n)
    target = docs_input(spark, 10_000)
    t0 = time.time()
    t_lp = fit_ngram_model(target, buckets=10_000)
    w_df = dsir_log_weights(docs, t_lp)
    cnt = w_df.agg(F.avg("log_weight")).collect()[0][0]
    w = time.time() - t0
    return {"op": "dsir_fit+weight", "rows": n, "wall_s": round(w, 1), "avg_w": round(float(cnt), 3), "rows_per_s": int(n / w)}


def run_bm25(spark, n: int) -> dict:
    from trackintel_spark.scale import bm25_search, corpus_stats

    docs = docs_input(spark, n)
    st = corpus_stats(docs).persist()
    st.count()
    t0 = time.time()
    out = bm25_search(docs, "lorem ipsum dolor payload", k=10, stats=st).collect()
    w = time.time() - t0
    st.unpersist()
    return {"op": "bm25_search", "rows": n, "wall_s": round(w, 1), "hits": len(out), "rows_per_s": int(n / w)}


def run_incremental_dedup(spark, n: int) -> dict:
    """The nightly-shard shape: history of ``n`` docs reduced to its
    digest index ONCE (index_s — amortized across every later day),
    then a shard of n/10 docs — half verbatim re-arrivals, half new —
    checked against it (probe_s, the recurring nightly cost). History
    text is never rescanned in the probe stage."""
    from trackintel_spark.scale import build_exact_index, dedup_against_index

    t0 = time.time()
    index = build_exact_index(docs_input(spark, n)).persist()
    index.count()
    index_s = time.time() - t0

    # half the shard re-arrives verbatim, half is genuinely new text
    m = n // 10
    shard = docs_input(spark, m).select(
        (F.col("doc_id") + n * 10).alias("doc_id"),
        F.when(F.col("doc_id") % 2 == 0, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" fresh tail "),
                            F.xxhash64("doc_id").cast("string")))
        .alias("text"),
    )
    t1 = time.time()
    out = dedup_against_index(shard, index)
    dups = out.filter(~F.col("is_new")).count()
    probe_s = time.time() - t1
    index.unpersist()
    return {
        "op": "incremental_dedup", "rows": n, "shard_rows": m,
        "wall_s": round(index_s + probe_s, 1),
        "index_s": round(index_s, 1), "probe_s": round(probe_s, 1),
        "dups": int(dups), "rows_per_s": int(m / probe_s),
    }


def main():
    from trackintel_spark import get_spark

    args = sys.argv[1:]

    def take(flag, default):
        if flag in args:
            i = args.index(flag)
            vals = []
            for a in args[i + 1 :]:
                if a.startswith("--"):
                    break
                vals.append(int(float(a)))
            return vals or default
        return default

    docs_ns = take("--docs", [1_000_000, 4_000_000])
    vec_ns = take("--vecs", [100_000, 400_000])
    asof_ns = take("--asof", [10_000_000, 40_000_000])
    bm25_ns = take("--bm25", [1_000_000, 4_000_000])

    spark = get_spark(app_name="scale_probe_llm")
    spark.sparkContext.setLogLevel("ERROR")
    for n in docs_ns:
        if n:
            print(run_line_dedup(spark, n), flush=True)
            print(run_substring_dedup(spark, n), flush=True)
    for n in docs_ns:
        if n:
            print(run_dsir(spark, n), flush=True)
    for n in vec_ns:
        if n:
            print(run_semantic_dedup(spark, n), flush=True)
            print(run_semantic_dedup(spark, n, max_compare=100), flush=True)
    for n in take("--vecs-defaults", []):
        if n:
            print(run_semantic_dedup_defaults(spark, n), flush=True)
    for n in take("--dedup-stack", []):
        if n:
            print(run_embedding_dedup_stack(spark, n), flush=True)
    for n in take("--web", [1_000_000, 4_000_000]):
        if n:
            print(run_web_stage0(spark, n), flush=True)
    for n in asof_ns:
        if n:
            print(run_asof(spark, n), flush=True)
    for n in bm25_ns:
        if n:
            print(run_bm25(spark, n), flush=True)


if __name__ == "__main__":
    main()
