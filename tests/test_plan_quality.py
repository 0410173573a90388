"""Physical-plan regression tests.

Correctness tests prove values; these prove the PLANS stay
scale-shaped: filters and projections reach the parquet scan, bucketed
candidate joins stay equi-joins (never cartesian), small sides
broadcast. A refactor that silently degrades a join strategy fails
here, not at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trackintel_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tpch_q1_scan_prunes_and_pushes(spark):
    li = load_table(spark, SF, "lineitem")
    q = (
        li.filter(F.col("l_shipdate") <= F.lit("2024-06-01").cast("timestamp"))
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan reads only the 3 referenced columns
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_returnflag" in rs and "l_quantity" in rs and "l_extendedprice" not in rs


def test_minhash_lsh_join_is_equi_not_cartesian(spark):
    from trackintel_spark.scale import minhash_lsh_candidates

    docs = load_table(spark, SF, "documents")
    plan = _plan(minhash_lsh_candidates(docs, num_perm=16, bands=8))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_lsh_topk_bucket_join_broadcasts_queries(spark):
    from trackintel_spark.scale import lsh_bucketed_topk

    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 4).select(F.col("vec_id").alias("query_id"), "embedding")
    plan = _plan(lsh_bucketed_topk(emb, q, k=3, n_planes=6, dim=64))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dedup_embedding_banded_join_is_equi(spark):
    from trackintel_spark.scale import dedup_embedding_cosine

    emb = load_table(spark, SF, "embeddings")
    plan = _plan(dedup_embedding_cosine(emb, threshold=0.9))
    assert "CartesianProduct" not in plan


def test_spatial_filter_broadcasts_areas(spark):
    from trackintel_spark.geogr import spatial_filter

    pts = spark.createDataFrame([(0, 8.5, 47.4)], "id long, lon double, lat double").select(
        "id", F.struct("lon", "lat").alias("geom")
    )
    areas = spark.createDataFrame(
        [(0, [(8.0, 47.0), (9.0, 47.0), (9.0, 48.0), (8.0, 48.0)])],
        "area_id long, polygon array<struct<lon double, lat double>>",
    )
    plan = _plan(spatial_filter(pts, areas, method="within"))
    assert "Broadcast" in plan


def test_tripleg_windows_share_one_user_exchange(spark):
    """Consecutive per-user windows must reuse a single hash exchange on
    user_id, not re-shuffle per window."""
    from trackintel_spark.operators import generate_triplegs

    ev = load_table(spark, SF, "events")
    pfs = ev.select(
        F.col("event_id").alias("id"), "user_id", F.col("ts").alias("tracked_at"),
        F.struct(F.lit(8.5).alias("lon"), F.lit(47.4).alias("lat")).alias("geom"),
        F.lit(None).cast("long").alias("staypoint_id"),
    )
    _, tpls = generate_triplegs(pfs, gap_threshold=30)
    plan = _plan(tpls.select("id"))
    # every exchange on user_id collapses into at most two physical
    # exchanges (segmentation + id assignment); a regression that inserts
    # per-window shuffles shows up as more
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 4, plan[:2000]


def test_distance_matrix_band_prefilter_before_trig(spark):
    from trackintel_spark.geogr import calculate_distance_matrix

    pts = spark.createDataFrame([(0, 8.5, 47.4), (1, 8.6, 47.5)], "id long, lon double, lat double").select(
        "id", F.struct("lon", "lat").alias("geom")
    )
    plan = _plan(calculate_distance_matrix(pts, dist_threshold=1000.0))
    # the cheap band predicate must sit in the join condition (evaluated
    # during the pair enumeration), not in a filter after materializing
    # all pairs
    join_lines = [l for l in plan.splitlines() if "Join" in l or "CartesianProduct" in l]
    assert any("abs(" in l for l in join_lines), join_lines


def test_locations_grid_has_no_data_sized_global_window(spark):
    """Grid-cell labeling must rank via the range-partitioned two-phase
    scheme: the only SinglePartition exchange allowed is the per-range
    offset table (one row per partition), never the cell table itself."""
    from trackintel_spark.operators.locations import generate_locations_grid

    ev = load_table(spark, SF, "events")
    sp = ev.select(
        F.col("event_id").alias("id"), "user_id",
        F.col("ts").alias("started_at"),
        (F.col("ts") + F.expr("interval 10 minutes")).alias("finished_at"),
        F.struct((8.5 + F.col("value") % 10 * 0.001).alias("lon"),
                 (47.4 + F.col("value") % 7 * 0.001).alias("lat")).alias("geom"),
    )
    sp_out, _ = generate_locations_grid(sp, cell_size_m=100)
    plan = _plan(sp_out.select("id", "location_id"))
    # a global Window over the distinct cells would show as a Window node
    # fed by Exchange SinglePartition over the cell scan; the two-phase
    # scheme feeds windows from hashpartitioning(__p) instead
    for i, line in enumerate(plan.splitlines()):
        if "Window" in line and "windowspecdefinition" in line.lower():
            ctx = "\n".join(plan.splitlines()[i : i + 6])
            assert "SinglePartition" not in ctx or "count(1)" in ctx, ctx
    assert "rangepartitioning" in plan.replace(" ", "").lower(), plan[:1500]
