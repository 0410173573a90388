"""Size-aware lineage truncation (plans/checkpoint.py)."""

import pytest
from pyspark.sql import functions as F

from trackintel_spark.plans import redundant_scan_bytes, truncate_if_rescan_heavy
from trackintel_spark.plans.checkpoint import MIN_REDUNDANT_BYTES_CONF


def _leaves(df) -> int:
    return df._jdf.queryExecution().analyzed().collectLeaves().size()


def _chained(spark, n=200_000, copies=6):
    base = spark.range(n).select("id", (F.col("id") % 97).alias("k"))
    out = base
    for _ in range(copies):
        out = out.unionByName(base)
    return out


def test_redundant_bytes_counts_duplicated_leaves_only(spark):
    red7, n7 = redundant_scan_bytes(_chained(spark, copies=6))
    red1, n1 = redundant_scan_bytes(_chained(spark, copies=0))
    assert (n7, n1) == (7, 1)
    # a single leaf has no duplication; 7 identical leaves have 6x the
    # single leaf's bytes of redundancy
    assert red1 == 0 and red7 > 0 and red7 % 6 == 0


def test_truncation_is_threshold_and_conf_gated(spark):
    df = _chained(spark)
    old = spark.conf.get(MIN_REDUNDANT_BYTES_CONF, None)
    try:
        # far above the duplicated bytes -> untouched (same plan object shape)
        spark.conf.set(MIN_REDUNDANT_BYTES_CONF, str(1 << 40))
        assert _leaves(truncate_if_rescan_heavy(df)) == 7
        # below -> collapses to one checkpointed leaf, values preserved
        spark.conf.set(MIN_REDUNDANT_BYTES_CONF, "1024")
        cut = truncate_if_rescan_heavy(df)
        assert _leaves(cut) == 1
        assert cut.count() == df.count()
        assert cut.agg(F.sum("id")).first()[0] == df.agg(F.sum("id")).first()[0]
        # <= 0 disables truncation entirely
        spark.conf.set(MIN_REDUNDANT_BYTES_CONF, "0")
        assert _leaves(truncate_if_rescan_heavy(df)) == 7
    finally:
        if old is None:
            spark.conf.unset(MIN_REDUNDANT_BYTES_CONF)
        else:
            spark.conf.set(MIN_REDUNDANT_BYTES_CONF, old)


def test_generate_trips_resets_chain_growth_when_forced(spark):
    """End-to-end: with a tiny threshold the trips/tours boundary
    truncates and the downstream plan stops compounding; with the
    default it stays lazy at test scale (no checkpoint jobs)."""
    from trackintel_spark.analysis import create_activity_flag
    from trackintel_spark.operators import (
        generate_staypoints,
        generate_triplegs,
        generate_trips,
    )

    ev = spark.range(2_000).select(
        F.col("id").alias("id"),
        (F.col("id") % 5).alias("user_id"),
        F.timestamp_seconds(F.lit(1600000000) + F.col("id") * 600).alias("tracked_at"),
        F.struct(
            (8.5 + (F.col("id") % 7).cast("double") * 0.01).alias("lon"),
            (47.4 + (F.col("id") % 5).cast("double") * 0.01).alias("lat"),
        ).alias("geom"),
    )
    pfs_sp, sp = generate_staypoints(ev, dist_threshold=200, time_threshold=5, gap_threshold=1440)
    _, tpls = generate_triplegs(pfs_sp, gap_threshold=1440)
    sp = create_activity_flag(sp, time_threshold=20)

    old = spark.conf.get(MIN_REDUNDANT_BYTES_CONF, None)
    try:
        spark.conf.set(MIN_REDUNDANT_BYTES_CONF, "1")
        _, _, trips_cut = generate_trips(sp, tpls, gap_threshold=120)
        spark.conf.set(MIN_REDUNDANT_BYTES_CONF, str(1 << 40))
        _, _, trips_lazy = generate_trips(sp, tpls, gap_threshold=120)
    finally:
        if old is None:
            spark.conf.unset(MIN_REDUNDANT_BYTES_CONF)
        else:
            spark.conf.set(MIN_REDUNDANT_BYTES_CONF, old)

    assert _leaves(trips_cut) < _leaves(trips_lazy)
    a = sorted(map(tuple, trips_cut.select("user_id", "started_at").collect()))
    b = sorted(map(tuple, trips_lazy.select("user_id", "started_at").collect()))
    assert a == b  # truncation never changes results
