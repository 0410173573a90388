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


def test_persisted_lineage_counts_zero_redundant(spark):
    """A persisted frame's duplicated lineage is NOT redundant I/O:
    cache substitution replaces it with an InMemoryRelation leaf whose
    re-scan is a warm block read, so the metric must not charge it (and
    must not trigger a localCheckpoint that only duplicates the cache
    while dropping recompute lineage)."""
    df = _chained(spark)
    red_cold, _ = redundant_scan_bytes(df)
    assert red_cold > 0
    base = spark.range(200_000).select("id", (F.col("id") % 97).alias("k")).persist()
    try:
        out = base
        for _ in range(6):
            out = out.unionByName(base)
        red_cached, n_cached = redundant_scan_bytes(out)
        assert red_cached == 0 and n_cached == 7
        old = spark.conf.get(MIN_REDUNDANT_BYTES_CONF, None)
        try:
            spark.conf.set(MIN_REDUNDANT_BYTES_CONF, "1")
            # even a 1-byte threshold leaves cached lineage untouched
            assert truncate_if_rescan_heavy(out) is out
        finally:
            if old is None:
                spark.conf.unset(MIN_REDUNDANT_BYTES_CONF)
            else:
                spark.conf.set(MIN_REDUNDANT_BYTES_CONF, old)
    finally:
        base.unpersist()


def test_generate_trips_cached_lineage_stays_lazy(spark):
    """End-to-end: the generate-operator chain's inputs are cache-backed
    (the ids.py dense-id persists), so the boundary sees zero redundant
    COLD bytes and stays lazy even with a 1-byte threshold — measured
    cheaper than re-materializing the already-cached lineage (SCALE.md
    r11 A/B). Results are identical either way."""
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
        _, _, trips_tiny = generate_trips(sp, tpls, gap_threshold=120)
        spark.conf.set(MIN_REDUNDANT_BYTES_CONF, str(1 << 40))
        _, _, trips_lazy = generate_trips(sp, tpls, gap_threshold=120)
    finally:
        if old is None:
            spark.conf.unset(MIN_REDUNDANT_BYTES_CONF)
        else:
            spark.conf.set(MIN_REDUNDANT_BYTES_CONF, old)

    # cached lineage exempts the chain from truncation at any threshold
    assert _leaves(trips_tiny) == _leaves(trips_lazy)
    assert redundant_scan_bytes(trips_lazy)[0] == 0
    a = sorted(map(tuple, trips_tiny.select("user_id", "started_at").collect()))
    b = sorted(map(tuple, trips_lazy.select("user_id", "started_at").collect()))
    assert a == b


def test_reliable_checkpoint_routing(spark, tmp_path):
    """r12 (r11 verdict #6): with spark.trackintel.checkpoint.reliable=
    true and a checkpoint dir configured, truncation routes through
    DataFrame.checkpoint (partitions in the reliable dir survive
    executor loss) and truncates IDENTICALLY to the local path; without
    a dir it raises instead of silently falling back to the
    non-fault-tolerant localCheckpoint."""
    import os

    import pytest

    from trackintel_spark.plans.checkpoint import RELIABLE_CONF

    df = _chained(spark)
    old = spark.conf.get(MIN_REDUNDANT_BYTES_CONF, None)
    sc = spark.sparkContext
    try:
        spark.conf.set(MIN_REDUNDANT_BYTES_CONF, "1024")
        spark.conf.set(RELIABLE_CONF, "true")
        if not sc._jsc.sc().getCheckpointDir().isEmpty():
            pytest.skip("session already has a checkpoint dir")
        with pytest.raises(ValueError, match="no checkpoint directory"):
            truncate_if_rescan_heavy(df)
        ckdir = str(tmp_path / "reliable_ck")
        sc.setCheckpointDir(ckdir)
        cut = truncate_if_rescan_heavy(df)
        assert _leaves(cut) == 1
        assert cut.count() == df.count()
        assert cut.agg(F.sum("id")).first()[0] == df.agg(F.sum("id")).first()[0]
        # the materialized partitions actually live in the reliable dir
        found = [f for root, _d, fs in os.walk(ckdir) for f in fs]
        assert found, "no files written to the reliable checkpoint dir"
    finally:
        spark.conf.unset(RELIABLE_CONF)
        if old is None:
            spark.conf.unset(MIN_REDUNDANT_BYTES_CONF)
        else:
            spark.conf.set(MIN_REDUNDANT_BYTES_CONF, old)


def test_plan_complexity_trigger_fires_on_leaf_fanout(spark):
    """r13: an input whose analyzed plan already references more leaves
    than maxLeafOccurrences gets truncated even when its redundant
    BYTES are tiny (or zero, e.g. fully persisted lineage) — plan
    analysis cost is per-submission and scale-independent."""
    from trackintel_spark.plans.checkpoint import MAX_LEAF_OCCURRENCES_CONF

    tiny = _chained(spark, n=100, copies=80)  # 81 leaves, ~nothing in bytes
    old = spark.conf.get(MAX_LEAF_OCCURRENCES_CONF, None)
    try:
        # default (64): 81 > 64 -> truncates despite zero-ish bytes
        cut = truncate_if_rescan_heavy(tiny)
        assert _leaves(cut) == 1
        assert cut.count() == tiny.count()
        # raising the knob past the fan-out leaves the frame untouched
        spark.conf.set(MAX_LEAF_OCCURRENCES_CONF, "100")
        assert _leaves(truncate_if_rescan_heavy(tiny)) == 81
        # <= 0 disables only this trigger
        spark.conf.set(MAX_LEAF_OCCURRENCES_CONF, "0")
        assert _leaves(truncate_if_rescan_heavy(tiny)) == 81
    finally:
        if old is None:
            spark.conf.unset(MAX_LEAF_OCCURRENCES_CONF)
        else:
            spark.conf.set(MAX_LEAF_OCCURRENCES_CONF, old)
