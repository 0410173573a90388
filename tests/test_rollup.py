"""grid_rollup: every level equals a direct groupBy at that cell size.

The rollup identity (parent = union of 4 children; counts and
coordinate sums associative) is the whole operator — pin it per level
against an independent single-level aggregation, including negative
coordinates (floor semantics via arithmetic shift) and points sitting
exactly on cell boundaries.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from trackintel_spark.analysis import grid_rollup

BASE = 0.01


def _pts(spark, seed=0, n=400):
    rng = random.Random(seed)
    rows = [
        (i % 7, rng.uniform(-0.3, 0.3), rng.uniform(-0.2, 0.2)) for i in range(n)
    ]
    rows += [(1, 0.02, 0.01), (2, -0.02, -0.01), (3, 0.0, 0.0)]  # exact boundaries
    return spark.createDataFrame(rows, "user_id long, lon double, lat double")


def _direct(df, cell):
    return {
        (r.cy, r.cx): (r.n, r.clon, r.clat, r.users)
        for r in df.groupBy(
            F.floor(F.col("lat") / cell).cast("long").alias("cy"),
            F.floor(F.col("lon") / cell).cast("long").alias("cx"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("lon").alias("clon"),
            F.avg("lat").alias("clat"),
            F.countDistinct("user_id").alias("users"),
        )
        .collect()
    }


def test_rollup_levels_match_direct_aggregation(spark):
    pts = _pts(spark)
    out = grid_rollup(pts, levels=4, base_cell_deg=BASE, user_col="user_id").collect()
    by_level = {}
    for r in out:
        by_level.setdefault(r.level, {})[(r.cy, r.cx)] = r
    assert set(by_level) == {0, 1, 2, 3}
    for lvl in range(4):
        cell = BASE * (2 ** lvl)
        want = _direct(pts, cell)
        got = by_level[lvl]
        assert set(got) == set(want)
        for k, r in got.items():
            n, clon, clat, users = want[k]
            assert r.n == n
            assert r.centroid_lon == pytest.approx(clon, abs=1e-12)
            assert r.centroid_lat == pytest.approx(clat, abs=1e-12)
            # HLL is exact at these tiny cardinalities (<= 7 users)
            assert round(r.users_est) == users
            assert r.cell_deg == pytest.approx(cell)
    # coarser level never has more cells, total n preserved per level
    sizes = [len(by_level[l]) for l in range(4)]
    assert sizes == sorted(sizes, reverse=True)
    for lvl in range(4):
        assert sum(r.n for r in by_level[lvl].values()) == pts.count()


def test_rollup_without_users_and_validation(spark):
    pts = _pts(spark, seed=1, n=50)
    out = grid_rollup(pts, levels=2, base_cell_deg=BASE)
    assert "users_est" not in out.columns
    assert out.filter("level = 1").count() > 0
    with pytest.raises(ValueError):
        grid_rollup(pts, levels=0)
    with pytest.raises(ValueError):
        grid_rollup(pts, base_cell_deg=0.0)


def test_rollup_scans_and_shuffles_points_once(spark):
    """100 TB property: every level is materialized once (eager
    localCheckpoint), so the returned union recomputes NOTHING — no
    exchange at all in the final plan, one cached-level scan per level.
    Without the materialization each union branch re-derived from the
    raw points (the point scan ran once PER level), which is the
    L-scans plan this operator exists to avoid."""
    pts = _pts(spark)
    levels = 4
    plan = (
        grid_rollup(pts, levels=levels, base_cell_deg=BASE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert plan.count("Scan ExistingRDD") == levels, plan


def _events(spark, seed=3, n=500):
    """Timestamps spanning several month boundaries, incl. weeks that
    straddle months (the lattice trap: month is NOT derivable from
    week)."""
    rng = random.Random(seed)
    base = 1704067200  # 2024-01-01 00:00 UTC
    rows = [
        (i % 5, base + rng.randrange(0, 90 * 86400)) for i in range(n)
    ]
    return spark.createDataFrame(rows, "user_id long, sec long").select(
        "user_id", F.timestamp_seconds("sec").alias("tracked_at")
    )


def test_time_rollup_matches_direct_per_unit(spark):
    from trackintel_spark.analysis import time_rollup

    ev = _events(spark)
    out = time_rollup(ev, user_col="user_id").collect()
    by_unit = {}
    for r in out:
        by_unit.setdefault(r.unit, {})[r.bucket] = r
    assert set(by_unit) == {"hour", "day", "week", "month"}
    for unit in by_unit:
        want = {
            r.bucket: (r.n, r.users)
            for r in ev.groupBy(F.date_trunc(unit, "tracked_at").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("user_id").alias("users"))
            .collect()
        }
        got = by_unit[unit]
        assert set(got) == set(want), unit
        for b, r in got.items():
            assert r.n == want[b][0]
            assert round(r.users_est) == want[b][1]  # exact at <=5 users
    # the month totals must cover ALL events (the week->month shortcut
    # would drop/misplace rows whose week starts in the prior month)
    assert sum(r.n for r in by_unit["month"].values()) == ev.count()


def test_time_rollup_week_month_incomparable_and_validation(spark):
    from trackintel_spark.analysis import time_rollup

    ev = _events(spark, seed=4, n=200)
    # week+month WITHOUT day/hour: month must fall back to raw events
    out = time_rollup(ev, units=("week", "month")).collect()
    months = {r.bucket: r.n for r in out if r.unit == "month"}
    want = {
        r.bucket: r.n
        for r in ev.groupBy(F.date_trunc("month", "tracked_at").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert months == want
    with pytest.raises(ValueError):
        time_rollup(ev, units=("day", "hour"))  # not coarsening
    with pytest.raises(ValueError):
        time_rollup(ev, units=("hour", "hour"))
    with pytest.raises(ValueError):
        time_rollup(ev, units=("minute",))


def test_stream_merge_equals_batch_rollup_of_everything(spark, tmp_path):
    """The serving story (round-8 directive): historical tiles built by
    grid_rollup(emit_state=True), live fixes replayed through a REAL
    grid_counts_stream query, the emitted level-0 cell rows (with HLL
    sketch bytes) folded in via merge_grid_tiles — and the merged table
    equals grid_rollup over the full history. Users appearing in BOTH
    halves prove the sketch union does not double-count."""
    import os
    import time
    from datetime import datetime, timedelta

    from trackintel_spark.analysis import merge_grid_tiles
    from trackintel_spark.streaming import grid_counts_stream

    CELL, LEVELS = 0.01, 3
    t0 = datetime(2024, 1, 1)
    all_pts = _pts(spark, seed=5, n=300).collect()
    hist_rows, live_rows = all_pts[:200], all_pts[200:]  # users overlap (i % 7)
    hist = spark.createDataFrame(hist_rows, "user_id long, lon double, lat double")

    tiles = grid_rollup(
        hist, levels=LEVELS, base_cell_deg=CELL, user_col="user_id", emit_state=True
    )

    # replay the live half as a file stream, two arrival chunks
    schema = "user_id long, lon double, lat double, tracked_at timestamp"
    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src, exist_ok=True)
    for i, chunk in enumerate([live_rows[:50], live_rows[50:]]):
        d = os.path.join(src, f"f{i}")
        spark.createDataFrame(
            [(r.user_id, r.lon, r.lat, t0 + timedelta(minutes=i)) for r in chunk], schema
        ).coalesce(1).write.mode("overwrite").parquet(d)
        now = time.time() + i
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (now, now))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        grid_counts_stream(stream, cell_deg=CELL, window="1 hour",
                           watermark="0 seconds", user_col="user_id")
        .writeStream.format("memory").queryName("tile_updates")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    updates = spark.sql(
        # sum windows away; sketches union across windows
        """SELECT cy, cx, SUM(n) AS n, SUM(sum_lon) AS sum_lon, SUM(sum_lat) AS sum_lat,
                  hll_union_agg(users_sketch) AS users_sketch
           FROM tile_updates GROUP BY cy, cx"""
    )

    merged = merge_grid_tiles(tiles, updates, levels=LEVELS, base_cell_deg=CELL)
    full = spark.createDataFrame(all_pts, "user_id long, lon double, lat double")
    want = grid_rollup(full, levels=LEVELS, base_cell_deg=CELL, user_col="user_id")

    got = {(r.level, r.cy, r.cx): r for r in merged.collect()}
    exp = {(r.level, r.cy, r.cx): r for r in want.collect()}
    assert set(got) == set(exp)
    for k, e in exp.items():
        g = got[k]
        assert g.n == e.n, k
        assert g.centroid_lon == pytest.approx(e.centroid_lon, abs=1e-9)
        assert g.centroid_lat == pytest.approx(e.centroid_lat, abs=1e-9)
        # HLL is exact at these cardinalities (<= 7 users): union of
        # history+stream sketches == single-pass sketch estimate
        assert round(g.users_est) == round(e.users_est), k
    # non-vacuous double-count exposure: some merged cell saw the same
    # user in both halves yet estimates exactly the distinct count
    hist_cells = {(0, r.cy, r.cx) for r in tiles.collect()}
    upd_cells = {(0, r.cy, r.cx) for r in updates.select("cy", "cx").collect()}
    assert hist_cells & upd_cells, "fixture: no cell saw both history and stream rows"
    # merged output is closed under composition: schema carries state
    assert {"sum_lon", "sum_lat", "users_sketch"} <= set(merged.columns)


def test_time_bucket_merge_equals_rollup_of_everything(spark):
    """Temporal serving symmetry: hourly deltas fold into a
    time_rollup(emit_state=True) history — counts add, sketches union,
    week/month lifted straight from the finest unit (lattice-safe) —
    and the merged table equals time_rollup over the full history."""
    from trackintel_spark.analysis import merge_time_buckets, time_rollup

    ev = _events(spark, seed=9, n=600).collect()
    hist = spark.createDataFrame(ev[:400], "user_id long, tracked_at timestamp")
    live = spark.createDataFrame(ev[400:], "user_id long, tracked_at timestamp")

    rollup = time_rollup(hist, user_col="user_id", emit_state=True)
    updates = (
        live.groupBy(F.date_trunc("hour", "tracked_at").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.hll_sketch_agg("user_id").alias("users_sketch"))
    )
    merged = merge_time_buckets(rollup, updates)
    full = spark.createDataFrame(ev, "user_id long, tracked_at timestamp")
    want = {
        (r.unit, r.bucket): (r.n, round(r.users_est))
        for r in time_rollup(full, user_col="user_id").collect()
    }
    got = {(r.unit, r.bucket): (r.n, round(r.users_est)) for r in merged.collect()}
    assert got == want
    # users overlapping the split must have been union-merged somewhere
    hist_buckets = {(r.unit, r.bucket) for r in rollup.collect()}
    upd_hours = {("hour", r.bucket) for r in updates.select("bucket").collect()}
    assert hist_buckets & upd_hours, "fixture: no bucket saw both halves"
    # validation
    import pytest as _pytest

    with _pytest.raises(ValueError):
        merge_time_buckets(rollup, updates.drop("users_sketch"))
    with _pytest.raises(ValueError):
        merge_time_buckets(rollup, updates, units=("hour", "decade"))
