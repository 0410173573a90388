"""grid_counts_stream: watermarked per-cell windows — batch == stream
on closed history, late-beyond-watermark fixes drop, closed windows
emit exactly once, and emitted level-0 rows roll up to grid_rollup's
coarser totals by the sum identity."""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from trackintel_spark.streaming import grid_counts_stream

T0 = datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = "id long, user_id long, tracked_at timestamp, lon double, lat double"
CELL = 0.01


def _pfs_df(spark, rows):
    """(id, user, minute, lon, lat)"""
    return spark.createDataFrame(
        [(i, u, T0 + timedelta(minutes=m), lo, la) for i, u, m, lo, la in rows], SCHEMA
    )


def _mk_rows():
    rows, i = [], 0
    # hour 0: two cells; hour 1: one cell revisited, plus a negative-coord cell
    for m, lo, la in [(5, 8.5001, 47.4001), (10, 8.5002, 47.4002), (20, 8.5201, 47.4001),
                      (50, 8.5001, 47.4003), (70, 8.5001, 47.4001), (80, -0.005, -0.005)]:
        rows.append((i, i % 3, m, lo, la))
        i += 1
    return rows


def _norm(rows):
    return {
        (r.window_start, r.cy, r.cx, r.n, round(r.sum_lon, 9), round(r.sum_lat, 9))
        for r in rows
    }


def test_batch_matches_manual_cells(spark):
    out = grid_counts_stream(
        _pfs_df(spark, _mk_rows()), cell_deg=CELL, user_col="user_id"
    ).collect()
    got = {(r.window_start, r.cy, r.cx): (r.n, r.approx_users) for r in out}
    h0, h1 = T0, T0 + timedelta(hours=1)
    assert got[(h0, 4740, 850)][0] == 3  # three fixes, hour 0, main cell
    assert got[(h0, 4740, 852)][0] == 1
    assert got[(h1, 4740, 850)][0] == 1
    assert got[(h1, -1, -1)][0] == 1  # negative coords floor correctly
    assert got[(h0, 4740, 850)][1] == 2  # users {0, 1} (exact at tiny n)


def test_stream_matches_batch_and_drops_late(spark, tmp_path):
    rows = _mk_rows()
    flush1 = (100, 0, 300, 9.0, 48.0)   # advances the watermark past hour 1
    flush2 = (101, 0, 400, 9.0, 48.0)
    late = (102, 0, 10, 8.5001, 47.4001)  # hour-0 fix arriving after eviction

    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src, exist_ok=True)
    for i, chunk in enumerate([rows, [flush1], [flush2], [late]]):
        d = os.path.join(src, f"f{i}")
        _pfs_df(spark, chunk).coalesce(1).write.mode("overwrite").parquet(d)
        now = time.time() + i
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (now, now))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        grid_counts_stream(stream, cell_deg=CELL, window="1 hour",
                           watermark="2 hours", user_col="user_id")
        .writeStream.format("memory").queryName("heatmap_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM heatmap_stream").collect()
    # closed windows == batch on the ON-TIME rows only; each emitted once
    want = grid_counts_stream(_pfs_df(spark, rows), cell_deg=CELL).collect()
    closed = {k for k in _norm(got)}
    expected_closed = {k for k in _norm(want)}
    assert expected_closed <= closed  # flush rows add their own windows
    assert len(got) == len({(r.window_start, r.cy, r.cx) for r in got})
    # the late fix changed nothing: its cell's hour-0 count stayed 3
    h0_main = [r for r in got if r.window_start == T0 and r.cy == 4740 and r.cx == 850]
    assert len(h0_main) == 1 and h0_main[0].n == 3
    # the sketch column is real mergeable bytes, estimable at the sink
    assert h0_main[0].approx_users == 2 and len(h0_main[0].users_sketch) > 0


def test_level0_rows_roll_up_to_batch_rollup(spark):
    """Composition: summing the streamed level-0 cells into parent
    cells reproduces grid_rollup's level-1 counts and sums exactly."""
    from trackintel_spark.analysis import grid_rollup

    pfs = _pfs_df(spark, _mk_rows())
    lvl0 = grid_counts_stream(pfs, cell_deg=CELL)
    parents = {
        (r.cy, r.cx): (r.n, round(r.slon, 9), round(r.slat, 9))
        for r in lvl0.groupBy(
            F.shiftright("cy", 1).alias("cy"), F.shiftright("cx", 1).alias("cx")
        )
        .agg(F.sum("n").alias("n"), F.sum("sum_lon").alias("slon"), F.sum("sum_lat").alias("slat"))
        .collect()
    }
    want = {
        (r.cy, r.cx): (r.n, round(r.centroid_lon * r.n, 9), round(r.centroid_lat * r.n, 9))
        for r in grid_rollup(pfs, levels=2, base_cell_deg=CELL).collect()
        if r.level == 1
    }
    assert parents == want

    # and USER sketches roll up too: unioning child sketches equals the
    # direct distinct count (exact at these tiny cardinalities) — the
    # whole reason the stream emits sketch bytes, not just estimates
    lvl0u = grid_counts_stream(pfs, cell_deg=CELL, user_col="user_id")
    got_users = {
        (r.cy, r.cx): r.u
        for r in lvl0u.groupBy(
            F.shiftright("cy", 1).alias("cy"), F.shiftright("cx", 1).alias("cx")
        )
        .agg(F.hll_sketch_estimate(F.hll_union_agg("users_sketch")).alias("u"))
        .collect()
    }
    want_users = {
        (r.cy, r.cx): r.u
        for r in grid_rollup(pfs, levels=2, base_cell_deg=CELL, user_col="user_id")
        .filter("level = 1")
        .select("cy", "cx", F.round("users_est").cast("long").alias("u"))
        .collect()
    }
    assert got_users == want_users


def test_validation(spark):
    import pytest

    with pytest.raises(ValueError):
        grid_counts_stream(_pfs_df(spark, _mk_rows()), cell_deg=0.0)
