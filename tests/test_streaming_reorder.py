"""Bounded-disorder reorder buffer: stream == batch under random
within-bound arrival jitter, raise past the bound, drop mode.

Disorder model: each event's ARRIVAL position is its event time plus
an independent uniform jitter in [0, D); arrivals are sorted by that
key and chopped into micro-batches. For any event e and any
earlier-arriving e' (same user), t' <= t'+j' <= t_e + j_e < t_e + D,
so the per-user high-water mark never exceeds t_e + D when e arrives
— exactly the contract ``max_disorder=D`` tolerates.

Flush mechanics on a finite stream: the reorder buffer only releases
an event once the user's high-water mark is D past it, so each test
appends two trailing "flush" events per user — the first closes the
last real entity (gap semantics), the second pushes the frontier past
the first. Both are inert in the batch ground truth (a lone trailing
fix/trip closes nothing), so stream and batch stay comparable on the
same full row set.
"""

from __future__ import annotations

import os
import random
import time

import pytest
from pyspark.sql import functions as F

from trackintel_spark.operators import generate_staypoints
from trackintel_spark.streaming import staypoints_stream_exact, tours_stream_exact

BASE = 1700000000
HOUR = 3600

SP_PARAMS = dict(dist_threshold=150, time_threshold=5, gap_threshold=60)
SP_DISORDER_MIN = 6.0  # minutes
SP_D = SP_DISORDER_MIN * 60


def _mk_pfs_rows(n_users: int = 3, per_user: int = 80):
    rows = []
    i = 0
    t_max = 0
    for u in range(n_users):
        t = 0
        for k in range(per_user):
            spot = (k // 10) % 3
            lon = 8.5 + spot * 0.01 + (k % 10) * 1e-6 + u * 1e-7
            lat = 47.4 + spot * 0.005
            if k % 37 == 36:
                t += 90 * 60
            rows.append((i, u, t, lon, lat))
            i += 1
            t += 120
        t_max = max(t_max, t)
    # two flush fixes per user: first closes the final staypoint via the
    # gap rule, second pushes the reorder frontier past the first. They
    # must be further apart than gap_threshold — otherwise they form a
    # dwell of their own in the batch run, which the stream can never
    # close (the second fix stays inside the reorder buffer).
    f1 = t_max + 2 * HOUR + int(SP_D)
    f2 = f1 + 90 * 60
    for u in range(n_users):
        rows.append((i, u, f1, 9.9, 49.9)); i += 1
        rows.append((i, u, f2, 9.91, 49.91)); i += 1
    return rows


def _pfs_df(spark, rows):
    return spark.createDataFrame(
        rows, "id long, user_id long, sec long, lon double, lat double"
    ).select(
        "id", "user_id",
        F.timestamp_seconds(F.col("sec") + BASE).alias("tracked_at"), "lon", "lat",
    )


def _jittered_chunks(rows, disorder_s, n_chunks, seed, t_index=2):
    rng = random.Random(seed)
    arr = sorted(rows, key=lambda r: r[t_index] + rng.uniform(0, disorder_s * 0.98))
    step = (len(arr) + n_chunks - 1) // n_chunks
    return [arr[i : i + step] for i in range(0, len(arr), step)]


def _write_stream_files(spark, tmp_path, chunks, to_df, sub="src"):
    src = os.path.join(str(tmp_path), sub)
    os.makedirs(src, exist_ok=True)
    for i, chunk in enumerate(chunks):
        to_df(spark, chunk).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, f"f{i}")
        )
        now = time.time() + i
        d = os.path.join(src, f"f{i}")
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (now, now))
    return src


def _run_sp_stream(spark, src, name, **kw):
    schema = "id long, user_id long, tracked_at timestamp, lon double, lat double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = staypoints_stream_exact(stream, **SP_PARAMS, **kw)
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    return {
        (r.user_id, r.started_at, r.finished_at, round(r.lon, 9), round(r.lat, 9))
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def _sp_batch_expected(spark, rows):
    pfs = _pfs_df(spark, rows).select(
        "id", "user_id", "tracked_at", F.struct("lon", "lat").alias("geom")
    )
    _, sp = generate_staypoints(pfs, **SP_PARAMS)
    return {
        (r.user_id, r.started_at, r.finished_at, round(r.geom.lon, 9), round(r.geom.lat, 9))
        for r in sp.collect()
    }


def test_staypoints_stream_reorder_matches_batch(spark, tmp_path):
    rows = _mk_pfs_rows()
    exp = _sp_batch_expected(spark, rows)
    assert len(exp) >= 10  # non-vacuous
    chunks = _jittered_chunks(rows, SP_D, n_chunks=6, seed=7)
    # sanity: the jitter genuinely breaks cross-batch order (the strict
    # contract would reject this arrival sequence)
    flat = [r for c in chunks for r in c]
    assert any(flat[i][2] > flat[i + 1][2] for i in range(len(flat) - 1))
    src = _write_stream_files(spark, tmp_path, chunks, _pfs_df)
    got = _run_sp_stream(spark, src, "sp_reorder_ok", max_disorder=SP_DISORDER_MIN)
    assert got == exp


def test_staypoints_stream_reorder_drop_mode(spark, tmp_path):
    """One fix far beyond the bound: late='drop' completes and equals
    the batch run on the remaining rows."""
    rows = _mk_pfs_rows(n_users=1, per_user=60)
    # a fix 3 disorder-windows behind the user's frontier, arriving last
    late_row = (999999, 0, 30 * 60, 8.5, 47.4)
    chunks = [rows, [late_row]]
    src = _write_stream_files(spark, tmp_path, chunks, _pfs_df, sub="src_drop")
    got = _run_sp_stream(spark, src, "sp_reorder_drop", max_disorder=SP_DISORDER_MIN, late="drop")
    assert got == _sp_batch_expected(spark, rows)


def test_staypoints_stream_reorder_raises_past_bound(spark, tmp_path):
    rows = _mk_pfs_rows(n_users=1, per_user=60)
    late_row = (999999, 0, 30 * 60, 8.5, 47.4)
    chunks = [rows, [late_row]]
    src = _write_stream_files(spark, tmp_path, chunks, _pfs_df, sub="src_raise")
    with pytest.raises(Exception, match="disorder"):
        _run_sp_stream(spark, src, "sp_reorder_raise", max_disorder=SP_DISORDER_MIN)


def test_batch_path_ignores_reorder(spark):
    """On a batch frame the buffer is vacuous: max_disorder > 0 must
    return the identical result (full history, kernel sorts itself)."""
    rows = _mk_pfs_rows(n_users=2, per_user=50)
    pfs = _pfs_df(spark, rows)
    a = {tuple(r) for r in staypoints_stream_exact(pfs, **SP_PARAMS).collect()}
    b = {tuple(r) for r in staypoints_stream_exact(pfs, **SP_PARAMS, max_disorder=10).collect()}
    assert a == b and len(a) >= 5


# ---------------------------------------------------------------------------
# tours: the operator that previously RAISED on any cross-batch disorder
# ---------------------------------------------------------------------------

TOUR_DISORDER_MIN = 90.0  # minutes
TOUR_D = TOUR_DISORDER_MIN * 60


def _mk_trip_rows(n_users: int = 2):
    rows = []  # (id, user_id, start_s, end_s, o_sp, d_sp, o_loc, d_loc)
    tid = 0
    t_max = 0
    for u in range(n_users):
        t = u * 100

        def trip(o_loc, d_loc, dur_h=1, gap_h=1):
            nonlocal t, tid
            sp = lambda k: (u * 1000 + k) if k is not None else None
            rows.append((tid, u, t, t + dur_h * HOUR, sp(o_loc), sp(d_loc), o_loc, d_loc))
            tid += 1
            t += (dur_h + gap_h) * HOUR

        trip(0, 1); trip(1, 2); trip(2, 0)   # 3-trip tour
        trip(0, 3); trip(3, 0)               # 2-trip tour
        trip(0, 4); trip(4, 0)               # another 2-trip tour
        t_max = max(t_max, t)
    # flush trips: unique locations, close nothing, released last
    f1 = t_max + int(TOUR_D) + HOUR
    f2 = f1 + int(TOUR_D) + HOUR
    for u in range(n_users):
        rows.append((10_000 + u, u, f1, f1 + HOUR, None, None, 98, None))
        rows.append((20_000 + u, u, f2, f2 + HOUR, None, None, 99, None))
    return rows


def _trips_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "id long, user_id long, start_s long, end_s long, "
        "origin_staypoint_id long, destination_staypoint_id long, "
        "origin_loc long, dest_loc long",
    ).select(
        "id", "user_id",
        F.timestamp_seconds(F.col("start_s") + BASE).alias("started_at"),
        F.timestamp_seconds(F.col("end_s") + BASE).alias("finished_at"),
        "origin_staypoint_id", "destination_staypoint_id",
        "origin_loc", "dest_loc",
    )


def _tour_norm(rows):
    return {
        (r.user_id, r.seq, int(r.started_at.timestamp()) - BASE, tuple(r.trips))
        for r in rows
    }


def test_tours_stream_reorder_matches_batch(spark, tmp_path):
    rows = _mk_trip_rows()
    exp = _tour_norm(tours_stream_exact(_trips_df(spark, rows)).collect())
    assert len(exp) == 6  # 3 tours x 2 users
    chunks = _jittered_chunks(rows, TOUR_D, n_chunks=5, seed=13)
    flat = [r for c in chunks for r in c]
    assert any(flat[i][2] > flat[i + 1][2] for i in range(len(flat) - 1))
    src = _write_stream_files(spark, tmp_path, chunks, _trips_df, sub="src_tours")
    schema = (
        "id long, user_id long, started_at timestamp, finished_at timestamp, "
        "origin_staypoint_id long, destination_staypoint_id long, "
        "origin_loc long, dest_loc long"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = tours_stream_exact(stream, max_disorder=TOUR_DISORDER_MIN)
    q = (
        out.writeStream.format("memory").queryName("tours_reorder")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = _tour_norm(spark.sql("SELECT * FROM tours_reorder").collect())
    assert got == exp
