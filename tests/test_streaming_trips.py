"""trips_stream_exact: chunk-invariant streaming trip emission, pinned
against the BATCH generate_trips on the same closed history."""

from __future__ import annotations

import pytest

import os
import time

from pyspark.sql import functions as F

from trackintel_spark.streaming import trips_stream_exact

PARAMS = dict(dist_threshold=150, time_threshold=5, gap_threshold=60, activity_threshold=15)
BASE = 1700000000


def _mk_rows(n_users: int = 2, cycles: int = 6):
    """Dwell(long=activity) -> travel -> dwell(short) -> travel ->
    dwell(long) ... with an occasional big gap; ends on a LONG dwell +
    a trailing far fix so the final trip's destination closes."""
    rows = []
    i = 0
    for u in range(n_users):
        t = 0
        for c in range(cycles):
            long_dwell = c % 2 == 0
            spot = c % 3
            lon0, lat0 = 8.5 + spot * 0.02, 47.4 + spot * 0.01
            n_dwell = 20 if long_dwell else 7  # 19*60s > 15min  vs  6*60s < 15min
            for k in range(n_dwell):
                rows.append((i, u, t, lon0 + k * 1e-7, lat0)); i += 1; t += 60
            if c == 3:
                t += 2 * 3600 + 60  # gap > gap_threshold (60 min)
                for k in range(5):  # post-gap travel -> a NULL-origin trip
                    rows.append((i, u, t, lon0 + 0.004 * (k + 1), lat0)); i += 1; t += 60
                continue
            for k in range(5):  # travel: 5 fixes moving ~400m apart
                rows.append((i, u, t, lon0 + 0.004 * (k + 1), lat0)); i += 1; t += 60
        # closing evidence: one final long dwell then a far fix
        for k in range(20):
            rows.append((i, u, t, 8.9, 47.9)); i += 1; t += 60
        rows.append((i, u, t, 8.95, 47.95)); i += 1
    return rows


def _pfs_df(spark, rows):
    return spark.createDataFrame(
        rows, "id long, user_id long, sec long, lon double, lat double"
    ).select(
        "id", "user_id", F.timestamp_seconds(F.col("sec") + BASE).alias("tracked_at"),
        "lon", "lat",
    )


def _batch_expected(spark, rows):
    """Ground truth: the full batch chain (generate_staypoints ->
    create_activity_flag -> generate_triplegs -> generate_trips),
    keyed on timestamps; trips whose closing evidence lies beyond the
    input are excluded by construction of _mk_rows."""
    from trackintel_spark.analysis import create_activity_flag
    from trackintel_spark.operators import (
        generate_staypoints,
        generate_triplegs,
        generate_trips,
    )

    pfs = _pfs_df(spark, rows).select(
        "id", "user_id", "tracked_at", F.struct("lon", "lat").alias("geom")
    )
    pfs_sp, sp = generate_staypoints(
        pfs, dist_threshold=PARAMS["dist_threshold"],
        time_threshold=PARAMS["time_threshold"], gap_threshold=PARAMS["gap_threshold"],
    )
    _, tpls = generate_triplegs(pfs_sp, gap_threshold=PARAMS["gap_threshold"])
    sp = create_activity_flag(sp, time_threshold=PARAMS["activity_threshold"])
    sp_out, _, trips = generate_trips(
        sp, tpls, gap_threshold=PARAMS["gap_threshold"], add_geometry=False
    )
    sp_start = {r["id"]: r["started_at"] for r in sp_out.select("id", "started_at").collect()}
    out = set()
    for r in trips.collect():
        out.add(
            (
                r["user_id"],
                int(r["started_at"].timestamp()) - BASE,
                int(r["finished_at"].timestamp()) - BASE,
                (int(sp_start[r["origin_staypoint_id"]].timestamp()) - BASE)
                if r["origin_staypoint_id"] is not None else None,
                (int(sp_start[r["destination_staypoint_id"]].timestamp()) - BASE)
                if r["destination_staypoint_id"] is not None else None,
            )
        )
    return out


def _norm(rows):
    return {
        (
            r.user_id,
            int(r.started_at.timestamp()) - BASE,
            int(r.finished_at.timestamp()) - BASE,
            (int(r.origin_started_at.timestamp()) - BASE) if r.origin_started_at else None,
            (int(r.destination_started_at.timestamp()) - BASE)
            if r.destination_started_at else None,
        )
        for r in rows
    }


def _stream_result(spark, tmp_path, files, max_files=None):
    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src, exist_ok=True)
    for i, chunk in enumerate(files):
        _pfs_df(spark, chunk).coalesce(1).write.mode("overwrite").parquet(os.path.join(src, f"f{i}"))
        now = time.time() + i
        d = os.path.join(src, f"f{i}")
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (now, now))
    schema = "id long, user_id long, tracked_at timestamp, lon double, lat double"
    reader = spark.readStream.schema(schema)
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    stream = reader.option("recursiveFileLookup", "true").parquet(src)
    out = trips_stream_exact(stream, **PARAMS)
    name = f"trip_stream_{len(files)}_{max_files}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    return _norm(spark.sql(f"SELECT * FROM {name}").collect())


@pytest.mark.slow
def test_batch_fallback_matches_generate_trips(spark):
    rows = _mk_rows()
    got = _norm(trips_stream_exact(_pfs_df(spark, rows), **PARAMS).collect())
    exp = _batch_expected(spark, rows)
    assert got == exp
    assert len(got) >= 6  # non-vacuous: several trips per user
    # the gap produced at least one NULL-destination trip
    assert any(d is None for (_, _, _, _, d) in got)
    # and at least one NULL-origin trip follows the gap
    assert any(o is None for (_, _, _, o, _) in got)


def test_stream_single_pass_matches_batch(spark, tmp_path):
    rows = _mk_rows()
    assert _stream_result(spark, tmp_path, [rows]) == _batch_expected(spark, rows)


@pytest.mark.slow
def test_stream_state_spans_microbatches(spark, tmp_path):
    rows = _mk_rows()
    cut1, cut2 = len(rows) // 3 + 5, 2 * len(rows) // 3 + 11
    chunks = [rows[:cut1], rows[cut1:cut2], rows[cut2:]]
    got = _stream_result(spark, tmp_path, chunks, max_files=1)
    assert got == _batch_expected(spark, rows)


def test_open_trips_are_never_emitted(spark):
    """Input ending mid-travel: the final trip has no closing evidence
    and must stay unemitted."""
    rows = _mk_rows(n_users=1)
    # chop off the closing dwell + far fix (last 21 rows)
    rows = rows[:-21]
    got = _norm(trips_stream_exact(_pfs_df(spark, rows), **PARAMS).collect())
    full = _batch_expected(spark, rows)
    # every emitted trip is a batch trip; the batch's LAST trip (still
    # open in the stream sense) may be missing
    assert got.issubset(full)
    assert len(full) - len(got) <= 1
