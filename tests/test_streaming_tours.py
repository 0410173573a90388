"""tours_stream_exact: chunk-invariant streaming tour emission, pinned
against the BATCH generate_tours on the same closed history."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from trackintel_spark.operators import generate_tours
from trackintel_spark.streaming.tours_state import attach_trip_locations, tours_stream_exact

BASE = 1700000000
HOUR = 3600


def _mk_trips(n_users: int = 2):
    """Per user: a 3-trip tour (0->1->2->0), a 2-trip tour (0->3->0), an
    unknown-destination trip (breaks chains), a far-future repeat pair
    (prunes candidates past max_time), and a final closing tour."""
    rows = []  # (id, user_id, start_s, end_s, o_sp, d_sp, o_loc, d_loc)
    tid = 0
    for u in range(n_users):
        t = u * 100  # slight per-user offset
        sp = lambda k: (u * 1000 + k) if k is not None else None

        def trip(o_loc, d_loc, dur_h=1, gap_h=1):
            nonlocal t, tid
            rows.append(
                (
                    tid, u, t, t + dur_h * HOUR,
                    sp(o_loc), sp(d_loc),
                    o_loc, d_loc,
                )
            )
            tid += 1
            t += (dur_h + gap_h) * HOUR

        trip(0, 1); trip(1, 2); trip(2, 0)        # closes a 3-trip tour
        trip(0, 3); trip(3, 0)                     # closes a 2-trip tour
        trip(0, None)                              # unknown destination
        trip(1, 2)
        t += 40 * HOUR                             # > max_time: stale candidates pruned
        trip(2, 1); trip(1, 2)                     # too late to close with the pre-gap 1->2
        trip(2, 1)                                 # closes 1->2->1 within the window
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
        F.col("origin_loc").cast("long").alias("origin_loc"),
        F.col("dest_loc").cast("long").alias("dest_loc"),
    )


def _staypoints_df(spark, rows):
    """(id, location_id) map covering every staypoint id in rows, plus
    the minimal staypoint schema columns generate_tours validates."""
    seen = {}
    for (_, u, s, e, o_sp, d_sp, o_loc, d_loc) in rows:
        if o_sp is not None:
            seen[o_sp] = o_loc
        if d_sp is not None:
            seen[d_sp] = d_loc
    return spark.createDataFrame(
        [(k, k // 1000, v) for k, v in sorted(seen.items())],
        "id long, user_id long, location_id long",
    ).select(
        "id", "user_id",
        F.timestamp_seconds(F.lit(BASE)).alias("started_at"),
        F.timestamp_seconds(F.lit(BASE)).alias("finished_at"),
        "location_id",
    )


def _batch_expected(spark, rows, **kw):
    """Ground truth: batch generate_tours; per-user seq reconstructed
    from the dense ids (ordered by emission seq within user)."""
    trips = _trips_df(spark, rows).drop("origin_loc", "dest_loc")
    sp = _staypoints_df(spark, rows)
    _, tours = generate_tours(trips, staypoints=sp, **kw)
    out = set()
    per_user: dict = {}
    for r in tours.orderBy("user_id", "id").collect():
        seq = per_user.get(r.user_id, 0)
        per_user[r.user_id] = seq + 1
        out.add(
            (
                r.user_id, seq,
                int(r.started_at.timestamp()) - BASE,
                int(r.finished_at.timestamp()) - BASE,
                r.origin_staypoint_id, r.destination_staypoint_id,
                r.location_id, tuple(r.trips),
            )
        )
    return out


def _norm(rows):
    return {
        (
            r.user_id, r.seq,
            int(r.started_at.timestamp()) - BASE,
            int(r.finished_at.timestamp()) - BASE,
            r.origin_staypoint_id, r.destination_staypoint_id,
            r.location_id, tuple(r.trips),
        )
        for r in rows
    }


def _stream_result(spark, tmp_path, files, max_files=None, **kw):
    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src, exist_ok=True)
    for i, chunk in enumerate(files):
        _trips_df(spark, chunk).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, f"f{i}")
        )
        now = time.time() + i
        d = os.path.join(src, f"f{i}")
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (now, now))
    schema = (
        "id long, user_id long, started_at timestamp, finished_at timestamp, "
        "origin_staypoint_id long, destination_staypoint_id long, "
        "origin_loc long, dest_loc long"
    )
    reader = spark.readStream.schema(schema)
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    stream = reader.option("recursiveFileLookup", "true").parquet(src)
    out = tours_stream_exact(stream, **kw)
    name = f"tour_stream_{len(files)}_{max_files}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    return _norm(spark.sql(f"SELECT * FROM {name}").collect())


def test_batch_fallback_matches_generate_tours(spark):
    rows = _mk_trips()
    got = _norm(tours_stream_exact(_trips_df(spark, rows)).collect())
    exp = _batch_expected(spark, rows)
    assert got == exp
    assert len(got) == 8  # 4 tours per user, non-vacuous


def test_stream_single_pass_matches_batch(spark, tmp_path):
    rows = _mk_trips()
    assert _stream_result(spark, tmp_path, [rows]) == _batch_expected(spark, rows)


def test_stream_state_spans_microbatches(spark, tmp_path):
    """Chunk mid-tour: a tour whose opening trips arrive in earlier
    micro-batches than its closing trip must still emit, identically."""
    rows = _mk_trips()
    cut1, cut2 = len(rows) // 3 + 1, 2 * len(rows) // 3 + 1
    chunks = [rows[:cut1], rows[cut1:cut2], rows[cut2:]]
    got = _stream_result(spark, tmp_path, chunks, max_files=1)
    assert got == _batch_expected(spark, rows)


def test_stream_attach_trip_locations(spark, tmp_path):
    """The stream-static join path: feed a trips stream WITHOUT
    origin_loc/dest_loc and resolve them via attach_trip_locations
    against the static staypoints table."""
    rows = _mk_trips(n_users=1)
    src = os.path.join(str(tmp_path), "src2")
    os.makedirs(src, exist_ok=True)
    _trips_df(spark, rows).drop("origin_loc", "dest_loc").coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "f0"))
    schema = (
        "id long, user_id long, started_at timestamp, finished_at timestamp, "
        "origin_staypoint_id long, destination_staypoint_id long"
    )
    stream = (
        spark.readStream.schema(schema).option("recursiveFileLookup", "true").parquet(src)
    )
    joined = attach_trip_locations(stream, _staypoints_df(spark, rows))
    out = tours_stream_exact(joined)
    q = (
        out.writeStream.format("memory").queryName("tour_stream_joined")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = _norm(spark.sql("SELECT * FROM tour_stream_joined").collect())
    assert got == _batch_expected(spark, rows)


def test_geometry_mode_matches_batch(spark):
    """max_dist mode (no locations): endpoints as points; same tours by
    proximity. Stream batch-fallback vs batch generate_tours."""
    rows = _mk_trips(n_users=1)
    # place location k at (8.5 + 0.01k, 47.4); 0.01 deg lon ~ 750 m >> max_dist
    def pt(loc):
        return (8.5 + 0.01 * loc, 47.4) if loc is not None else (0.0, 0.0)

    geo = []
    for (tid, u, s, e, o_sp, d_sp, o_loc, d_loc) in rows:
        olon, olat = pt(o_loc)
        dlon, dlat = pt(d_loc)
        geo.append((tid, u, s, e, o_sp, d_sp, olon, olat, dlon, dlat))
    df = spark.createDataFrame(
        geo,
        "id long, user_id long, start_s long, end_s long, "
        "origin_staypoint_id long, destination_staypoint_id long, "
        "o_lon double, o_lat double, d_lon double, d_lat double",
    ).select(
        "id", "user_id",
        F.timestamp_seconds(F.col("start_s") + BASE).alias("started_at"),
        F.timestamp_seconds(F.col("end_s") + BASE).alias("finished_at"),
        "origin_staypoint_id", "destination_staypoint_id",
        F.struct(
            F.struct(F.col("o_lon").alias("lon"), F.col("o_lat").alias("lat")).alias("origin"),
            F.struct(F.col("d_lon").alias("lon"), F.col("d_lat").alias("lat")).alias("dest"),
        ).alias("geom"),
    )
    _, tours = generate_tours(df, staypoints=None, max_dist=100.0)
    exp = set()
    per_user: dict = {}
    for r in tours.orderBy("user_id", "id").collect():
        seq = per_user.get(r.user_id, 0)
        per_user[r.user_id] = seq + 1
        exp.add(
            (
                r.user_id, seq,
                int(r.started_at.timestamp()) - BASE,
                int(r.finished_at.timestamp()) - BASE,
                r.origin_staypoint_id, r.destination_staypoint_id,
                r.location_id, tuple(r.trips),
            )
        )
    got = _norm(tours_stream_exact(df, max_dist=100.0).collect())
    assert got == exp
    assert len(got) >= 2


def test_stream_out_of_order_across_batches_raises(spark, tmp_path):
    """The ordering contract is enforced: a micro-batch delivering a trip
    that starts BEFORE one already folded into the candidate stack must
    fail the query loudly (silently corrupted tours were the alternative)."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    rows = _mk_trips(n_users=1)
    # second chunk REPLAYS the first trip -> out of order across batches
    chunks = [rows[3:], rows[:3]]
    with pytest.raises(StreamingQueryException, match="out-of-order trip"):
        _stream_result(spark, tmp_path, chunks, max_files=1)


def test_stream_in_order_duplicate_boundary_ok(spark, tmp_path):
    """Equal started_at at a micro-batch boundary is NOT out of order
    (strictly-before raises; ties pass through the kernel)."""
    rows = _mk_trips(n_users=1)
    cut = len(rows) // 2
    got = _stream_result(spark, tmp_path, [rows[:cut], rows[cut:]], max_files=1)
    assert got == _batch_expected(spark, rows)
