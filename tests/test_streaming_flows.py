"""od_flows_stream: watermarked tumbling-window OD aggregation —
batch == stream on closed history; late rows beyond the watermark are
dropped and closed windows emit exactly once (append finality)."""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from trackintel_spark.streaming import od_flows_stream

T0 = datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = (
    "id long, user_id long, started_at timestamp, "
    "origin_staypoint_id long, destination_staypoint_id long"
)


def _trips_df(spark, rows):
    """(id, user, minute, o_sp, d_sp)"""
    return spark.createDataFrame(
        [(i, u, T0 + timedelta(minutes=m), o, d) for i, u, m, o, d in rows], SCHEMA
    )


def _sp_df(spark, mapping):
    return spark.createDataFrame(
        [(sp, sp // 10, z) for sp, z in mapping.items()],
        "id long, user_id long, location_id long",
    )


def _mk_rows():
    rows = []
    tid = 0
    # hour 0: flows 0->1 (x3), 1->2 (x2); hour 1: 0->1 (x1), NULL dest
    for m, o, d in [(5, 10, 21), (20, 10, 21), (50, 11, 20), (30, 30, 41),
                    (45, 31, 40), (70, 10, 20), (80, 12, None)]:
        rows.append((tid, 1, m, o, d))
        tid += 1
    return rows


ZONES = {10: 0, 11: 0, 12: 0, 20: 1, 21: 1, 30: 1, 31: 1, 40: 2, 41: 2}


def _norm(rows):
    return {
        (r.window_start, r.origin, r.destination, r.n_trips) for r in rows
    }


def test_batch_matches_manual_and_self_loops(spark):
    trips = _trips_df(spark, _mk_rows())
    sp = _sp_df(spark, ZONES)
    got = _norm(od_flows_stream(trips, sp, window="1 hour").collect())
    h0, h1 = T0, T0 + timedelta(hours=1)
    assert got == {
        (h0, 0, 1, 3), (h0, 1, 2, 2), (h1, 0, 1, 1), (h1, 0, None, 1),
    }
    # self-loop drop removes 0->0-style rows but keeps NULL endpoints
    rows2 = _mk_rows() + [(99, 1, 10, 10, 11)]  # zone 0 -> zone 0
    loops = od_flows_stream(
        _trips_df(spark, rows2), sp, window="1 hour", drop_self_loops=True
    ).collect()
    assert (h0, 0, 0, 1) not in _norm(loops)
    assert (h1, 0, None, 1) in _norm(loops)


def test_stream_matches_batch_and_drops_late(spark, tmp_path):
    """Two micro-batches; a third delivers a row whose event time is
    far behind the watermark — the on-time flows match the batch run
    on the on-time rows, and the late row never appears."""
    rows = _mk_rows()
    # flush rows far in the future: the watermark is computed from the
    # PREVIOUS batch's max event time, so two flush batches are needed
    # before the hour-0/1 windows are provably emitted and evicted —
    # only then is a late arrival guaranteed to drop (Spark's contract
    # guarantees dropping once the window state is gone, not before)
    flush = (500, 1, 60 * 24, 10, 21)
    flush2 = (502, 1, 60 * 25, 10, 21)
    late = (501, 1, 10, 11, 20)  # hour-0 event arriving after eviction
    sp = _sp_df(spark, ZONES)

    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src, exist_ok=True)
    for i, chunk in enumerate([rows, [flush], [flush2], [late]]):
        _trips_df(spark, chunk).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, f"f{i}")
        )
        now = time.time() + i
        d = os.path.join(src, f"f{i}")
        for f_ in os.listdir(d):
            os.utime(os.path.join(d, f_), (now, now))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        od_flows_stream(stream, sp, window="1 hour", watermark="2 hours")
        .writeStream.format("memory").queryName("od_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    emitted = spark.sql("SELECT * FROM od_stream").collect()
    got = _norm(emitted)
    exp_on_time = _norm(
        od_flows_stream(_trips_df(spark, rows), sp, window="1 hour").collect()
    )
    # every closed on-time window emitted exactly once; the late row's
    # (h0, 0, 1) increment never lands (its window was evicted before
    # it arrived) and no duplicate append rows exist for any window
    assert exp_on_time <= got
    h0 = T0
    assert (h0, 0, 1, 3) in got and (h0, 0, 1, 4) not in got
    assert (h0, 0, 1, 1) not in got  # no late re-open duplicate
    keys = [(r.window_start, r.origin, r.destination) for r in emitted]
    assert len(keys) == len(set(keys))
