"""Checkpoint-restart durability for the stateful streaming chain.

A production streaming job stops (deploy, crash, rescale) and restarts
from its ``checkpointLocation``; Structured Streaming restores the
state store and the file-source progress log. These tests pin that the
exact mobility kernels survive that cycle:

* the open candidate-window state (declared ``_STATE_SCHEMA`` arrays)
  is restored, so a dwell SPANNING the restart is emitted correctly by
  the second run — impossible without state restore;
* the parquet sink + checkpoint pair stays exactly-once — no row is
  duplicated or lost across the restart (file source replays nothing);
* the reorder buffer's pickled pandas frame (an opaque BinaryType
  state column, streaming/reorder.py:37) round-trips through the
  HDFS-backed state store checkpoint, not just process memory.

The reference is batch-only (reference trackintel
preprocessing/positionfixes.py:243 sorts full history up front), so
this is an extension surface: correctness is defined as stream-union-
across-restarts == one batch run over the full history.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from test_streaming_reorder import SP_D, SP_DISORDER_MIN, SP_PARAMS, _jittered_chunks, _mk_pfs_rows
from trackintel_spark.operators import generate_staypoints
from trackintel_spark.streaming import staypoints_stream_exact

BASE = 1700000000


def _pfs_df(spark, rows):
    return spark.createDataFrame(
        rows, "id long, user_id long, sec long, lon double, lat double"
    ).select(
        "id", "user_id",
        F.timestamp_seconds(F.col("sec") + BASE).alias("tracked_at"), "lon", "lat",
    )


def _batch_expected(spark, rows):
    pfs = _pfs_df(spark, rows).select(
        "id", "user_id", "tracked_at", F.struct("lon", "lat").alias("geom")
    )
    _, sp = generate_staypoints(pfs, **SP_PARAMS)
    return {
        (r.user_id, r.started_at, r.finished_at, round(r.geom.lon, 9), round(r.geom.lat, 9))
        for r in sp.collect()
    }


def _add_files(spark, src, chunks, start_idx=0):
    os.makedirs(src, exist_ok=True)
    for i, chunk in enumerate(chunks, start=start_idx):
        d = os.path.join(src, f"f{i}")
        _pfs_df(spark, chunk).coalesce(1).write.mode("overwrite").parquet(d)
        now = time.time() + i  # file-source ordering follows mtime
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (now, now))


def _run_once(spark, src, out, ckpt, **op_kwargs):
    """One availableNow pass of the staypoint stream into a parquet
    sink, restarting from ``ckpt`` if it exists. Returns the sink rows."""
    schema = "id long, user_id long, tracked_at timestamp, lon double, lat double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        staypoints_stream_exact(stream, **SP_PARAMS, **op_kwargs)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    return spark.read.parquet(out).collect()


def _key_set(rows):
    return {
        (r.user_id, r.started_at, r.finished_at, round(r.lon, 9), round(r.lat, 9)) for r in rows
    }


def test_staypoints_restart_restores_state_exactly_once(spark, tmp_path):
    rows = _mk_pfs_rows(n_users=3, per_user=80)
    # cut mid-dwell: per_user=80 with a spot change every 10 fixes; index
    # 45 of user 1 sits inside a dwell, so the open candidate window at
    # the end of run 1 must survive the restart to close correctly.
    per_user_cut = 45
    first = [r for r in rows if r[1] == 0] + [r for r in rows if r[1] > 0][: per_user_cut]
    first_ids = {r[0] for r in first}
    rest = [r for r in rows if r[0] not in first_ids]
    cut_time = min(r[2] for r in rest if r[1] == 1)

    src = os.path.join(str(tmp_path), "src")
    out = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    # run 1: two micro-batches over the first tranche, then STOP
    half = len(first) // 2
    _add_files(spark, src, [first[:half], first[half:]], start_idx=0)
    got1 = _key_set(_run_once(spark, src, out, ckpt))
    expected = _batch_expected(spark, rows)
    assert got1 < expected  # partial, and nothing wrong emitted early

    # run 2: new files arrive, FRESH query object, SAME checkpoint
    _add_files(spark, src, [rest], start_idx=2)
    final = _run_once(spark, src, out, ckpt)

    # exactly-once: no physical duplicates in the sink across restarts
    assert len(final) == len(_key_set(final))
    assert _key_set(final) == expected
    # the restart-spanning dwell was closed by run 2 from restored state
    spanning = [
        r for r in final
        if r.user_id == 1
        and r.started_at.timestamp() - BASE < cut_time <= r.finished_at.timestamp() - BASE
    ]
    assert spanning, "no staypoint spans the restart boundary — state not restored"
    assert len(final) > 10  # non-vacuous


def test_reorder_buffer_pickle_survives_restart(spark, tmp_path):
    """Restart while the hold-and-sort buffer is non-empty: the pickled
    pending-rows frame must round-trip through the checkpoint."""
    rows = _mk_pfs_rows(n_users=2, per_user=60)
    chunks = _jittered_chunks(rows, SP_D, n_chunks=4, seed=7)

    src = os.path.join(str(tmp_path), "src")
    out = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    kw = dict(max_disorder=SP_DISORDER_MIN, late="raise")
    # run 1 ends mid-stream: the buffer holds every event within
    # SP_D of each user's high-water mark — guaranteed non-empty.
    _add_files(spark, src, chunks[:2], start_idx=0)
    _run_once(spark, src, out, ckpt, **kw)

    _add_files(spark, src, chunks[2:], start_idx=2)
    final = _run_once(spark, src, out, ckpt, **kw)

    assert len(final) == len(_key_set(final))  # exactly-once
    # flush fixes (see _mk_pfs_rows) make the tail comparable
    assert _key_set(final) == _batch_expected(spark, rows)
    assert len(final) > 5
