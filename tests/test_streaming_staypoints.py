"""staypoints_stream_exact: streaming == batch generate_staypoints.

The stateful operator must produce byte-identical staypoints to the
batch kernel regardless of micro-batch boundaries. Proven two ways:
one availableNow pass over a file stream, and a 3-file
maxFilesPerTrigger=1 run where candidate windows span trigger
boundaries (state carry-over).
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from trackintel_spark.operators import generate_staypoints
from trackintel_spark.streaming import staypoints_stream_exact

PARAMS = dict(dist_threshold=150, time_threshold=5, gap_threshold=60)


def _mk_rows(n_users: int = 4, per_user: int = 120):
    """Synthetic dwell/move pattern: 20-min dwells at alternating spots,
    fixes every 2 min, with an occasional long gap."""
    rows = []
    i = 0
    for u in range(n_users):
        t = 0
        for k in range(per_user):
            spot = (k // 10) % 3  # move every 10 fixes
            lon = 8.5 + spot * 0.01 + (k % 10) * 1e-6 + u * 1e-7
            lat = 47.4 + spot * 0.005
            if k % 37 == 36:
                t += 90 * 60  # long gap: exceeds gap_threshold
            rows.append((i, u, t, lon, lat))
            i += 1
            t += 120
    return rows


def _pfs_df(spark, rows):
    return spark.createDataFrame(rows, "id long, user_id long, sec long, lon double, lat double").select(
        "id", "user_id", F.timestamp_seconds(F.col("sec") + 1700000000).alias("tracked_at"), "lon", "lat"
    )


def _batch_expected(spark, rows):
    pfs = _pfs_df(spark, rows).select(
        "id", "user_id", "tracked_at", F.struct("lon", "lat").alias("geom")
    )
    _, sp = generate_staypoints(pfs, **PARAMS)
    return {
        (r.user_id, r.started_at, r.finished_at, round(r.geom.lon, 9), round(r.geom.lat, 9))
        for r in sp.collect()
    }


def _stream_result(spark, tmp_path, files, max_files=None):
    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src, exist_ok=True)
    for i, chunk in enumerate(files):
        _pfs_df(spark, chunk).coalesce(1).write.mode("overwrite").parquet(os.path.join(src, f"f{i}"))
        # file-source ordering follows modification time
        now = time.time() + i
        d = os.path.join(src, f"f{i}")
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (now, now))
    schema = "id long, user_id long, tracked_at timestamp, lon double, lat double"
    reader = spark.readStream.schema(schema)
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    stream = reader.option("recursiveFileLookup", "true").parquet(src)
    out = staypoints_stream_exact(stream, **PARAMS)
    q = (
        out.writeStream.format("memory")
        .queryName(f"sp_stream_{len(files)}_{max_files}")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"SELECT * FROM sp_stream_{len(files)}_{max_files}").collect()
    return {
        (r.user_id, r.started_at, r.finished_at, round(r.lon, 9), round(r.lat, 9)) for r in rows
    }


def test_stream_exact_matches_batch_single_pass(spark, tmp_path):
    rows = _mk_rows()
    assert _stream_result(spark, tmp_path, [rows]) == _batch_expected(spark, rows)


def test_stream_exact_state_spans_microbatches(spark, tmp_path):
    rows = _mk_rows()
    # split MID-dwell so open candidate windows cross trigger boundaries
    cut1, cut2 = len(rows) // 3 + 7, 2 * len(rows) // 3 + 13
    chunks = [rows[:cut1], rows[cut1:cut2], rows[cut2:]]
    got = _stream_result(spark, tmp_path, chunks, max_files=1)
    assert got == _batch_expected(spark, rows)
    assert len(got) > 10  # non-vacuous


def test_batch_fallback_matches_generate_staypoints(spark):
    rows = _mk_rows(n_users=2, per_user=60)
    flat = _pfs_df(spark, rows)
    got = {
        (r.user_id, r.started_at, r.finished_at, round(r.lon, 9), round(r.lat, 9))
        for r in staypoints_stream_exact(flat, **PARAMS).collect()
    }
    assert got == _batch_expected(spark, rows)
