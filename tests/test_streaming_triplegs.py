"""triplegs_stream_exact: chunk-invariant streaming tripleg emission.

The contract (streaming/triplegs_state.py): triplegs are maximal runs
of non-staypoint fixes, split at gaps, emitted once closing evidence
(following staypoint fix or gap fix) has arrived; open segments are
never emitted. The expected set below is an independent pandas model
of that contract driven by the BATCH staypoint operator's assignment —
so streaming, batch fallback, and model must agree, however the stream
is chopped.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from trackintel_spark.operators import generate_staypoints
from trackintel_spark.streaming import triplegs_stream_exact

PARAMS = dict(dist_threshold=150, time_threshold=5, gap_threshold=60)


def _mk_rows(n_users: int = 3, per_user: int = 120):
    rows = []
    i = 0
    for u in range(n_users):
        t = 0
        for k in range(per_user):
            spot = (k // 10) % 3
            lon = 8.5 + spot * 0.01 + (k % 10) * 1e-6 + u * 1e-7
            lat = 47.4 + spot * 0.005
            if k % 37 == 36:
                t += 90 * 60  # gap > gap_threshold
            rows.append((i, u, t, lon, lat))
            i += 1
            t += 120
    return rows


def _pfs_df(spark, rows):
    return spark.createDataFrame(
        rows, "id long, user_id long, sec long, lon double, lat double"
    ).select(
        "id", "user_id", F.timestamp_seconds(F.col("sec") + 1700000000).alias("tracked_at"),
        "lon", "lat",
    )


def _model_expected(spark, rows):
    """Independent contract model: batch staypoint assignment + a plain
    python scan for runs/gaps/closing evidence."""
    pfs = _pfs_df(spark, rows).select(
        "id", "user_id", "tracked_at", F.struct("lon", "lat").alias("geom")
    )
    pfs_sp, _ = generate_staypoints(pfs, **PARAMS)
    assigned = {
        r.id: r.staypoint_id for r in pfs_sp.select("id", "staypoint_id").collect()
    }
    gap_s = PARAMS["gap_threshold"] * 60.0

    by_user: dict[int, list] = {}
    for (i, u, t, lon, lat) in rows:
        by_user.setdefault(u, []).append((t, i, lon, lat))
    out = set()
    for u, fixes in by_user.items():
        fixes.sort()
        seg: list = []
        prev_t = None

        def flush():
            nonlocal seg
            if seg:
                out.add((u, seg[0][0], seg[-1][0], len(seg)))
                seg = []

        for t, i, lon, lat in fixes:
            if assigned.get(i) is not None:
                flush()
                prev_t = t
                continue
            if prev_t is not None and t - prev_t > gap_s:
                flush()
            seg.append((t, i))
            prev_t = t
        # open tail: dropped (no closing evidence in the input)
    return out


def _norm(rows):
    base = 1700000000
    return {
        (r.user_id, int(r.started_at.timestamp()) - base, int(r.finished_at.timestamp()) - base,
         r.n_pfs)
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
    out = triplegs_stream_exact(stream, **PARAMS)
    name = f"tpl_stream_{len(files)}_{max_files}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    return _norm(spark.sql(f"SELECT * FROM {name}").collect())


def test_batch_fallback_matches_model(spark):
    rows = _mk_rows()
    got = _norm(triplegs_stream_exact(_pfs_df(spark, rows), **PARAMS).collect())
    exp = _model_expected(spark, rows)
    assert got == exp
    assert len(got) >= 9  # non-vacuous: 3 closed triplegs per user


def test_stream_single_pass_matches_model(spark, tmp_path):
    rows = _mk_rows()
    assert _stream_result(spark, tmp_path, [rows]) == _model_expected(spark, rows)


def test_stream_state_spans_microbatches(spark, tmp_path):
    rows = _mk_rows()
    cut1, cut2 = len(rows) // 3 + 7, 2 * len(rows) // 3 + 13
    chunks = [rows[:cut1], rows[cut1:cut2], rows[cut2:]]
    got = _stream_result(spark, tmp_path, chunks, max_files=1)
    assert got == _model_expected(spark, rows)


def test_geometry_is_settled_linestring(spark):
    rows = _mk_rows(n_users=1, per_user=60)
    out = triplegs_stream_exact(_pfs_df(spark, rows), **PARAMS).collect()
    assert out
    for r in out:
        if r.n_pfs >= 2:
            assert r.geom_wkt.startswith("LINESTRING (")
            assert r.geom_wkt.count(",") == r.n_pfs - 1
        else:
            assert r.geom_wkt is None


def test_late_fix_inside_buffer_range_is_dropped(spark, tmp_path):
    """A late fix older than the candidate-window floor (even if inside
    the open travel-buffer's time range) is dropped — the documented
    watermark. Output must equal the model run WITHOUT the late fix
    (before the fix, the late row silently displaced buffer rows into
    the staypoint scan and broke chunk invariance)."""
    rows = _mk_rows(n_users=1, per_user=120)
    # file 1: first 70 fixes; file 2: the rest plus one late travel-era
    # fix whose ts falls well before file 1's end
    late = (99999, 0, rows[40][2] + 1, 8.5123, 47.4567)
    chunks = [rows[:70], rows[70:] + [late]]
    got = _stream_result(spark, tmp_path, chunks, max_files=1)
    assert got == _model_expected(spark, rows)  # late fix contributed nothing
