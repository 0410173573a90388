"""locations_stream_exact: online nearest-location assignment for
streamed staypoints — stream-static candidate join against a trained
locations table + stateful open-new-location fallback."""

from __future__ import annotations

import math
import os
import random
import time
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from trackintel_spark.streaming.locations_state import (
    _haversine_scalar,
    locations_stream_exact,
)

T0 = datetime(2024, 1, 1, 8, 0, 0)


def _sp_df(spark, rows):
    """(id, user, minute, lon, lat)"""
    data = [(i, u, T0 + timedelta(minutes=m), lon, lat) for i, u, m, lon, lat in rows]
    df = spark.createDataFrame(
        data, "id long, user_id long, started_at timestamp, lon double, lat double"
    )
    return df.select(
        "id", "user_id", "started_at", F.struct("lon", "lat").alias("geom")
    )


def _loc_df(spark, rows):
    """(id, user, lon, lat)"""
    return spark.createDataFrame(
        rows, "id long, user_id long, lon double, lat double"
    ).select("id", "user_id", F.struct("lon", "lat").alias("center"))


# ~100 m in degrees of latitude / of longitude at 47.4N
DLAT = 100.0 / 111194.93
DLON = DLAT / math.cos(math.radians(47.4))


def test_batch_assignment_nearest_trained_center(spark):
    locs = _loc_df(spark, [(10, 1, 8.50, 47.40), (11, 1, 8.50 + 3 * DLON, 47.40)])
    sp = _sp_df(
        spark,
        [
            (0, 1, 0, 8.50, 47.40),                   # on center 10
            (1, 1, 10, 8.50 + 0.4 * DLON, 47.40),     # nearer 10 than 11
            (2, 1, 20, 8.50 + 2.7 * DLON, 47.40),     # nearer 11
            (3, 1, 30, 8.50 + 30 * DLON, 47.40),      # far: opens -1
            (4, 1, 40, 8.50 + 30.2 * DLON, 47.40),    # near the opened -1
        ],
    )
    got = {
        r.id: r.location_id
        for r in locations_stream_exact(sp, locs, epsilon_m=100.0).collect()
    }
    assert got == {0: 10, 1: 10, 2: 11, 3: -1, 4: -1}


def test_batch_pure_online_clusterer(spark):
    """No trained table: leader clustering in arrival order."""
    sp = _sp_df(
        spark,
        [
            (0, 1, 0, 8.50, 47.40),
            (1, 1, 10, 8.50 + 0.3 * DLON, 47.40),   # joins -1
            (2, 1, 20, 8.50 + 5 * DLON, 47.40),     # opens -2
            (3, 1, 30, 8.50, 47.40),                # back to -1
            (4, 2, 0, 8.50, 47.40),                 # user 2: its own -1
        ],
    )
    got = {
        r.id: r.location_id for r in locations_stream_exact(sp, None).collect()
    }
    assert got == {0: -1, 1: -1, 2: -2, 3: -1, 4: -1}


def test_grid_join_never_drops_a_center_randomized(spark):
    """The banded 3x3 candidate join must surface EVERY trained center
    within eps — verified against a brute-force python oracle on random
    points, including band/cell edges and a high-latitude block."""
    rng = random.Random(1234)
    locs, sps = [], []
    lid = 0
    for base_lon, base_lat in ((8.5, 47.4), (20.0, 69.9)):  # mid + high lat
        for _ in range(40):
            locs.append((lid, 1, base_lon + rng.uniform(0, 8 * DLON),
                         base_lat + rng.uniform(0, 8 * DLAT)))
            lid += 1
        for i in range(80):
            sps.append((len(sps), 1, len(sps),
                        base_lon + rng.uniform(0, 8 * DLON),
                        base_lat + rng.uniform(0, 8 * DLAT)))
    got = {
        r.id: r.location_id
        for r in locations_stream_exact(
            _sp_df(spark, sps), _loc_df(spark, locs), epsilon_m=100.0
        ).collect()
    }
    # oracle: exact nearest within eps by brute force (tie: smallest id)
    for sid, _, _, slon, slat in sps:
        best = None
        for lid_, _, llon, llat in locs:
            d = _haversine_scalar(slon, slat, llon, llat)
            if d <= 100.0 and (best is None or (d, lid_) < best):
                best = (d, lid_)
        if best is not None:
            assert got[sid] == best[1], (sid, got[sid], best)
        else:
            assert got[sid] < 0  # opened online


def test_stream_matches_batch_across_microbatches(spark, tmp_path):
    """Chunked delivery: assignments (incl. the stateful opened ids)
    must equal the single-pass batch run."""
    rows = [
        (0, 1, 0, 8.50, 47.40),
        (1, 1, 10, 8.50 + 0.3 * DLON, 47.40),
        (2, 1, 20, 8.50 + 6 * DLON, 47.40),
        (3, 1, 30, 8.50, 47.40),
        (4, 1, 40, 8.50 + 6.2 * DLON, 47.40),
        (5, 2, 0, 9.00, 47.00),
        (6, 2, 10, 9.00 + 0.2 * DLON, 47.00),
    ]
    locs = _loc_df(spark, [(10, 1, 8.50, 47.40)])
    batch = {
        r.id: r.location_id
        for r in locations_stream_exact(_sp_df(spark, rows), locs).collect()
    }

    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src, exist_ok=True)
    chunks = [rows[:2], rows[2:5], rows[5:]]
    for i, chunk in enumerate(chunks):
        _sp_df(spark, chunk).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, f"f{i}")
        )
        now = time.time() + i
        d = os.path.join(src, f"f{i}")
        for f_ in os.listdir(d):
            os.utime(os.path.join(d, f_), (now, now))
    schema = "id long, user_id long, started_at timestamp, geom struct<lon:double,lat:double>"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = locations_stream_exact(stream, locs)
    q = (
        out.writeStream.format("memory").queryName("loc_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {
        r.id: r.location_id for r in spark.sql("SELECT * FROM loc_stream").collect()
    }
    assert got == batch
    assert batch[0] == 10 and batch[3] == 10  # trained center sticks
    assert batch[2] == batch[4] < 0  # opened center reused across batches


def test_null_geometry_staypoints_kept_with_null_location(spark):
    """A staypoint with NULL lon/lat must still appear in the output —
    with location_id NULL — instead of being silently dropped by the
    kernel's pandas groupby (which excludes NaN keys)."""
    locs = _loc_df(spark, [(10, 1, 8.50, 47.40)])
    data = [
        (0, 1, T0, 8.50, 47.40),
        (1, 1, T0 + timedelta(minutes=5), None, 47.40),
        (2, 1, T0 + timedelta(minutes=9), None, None),
    ]
    sp = spark.createDataFrame(
        data, "id long, user_id long, started_at timestamp, lon double, lat double"
    ).select("id", "user_id", "started_at", F.struct("lon", "lat").alias("geom"))
    got = {r.id: r.location_id for r in locations_stream_exact(sp, locs).collect()}
    assert got == {0: 10, 1: None, 2: None}


def test_trained_center_matches_across_antimeridian(spark):
    """A staypoint within eps of a trained center ACROSS the ±180°
    dateline must take that center, not open a spurious negative-id
    location: centers are replicated at lon ± 360° so the banded grid
    equi-join sees numerically adjacent cells (the exact haversine
    check was always wrap-safe). Both crossing directions, plus a
    high-latitude band, plus a control pair far from the dateline."""
    d50lat = 50.0 / 111194.93  # ~50 m of latitude
    locs = _loc_df(
        spark,
        [
            (10, 1, 179.9996, 0.0),    # ~45 m west of the dateline
            (11, 1, -179.9996, 20.0),  # ~42 m east of it, different band
            (12, 1, 179.9990, 66.5),   # high band: wider lon cells
            (13, 1, 8.50, 47.40),      # control far from the dateline
        ],
    )
    sp = _sp_df(
        spark,
        [
            (0, 1, 0, -179.9996, 0.0),          # crosses east -> west center
            (1, 1, 10, 179.9996, 20.0),         # crosses west -> east center
            (2, 1, 20, -179.9992, 66.5),        # high-lat crossing
            (3, 1, 30, 8.50, 47.40 + d50lat / 111194.93 * 111194.93 * 0),  # on control
            (4, 1, 40, 0.0, 0.0),               # far from everything: opens -1
        ],
    )
    got = {
        r.id: r.location_id
        for r in locations_stream_exact(sp, locs, epsilon_m=150.0).collect()
    }
    assert got[0] == 10, got
    assert got[1] == 11, got
    assert got[2] == 12, got
    assert got[3] == 13, got
    assert got[4] == -1, got


def test_online_clusterer_reorder_matches_in_order_run(spark, tmp_path):
    """max_disorder: the order-dependent online clusterer produces the
    SAME opened-center ids from a jittered stream as from the in-order
    batch run, because the reorder buffer releases rows to the kernel
    in event-time order. Flush staypoints (far away, beyond the bound)
    release the tail; they open their own locations identically in
    both runs."""
    disorder_min = 30.0
    rows = []
    sid = 0
    for u in (1, 2):
        # three revisited places in a fixed visit order; opened ids
        # (-1, -2, -3) depend on that order
        for k in range(12):
            spot = (0, 1, 2, 1, 0, 2)[k % 6]
            rows.append((sid, u, k * 45, 8.5 + spot * 30 * DLON, 47.4))
            sid += 1
        rows.append((sid, u, 12 * 45 + int(disorder_min) + 60, 9.9, 49.9)); sid += 1
        rows.append((sid, u, 12 * 45 + 2 * (int(disorder_min) + 60), 9.91, 49.91)); sid += 1
    sp = _sp_df(spark, rows)
    expected = {
        r.id: r.location_id
        for r in locations_stream_exact(sp, None, epsilon_m=100.0).collect()
    }
    assert min(expected.values()) <= -3  # several opened centers

    rng = random.Random(99)
    jit = sorted(rows, key=lambda r: r[2] + rng.uniform(0, disorder_min * 0.95))
    assert [r[0] for r in jit] != [r[0] for r in rows]  # genuinely shuffled
    src = os.path.join(str(tmp_path), "reorder_src")
    os.makedirs(src, exist_ok=True)
    step = (len(jit) + 2) // 3
    for i in range(3):
        _sp_df(spark, jit[i * step:(i + 1) * step]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"f{i}"))
        now = time.time() + i
        d = os.path.join(src, f"f{i}")
        for f_ in os.listdir(d):
            os.utime(os.path.join(d, f_), (now, now))
    stream = (
        spark.readStream.schema(
            "id long, user_id long, started_at timestamp, geom struct<lon:double,lat:double>"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        locations_stream_exact(stream, None, epsilon_m=100.0, max_disorder=disorder_min)
        .writeStream.format("memory").queryName("loc_reorder")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {
        r.id: r.location_id
        for r in spark.sql("SELECT * FROM loc_reorder").collect()
    }
    # everything except at most the final flush staypoint (still inside
    # the buffer at stream end) must match the in-order run exactly
    assert len(got) >= len(expected) - 2
    for k, v in got.items():
        assert expected[k] == v, (k, v, expected[k])


def test_max_open_locations_lru_cap(spark):
    """r12: the opened-center list is the only unbounded state in the
    online clusterer (grows with NEW places, not stream length) —
    max_open_locations caps it with LRU eviction. A user visiting 5
    fresh places under cap 3 keeps only the 3 most-recently-assigned
    centers; returning to an evicted place opens a NEW id, returning
    to a recent one (which also refreshes its recency) reuses it."""
    far = 40 * DLON  # places far apart (>> eps)
    rows = [
        (0, 1, 0, 8.50 + 0 * far, 47.40),   # opens -1      recency [-1]
        (1, 1, 10, 8.50 + 1 * far, 47.40),  # opens -2      [-1,-2]
        (2, 1, 20, 8.50 + 2 * far, 47.40),  # opens -3      [-1,-2,-3]
        (3, 1, 25, 8.50 + 0 * far, 47.40),  # reuse -1, LRU touch [-2,-3,-1]
        (4, 1, 30, 8.50 + 3 * far, 47.40),  # opens -4, evicts -2 [-3,-1,-4]
        (5, 1, 40, 8.50 + 1 * far, 47.40),  # place 1 evicted -> NEW -5,
                                            # evicts -3          [-1,-4,-5]
        (6, 1, 50, 8.50 + 0 * far, 47.40),  # -1 survived its touch -> reuse
        (7, 1, 60, 8.50 + 2 * far, 47.40),  # place 2 evicted -> NEW -6
    ]
    got = {
        r.id: r.location_id
        for r in locations_stream_exact(
            _sp_df(spark, rows), None, epsilon_m=100.0, max_open_locations=3
        ).collect()
    }
    assert got == {0: -1, 1: -2, 2: -3, 3: -1, 4: -4, 5: -5, 6: -1, 7: -6}
    # uncapped: the same input reuses every opened center
    got_unb = {
        r.id: r.location_id
        for r in locations_stream_exact(
            _sp_df(spark, rows), None, epsilon_m=100.0
        ).collect()
    }
    assert got_unb == {0: -1, 1: -2, 2: -3, 3: -1, 4: -4, 5: -2, 6: -1, 7: -3}
