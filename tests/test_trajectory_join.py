"""trajectory_similarity_join == brute-force all-pairs DP under tau.

The operator's exactness claim is that grid candidates + endpoint
lower bounds lose NO qualifying pair; the randomized tests check the
returned (id_a, id_b, dist) set against an all-pairs numpy ground
truth for both metrics, across taus that exercise sparse and dense
result regimes, with trajectories deliberately straddling cell
boundaries.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from trackintel_spark.geogr import trajectory_similarity_join
from trackintel_spark.geogr.trajectory_distance import dtw_distance, frechet_distance


def _mk_trajs(n, seed, spread_deg=0.02):
    """Random walks around a handful of anchor points near Zurich —
    anchors much closer than the grid cell size, so candidate cells
    overlap heavily and boundary-straddling pairs are guaranteed."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        ax = 8.5 + (i % 5) * spread_deg
        ay = 47.4 + (i % 3) * spread_deg
        length = rng.randint(2, 9)
        lon, lat = ax + rng.uniform(-5e-3, 5e-3), ay + rng.uniform(-5e-3, 5e-3)
        pts = []
        for _ in range(length):
            pts.append({"lon": lon, "lat": lat})
            lon += rng.uniform(-2e-3, 2e-3)
            lat += rng.uniform(-2e-3, 2e-3)
        rows.append((i, pts))
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "id long, geom array<struct<lon:double,lat:double>>"
    )


def _brute(rows, fn, tau):
    arrs = {
        i: np.array([[p["lon"], p["lat"]] for p in pts], dtype=float) for i, pts in rows
    }
    out = {}
    ids = sorted(arrs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            d = fn(arrs[ids[x]], arrs[ids[y]])
            if d <= tau:
                out[(ids[x], ids[y])] = d
    return out


@pytest.mark.parametrize("metric,fn", [("frechet", frechet_distance), ("dtw", dtw_distance)])
@pytest.mark.parametrize("seed,tau", [(0, 400.0), (1, 900.0), (2, 2500.0)])
def test_join_matches_bruteforce(spark, metric, fn, seed, tau):
    rows = _mk_trajs(50, seed)
    got = {
        (r.id_a, r.id_b): r.dist_m
        for r in trajectory_similarity_join(_df(spark, rows), tau, metric=metric).collect()
    }
    want = _brute(rows, fn, tau)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)
    if seed == 2:
        assert len(want) > 20  # dense regime is non-vacuous


def test_join_plan_is_equi_not_cartesian(spark):
    rows = _mk_trajs(30, seed=5)
    df = trajectory_similarity_join(_df(spark, rows), 500.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_join_validation_and_edges(spark):
    rows = _mk_trajs(10, seed=3)
    with pytest.raises(ValueError):
        trajectory_similarity_join(_df(spark, rows), 100.0, metric="hausdorff")
    with pytest.raises(ValueError):
        trajectory_similarity_join(_df(spark, rows), -1.0)
    # far-apart trajectories: empty result, schema intact
    far = [(0, [{"lon": 8.5, "lat": 47.4}]), (1, [{"lon": 9.5, "lat": 48.4}])]
    out = trajectory_similarity_join(_df(spark, far), 50.0)
    assert out.count() == 0
    assert out.columns == ["id_a", "id_b", "dist_m"]
    # identical single-vertex trajectories: one pair at distance 0
    same = [(0, [{"lon": 8.5, "lat": 47.4}]), (1, [{"lon": 8.5, "lat": 47.4}])]
    got = trajectory_similarity_join(_df(spark, same), 1.0).collect()
    assert len(got) == 1 and got[0].dist_m == 0.0 and (got[0].id_a, got[0].id_b) == (0, 1)


def test_band_boundary_near_threshold_pair_not_dropped(spark):
    """Regression (review finding): the grid constant must match the
    haversine sphere. Two identical-shape trajectories 999.5 m apart in
    pure latitude, the southern start just below a band boundary with
    tau=1000 — with a 111,320 m/deg grid the starts land two bands
    apart and the pair silently vanishes."""
    tau = 1000.0
    # anchor the southern start ~0.3 m below a boundary of the WRONG
    # (111,320 m/deg) grid: under that grid the two starts land TWO
    # bands apart (dlat exceeds its cell height by ~0.64 m) and the
    # pair vanishes; under the haversine-consistent grid dlat <= cell
    # height, so the bands differ by at most one and the pair is found
    cell_wrong = tau / 111_320.0
    base_lat = 47.0
    lat0 = (math.floor(base_lat / cell_wrong) + 1) * cell_wrong - 0.3 / 111_194.93
    dlat = 999.5 / 111_194.93  # ~999.5 m north
    rows = [
        (0, [{"lon": 8.5, "lat": lat0}, {"lon": 8.501, "lat": lat0}]),
        (1, [{"lon": 8.5, "lat": lat0 + dlat}, {"lon": 8.501, "lat": lat0 + dlat}]),
    ]
    got = trajectory_similarity_join(_df(spark, rows), tau, metric="frechet").collect()
    assert len(got) == 1 and got[0].dist_m <= tau

    # and the streaming match side shares the geometry
    from trackintel_spark.streaming import index_trajectory_corpus, trajectory_match_stream

    cells, arrays = index_trajectory_corpus(_df(spark, rows[:1]), tau)
    m = trajectory_match_stream(_df(spark, rows[1:]), cells, arrays, tau).collect()
    assert len(m) == 1 and m[0].match_id == 0


def _seam_trajs(seed, lat0=20.0):
    """Trajectory pairs straddling the ±180° antimeridian: anchors on
    both sides within a few hundred meters of the line, plus controls
    well away from it."""
    rng = random.Random(seed)
    rows = []
    i = 0
    for side in (-1, 1):
        for _ in range(8):
            # 0..400 m from the line, on `side` of it
            off_deg = rng.uniform(0, 400.0) / (111_194.93 * math.cos(math.radians(lat0)))
            lon = side * (180.0 - off_deg)
            lat = lat0 + rng.uniform(-3e-3, 3e-3)
            pts = []
            for _ in range(rng.randint(2, 5)):
                pts.append({"lon": lon, "lat": lat})
                # drift that may itself cross the line
                lon += rng.uniform(-2e-3, 2e-3)
                if lon > 180.0:
                    lon -= 360.0
                elif lon < -180.0:
                    lon += 360.0
                lat += rng.uniform(-1e-3, 1e-3)
            rows.append((i, pts))
            i += 1
    # far controls (must never pair with the seam group)
    rows.append((i, [{"lon": 0.0, "lat": lat0}, {"lon": 0.001, "lat": lat0}]))
    return rows


def _brute_wrapped(rows, fn, tau):
    """Brute force in a seam-free frame: shift lons onto a continuous
    axis around ±180 (the DP kernels' haversine is periodic-safe, but
    the raw-degree arrays fed to `fn` must not jump by 360)."""
    out = {}
    arrs = {}
    for i, pts in rows:
        a = np.array([[p["lon"], p["lat"]] for p in pts], dtype=float)
        arrs[i] = a
    ids = sorted(arrs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = arrs[ids[x]].copy(), arrs[ids[y]].copy()
            # unwrap both onto the frame of a's first vertex
            ref = a[0, 0]
            for m in (a, b):
                m[:, 0] = np.where(m[:, 0] - ref > 180.0, m[:, 0] - 360.0, m[:, 0])
                m[:, 0] = np.where(m[:, 0] - ref < -180.0, m[:, 0] + 360.0, m[:, 0])
            d = fn(a, b)
            if d <= tau:
                out[(ids[x], ids[y])] = d
    return out


@pytest.mark.parametrize("metric,fn", [("frechet", frechet_distance), ("dtw", dtw_distance)])
@pytest.mark.parametrize("seed", [0, 7])
def test_antimeridian_pairs_not_missed(spark, metric, fn, seed):
    """Round-8 closure of the documented ±180° miss: the grid's cx now
    aliases modulo the band's cell count, so cross-seam candidates
    equi-join. Ground truth brute-forces in an unwrapped frame."""
    tau = 1500.0
    rows = _seam_trajs(seed)
    got = {
        (r.id_a, r.id_b): r.dist_m
        for r in trajectory_similarity_join(_df(spark, rows), tau, metric=metric).collect()
    }
    want = _brute_wrapped(rows, fn, tau)
    # non-vacuous: some qualifying pairs must genuinely straddle the line
    straddling = [
        (a, b) for (a, b) in want
        if any(p["lon"] > 179 for p in rows[a][1]) and any(p["lon"] < -179 for p in rows[b][1])
        or any(p["lon"] < -179 for p in rows[a][1]) and any(p["lon"] > 179 for p in rows[b][1])
    ]
    assert straddling, "fixture failed to produce cross-seam pairs"
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)


def test_antimeridian_streaming_match(spark):
    """The streaming matcher shares the wrapped grid: a probe on one
    side of the line matches a corpus trajectory on the other."""
    from trackintel_spark.streaming import index_trajectory_corpus, trajectory_match_stream

    corpus = [(0, [{"lon": 179.999, "lat": 10.0}, {"lon": 179.998, "lat": 10.001}])]
    probe = [(1, [{"lon": -179.999, "lat": 10.0}, {"lon": -179.998, "lat": 10.001}])]
    tau = 1000.0
    cells, arrays = index_trajectory_corpus(_df(spark, corpus), tau)
    m = trajectory_match_stream(_df(spark, probe), cells, arrays, tau).collect()
    assert len(m) == 1 and m[0].match_id == 0


# ---------------------------------------------------------------------------
# r13: batched wavefront DP == per-pair kernels, bit-for-bit
# ---------------------------------------------------------------------------


def test_batched_dp_bit_equal_to_per_pair():
    """The refine stages now group pairs by (len_a, len_b) and run ONE
    batched anti-diagonal DP per shape (r13). Every cell computes the
    identical float64 operations as the per-pair kernels, so results
    must be bit-equal — including degenerate 1-vertex trajectories."""
    from trackintel_spark.geogr.trajectory_distance import (
        _pairwise_distance_batched,
        dtw_distance_batch,
        frechet_distance_batch,
    )

    rng = np.random.default_rng(7)
    for fn, bfn in (
        (dtw_distance, dtw_distance_batch),
        (frechet_distance, frechet_distance_batch),
    ):
        la, pa, lb, pb, refs = [], [], [], [], []
        for _ in range(300):
            n = int(rng.integers(1, 60))
            m = int(rng.integers(1, 60))
            a = np.column_stack((rng.uniform(7, 9, n), rng.uniform(46, 48, n)))
            b = np.column_stack((rng.uniform(7, 9, m), rng.uniform(46, 48, m)))
            la.append(a[:, 0])
            pa.append(a[:, 1])
            lb.append(b[:, 0])
            pb.append(b[:, 1])
            refs.append(fn(a, b))
        out = _pairwise_distance_batched(la, pa, lb, pb, bfn)
        assert all(r == o for r, o in zip(refs, out))


def test_batched_dp_chunking_matches_unchunked(monkeypatch):
    """The cost-tensor cell cap splits big same-shape groups into
    chunks; chunked and unchunked paths must agree exactly."""
    import trackintel_spark.geogr.trajectory_distance as td

    rng = np.random.default_rng(11)
    la = [rng.uniform(7, 9, 20) for _ in range(64)]
    pa = [rng.uniform(46, 48, 20) for _ in range(64)]
    lb = [rng.uniform(7, 9, 25) for _ in range(64)]
    pb = [rng.uniform(46, 48, 25) for _ in range(64)]
    full = td._pairwise_distance_batched(la, pa, lb, pb, td.frechet_distance_batch)
    monkeypatch.setattr(td, "_BATCH_DP_MAX_CELLS", 20 * 25 * 7)  # 7 pairs/chunk
    chunked = td._pairwise_distance_batched(la, pa, lb, pb, td.frechet_distance_batch)
    assert np.array_equal(full, chunked)


def test_batched_dp_zero_vertex_matches_scalar():
    """Zero-vertex trajectories can't batch (zero-cell DP); they must
    route through the scalar kernel and reproduce its exact values
    (dtw: inf against an empty side, 0.0 for empty-vs-empty) instead
    of tripping the chunk sizing's division by the cell count."""
    from trackintel_spark.geogr.trajectory_distance import (
        _pairwise_distance_batched,
        dtw_distance,
        dtw_distance_batch,
    )

    la = [[8.0, 8.1], [], []]
    pa = [[47.0, 47.1], [], []]
    lb = [[], [8.0, 8.2], []]
    pb = [[], [47.0, 47.2], []]
    out = _pairwise_distance_batched(la, pa, lb, pb, dtw_distance_batch)
    refs = [
        dtw_distance(np.column_stack((la[i], pa[i])), np.column_stack((lb[i], pb[i])))
        for i in range(3)
    ]
    assert list(out) == refs
