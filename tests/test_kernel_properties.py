"""Property-based differential tests for the sequential kernels.

Each optimized numpy kernel is checked against a deliberately naive,
line-by-line transparent reimplementation of the reference semantics on
hypothesis-generated traces. Pure pandas/numpy — no Spark session — so
hundreds of random cases run in seconds.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from trackintel_spark.operators.staypoints import _sliding_kernel
from trackintel_spark.operators.tours import _tours_kernel


def _hav(lon1, lat1, lon2, lat2):
    arg = math.cos(math.radians(lat1) - math.radians(lat2)) - math.cos(
        math.radians(lat1)
    ) * math.cos(math.radians(lat2)) * (1 - math.cos(math.radians(lon1) - math.radians(lon2)))
    return 6371000.0 * math.acos(min(1.0, max(-1.0, arg)))


# --- naive staypoint scan (reference preprocessing/positionfixes.py:478-535) ---

def naive_staypoints(ts, lon, lat, dist_m, time_s, gap_s, include_last):
    out = []
    n = len(ts)
    if n == 0:
        return out
    start = 0
    curr = 0
    for curr in range(1, n):
        if ts[curr] - ts[curr - 1] > gap_s:
            start = curr
            continue
        if _hav(lon[start], lat[start], lon[curr], lat[curr]) >= dist_m:
            if ts[curr] - ts[start] >= time_s:
                out.append((start, curr, curr))  # [start, curr) closed by curr
            start = curr
    if include_last and ts[curr] - ts[start] >= time_s:
        out.append((start, curr, None))
    return out


trace = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),    # time delta (minutes)
        st.integers(min_value=0, max_value=4),     # grid x
        st.integers(min_value=0, max_value=3),     # grid y
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(trace, st.booleans())
def test_sliding_kernel_matches_naive(steps, include_last):
    t = 0
    rows = []
    for i, (dt, gx, gy) in enumerate(steps):
        t += dt * 60
        rows.append((i, t, 8.0 + gx * 0.01, 47.0 + gy * 0.01))
    pdf = pd.DataFrame(rows, columns=["id", "sec", "lon", "lat"])
    pdf["tracked_at"] = pd.to_datetime(pdf["sec"], unit="s")
    pdf["user_id"] = 7
    pdf["elevation"] = None

    got = _sliding_kernel(
        pdf,
        dist_threshold=500.0,
        time_threshold_s=10 * 60.0,
        gap_threshold_s=60 * 60.0,
        include_last=include_last,
        elevation_flag=False,
    )
    exp = naive_staypoints(
        pdf["sec"].to_numpy().astype(float),
        pdf["lon"].to_numpy(),
        pdf["lat"].to_numpy(),
        500.0,
        10 * 60.0,
        60 * 60.0,
        include_last,
    )
    assert len(got) == len(exp)
    for (_, row), (s, e, closer) in zip(got.iterrows(), exp):
        assert row["started_at"] == pdf["tracked_at"].iloc[s]
        assert row["finished_at"] == pdf["tracked_at"].iloc[e]
        stop = len(pdf) if closer is None else e
        assert row["pfs_ids"] == list(range(s, stop))


# --- naive tour scan (reference preprocessing/trips.py:191-359) ---------------

def naive_tours(trips, max_time_s, max_nr_gaps):
    """trips: list of (start_s, end_s, o_loc, d_loc); locations may be None.
    Returns list of (first_idx, last_idx) member spans."""
    GAP = -1
    cand: list[int] = []
    out = []
    for i, (si, ei, oi, di) in enumerate(trips):
        if cand:
            prev = cand[-1]
            pd_loc = trips[prev][3]
            chained = pd_loc is not None and oi is not None and pd_loc == oi
            if not chained:
                if max_nr_gaps == 0:
                    cand = [i]
                    continue
                cand.append(GAP)
        cand.append(i)
        if di is None:
            continue
        new_start = 0
        gaps = 0
        for j, c in enumerate(reversed(cand)):
            if c == GAP:
                gaps += 1
                if gaps > max_nr_gaps:
                    new_start = j + 1
                    break
                continue
            if ei - trips[c][0] > max_time_s:
                new_start = len(cand) - j - 1
                break
            if trips[c][2] is None:
                continue
            if trips[c][2] == di:
                members = [m for m in cand[-j - 1:] if m != GAP]
                out.append((members[0], members[-1], members))
                break
        cand = cand[new_start:]
    return out


tour_trace = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=180),             # gap to next trip (min)
        st.integers(min_value=5, max_value=120),             # duration (min)
        st.one_of(st.none(), st.integers(0, 3)),             # origin loc
        st.one_of(st.none(), st.integers(0, 3)),             # dest loc
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=200, deadline=None)
@given(tour_trace, st.integers(min_value=0, max_value=2))
def test_tours_kernel_matches_naive(steps, max_nr_gaps):
    t = 0
    rows = []
    for i, (gap, dur, o, d) in enumerate(steps):
        start = t + gap * 60
        end = start + dur * 60
        t = end
        rows.append((i, start, end, o, d))
    pdf = pd.DataFrame(rows, columns=["id", "s", "e", "o", "d"])
    pdf["user_id"] = 3
    pdf["started_at"] = pd.to_datetime(pdf["s"], unit="s")
    pdf["finished_at"] = pd.to_datetime(pdf["e"], unit="s")
    # every trip has known endpoint staypoints; location may be unknown
    pdf["origin_staypoint_id"] = pdf["id"] * 2
    pdf["destination_staypoint_id"] = pdf["id"] * 2 + 1
    pdf["origin_loc"] = pdf["o"].astype("float64")
    pdf["dest_loc"] = pdf["d"].astype("float64")
    # unknown location -> the kernel treats NaN staypoint as unknown too
    pdf.loc[pdf["o"].isna(), "origin_staypoint_id"] = np.nan
    pdf.loc[pdf["d"].isna(), "destination_staypoint_id"] = np.nan

    got = _tours_kernel(
        pdf, use_locations=True, max_dist=100.0, max_time_s=6 * 3600.0, max_nr_gaps=max_nr_gaps
    )
    trips = [
        (r.s, r.e, None if pd.isna(r.o) else int(r.o), None if pd.isna(r.d) else int(r.d))
        for r in pdf.itertuples()
    ]
    exp = naive_tours(trips, 6 * 3600.0, max_nr_gaps)
    assert len(got) == len(exp)
    for (_, row), (first, last, members) in zip(got.iterrows(), exp):
        assert row["started_at"] == pdf["started_at"].iloc[first]
        assert row["finished_at"] == pdf["finished_at"].iloc[last]
        assert row["trips"] == members


# --- merge_staypoints: single-pass running sum == iterated fixpoint ----------

def naive_merge_fixpoint(sps, tpl_starts, gap_s):
    """Reference-style iterated merging (preprocessing/staypoints.py:
    328-344): repeatedly merge any adjacent mergeable pair until nothing
    changes. sps: [(id, started, finished, loc)] one user."""
    cur = sorted([list(s) for s in sps], key=lambda s: (s[1], s[0]))
    tpl_starts = sorted(tpl_starts)

    def blocked(a, b):
        # a tripleg starting in [a.started, b.started) sits between them
        # in the (started_at, type) interleave (staypoint sorts first)
        return any(a[1] <= t < b[1] for t in tpl_starts)

    changed = True
    while changed:
        changed = False
        for i in range(len(cur) - 1):
            a, b = cur[i], cur[i + 1]
            if (
                a[3] is not None
                and b[3] is not None
                and a[3] == b[3]
                and b[1] - a[2] <= gap_s
                and not blocked(a, b)
            ):
                merged = [min(a[0], b[0]), a[1], max(a[2], b[2]), a[3]]
                cur[i : i + 2] = [merged]
                changed = True
                break
    return {(s[0], s[1], s[2], s[3]) for s in cur}


def test_merge_staypoints_single_pass_equals_fixpoint(spark):
    import random

    from pyspark.sql import functions as F

    from trackintel_spark.operators import merge_staypoints

    rng = random.Random(20260813)
    sp_rows, tpl_rows, expected = [], [], {}
    sid = 0
    for scenario in range(40):
        user = scenario
        t = 0
        sps, tpls = [], []
        for _ in range(rng.randint(2, 15)):
            t += rng.randint(1, 25) * 60
            dur = rng.randint(5, 30) * 60
            loc = rng.choice([None, 1, 1, 1, 2])  # bias towards chains
            sps.append((sid, t, t + dur, loc))
            if rng.random() < 0.25:
                tpls.append(t + dur + rng.randint(0, 10) * 60)
            sid += 1
            t += dur
        expected[user] = naive_merge_fixpoint(sps, tpls, gap_s=600.0)
        sp_rows += [(i, user, s, e, loc) for (i, s, e, loc) in sps]
        tpl_rows += [(user, ts) for ts in tpls]

    sp = spark.createDataFrame(
        sp_rows, "id long, user_id long, s long, e long, location_id long"
    ).select(
        "id", "user_id",
        F.timestamp_seconds(F.col("s") + 1700000000).alias("started_at"),
        F.timestamp_seconds(F.col("e") + 1700000000).alias("finished_at"),
        "location_id",
        F.struct(F.lit(8.5).alias("lon"), F.lit(47.4).alias("lat")).alias("geom"),
    )
    tpl = spark.createDataFrame(tpl_rows or [(0, 0)], "user_id long, s long").select(
        "user_id", F.timestamp_seconds(F.col("s") + 1700000000).alias("started_at")
    )
    if not tpl_rows:
        tpl = tpl.filter(F.lit(False))

    got_rows = merge_staypoints(sp, tpl, max_time_gap=10.0).collect()
    got: dict[int, set] = {}
    for r in got_rows:
        got.setdefault(r.user_id, set()).add(
            (
                r.id,
                int(r.started_at.timestamp()) - 1700000000,
                int(r.finished_at.timestamp()) - 1700000000,
                r.location_id,
            )
        )
    assert got == expected


# --- tour scan, geometry (max_dist) mode --------------------------------------

def naive_tours_geometry(trips, max_dist, max_time_s, max_nr_gaps):
    """trips: (start_s, end_s, o_lon, o_lat, d_lon, d_lat); endpoints
    chain/close when within max_dist meters (reference _check_max_dist)."""
    GAP = -1
    cand: list[int] = []
    out = []
    for i, t in enumerate(trips):
        si, ei = t[0], t[1]
        if cand:
            p = trips[cand[-1]]
            chained = _hav(p[4], p[5], t[2], t[3]) <= max_dist
            if not chained:
                if max_nr_gaps == 0:
                    cand = [i]
                    continue
                cand.append(GAP)
        cand.append(i)
        new_start = 0
        gaps = 0
        for j, c in enumerate(reversed(cand)):
            if c == GAP:
                gaps += 1
                if gaps > max_nr_gaps:
                    new_start = j + 1
                    break
                continue
            if ei - trips[c][0] > max_time_s:
                new_start = len(cand) - j - 1
                break
            if _hav(trips[c][2], trips[c][3], t[4], t[5]) <= max_dist:
                members = [m for m in cand[-j - 1:] if m != GAP]
                out.append((members[0], members[-1], members))
                break
        cand = cand[new_start:]
    return out


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=120),  # gap to next (min)
            st.integers(min_value=5, max_value=60),   # duration (min)
            st.integers(0, 3), st.integers(0, 2),     # origin grid cell
            st.integers(0, 3), st.integers(0, 2),     # dest grid cell
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=0, max_value=1),
)
def test_tours_kernel_geometry_mode_matches_naive(steps, max_nr_gaps):
    t = 0
    rows = []
    for i, (gap, dur, ox, oy, dx, dy) in enumerate(steps):
        start = t + gap * 60
        end = start + dur * 60
        t = end
        rows.append((i, start, end, 8.0 + ox * 0.01, 47.0 + oy * 0.01, 8.0 + dx * 0.01, 47.0 + dy * 0.01))
    pdf = pd.DataFrame(rows, columns=["id", "s", "e", "o_lon", "o_lat", "d_lon", "d_lat"])
    pdf["user_id"] = 5
    pdf["started_at"] = pd.to_datetime(pdf["s"], unit="s")
    pdf["finished_at"] = pd.to_datetime(pdf["e"], unit="s")
    pdf["origin_staypoint_id"] = pdf["id"] * 2
    pdf["destination_staypoint_id"] = pdf["id"] * 2 + 1

    got = _tours_kernel(
        pdf, use_locations=False, max_dist=200.0, max_time_s=5 * 3600.0, max_nr_gaps=max_nr_gaps
    )
    trips = [(r.s, r.e, r.o_lon, r.o_lat, r.d_lon, r.d_lat) for r in pdf.itertuples()]
    exp = naive_tours_geometry(trips, 200.0, 5 * 3600.0, max_nr_gaps)
    assert len(got) == len(exp)
    for (_, row), (first, last, members) in zip(got.iterrows(), exp):
        assert row["started_at"] == pdf["started_at"].iloc[first]
        assert row["finished_at"] == pdf["finished_at"].iloc[last]
        assert row["trips"] == members


# --- jitter-band staypoints: distances straddle dist_threshold ---------------
#
# The coarse-grid case above places points either ~0 m or >1 km apart,
# far from the 500 m threshold, so threshold comparisons never decide a
# case. Here the grid pitch is ~22-39 m and dist_threshold=100 m, so
# the start-anchored sliding window constantly crosses the threshold in
# both directions — the parameterization the closed-form driver oracles
# cannot reach (VERDICT r2 follow-up).

fine_trace = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=18),   # time delta (minutes)
        st.integers(min_value=0, max_value=7),    # grid x (~30 m pitch)
        st.integers(min_value=0, max_value=7),    # grid y (~39 m pitch)
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(fine_trace, st.booleans())
def test_sliding_kernel_matches_naive_near_threshold(steps, include_last):
    t = 0
    rows = []
    for i, (dt, gx, gy) in enumerate(steps):
        t += dt * 60
        rows.append((i, t, 8.0 + gx * 0.0003, 47.0 + gy * 0.00035))
    pdf = pd.DataFrame(rows, columns=["id", "sec", "lon", "lat"])
    pdf["tracked_at"] = pd.to_datetime(pdf["sec"], unit="s")
    pdf["user_id"] = 7
    pdf["elevation"] = None

    got = _sliding_kernel(
        pdf,
        dist_threshold=100.0,
        time_threshold_s=10 * 60.0,
        gap_threshold_s=45 * 60.0,
        include_last=include_last,
        elevation_flag=False,
    )
    exp = naive_staypoints(
        pdf["sec"].to_numpy().astype(float),
        pdf["lon"].to_numpy(),
        pdf["lat"].to_numpy(),
        100.0,
        10 * 60.0,
        45 * 60.0,
        include_last,
    )
    assert len(got) == len(exp)
    for (_, row), (s, e, closer) in zip(got.iterrows(), exp):
        assert row["started_at"] == pdf["tracked_at"].iloc[s]
        assert row["finished_at"] == pdf["tracked_at"].iloc[e]
        stop = len(pdf) if closer is None else e
        assert row["pfs_ids"] == list(range(s, stop))
