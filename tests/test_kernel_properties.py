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
