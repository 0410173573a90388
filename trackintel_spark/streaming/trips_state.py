"""Exact ONLINE trip emission — applyInPandasWithState.

``trips_stream_exact`` completes the streaming mobility chain
(staypoints_stream_exact → triplegs_stream_exact → this): one stateful
operator over the raw positionfix stream that runs the staypoint scan,
classifies activities, and assembles TRIPS with the batch
``generate_trips`` boundary semantics (operators/trips.py; reference
preprocessing/triplegs.py:12-232):

* units = the settled staypoints and triplegs of the scan, in time
  order; staypoints are activities when duration > activity_threshold
  (create_activity_flag rule);
* a trip is a maximal run of NON-activity units between boundaries;
  boundaries are activities and tracking gaps
  (next.started_at − prev.finished_at > gap_threshold);
* origin = the last activity before the run (NULL after a gap or at
  stream start), destination = the first activity after it (NULL at a
  gap); trips containing no tripleg are dropped — all exactly the
  batch rules;
* a trip EMITS (append semantics) once its closing evidence — the
  destination activity, or a gap proven by the next settled fix — has
  arrived; open trips wait in state.

State per user = the scan state of triplegs_stream_exact (candidate
window + open travel buffer) + the open trip's units + the current
origin + a settled-time watermark. All bounded by dwell density ×
trip duration. Identity columns are timestamps (origin/destination
``started_at``), not ids — streams cannot assign the batch dense ids;
join on (user_id, started_at) to attach them downstream.

Results are invariant to micro-batch chopping and equal the batch
operator on the same closed history (pinned by
tests/test_streaming_trips.py against ``generate_trips`` itself).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState

from trackintel_spark.streaming.triplegs_state import _ingest_and_settle
from trackintel_spark.streaming.reorder import apply_with_reorder

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("started_at", T.TimestampType()),
        T.StructField("finished_at", T.TimestampType()),
        T.StructField("origin_started_at", T.TimestampType()),
        T.StructField("destination_started_at", T.TimestampType()),
        T.StructField("n_triplegs", T.IntegerType()),
        T.StructField("n_staypoints", T.IntegerType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        # scan state (see triplegs_state._ingest_and_settle)
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("lons", T.ArrayType(T.DoubleType())),
        T.StructField("lats", T.ArrayType(T.DoubleType())),
        T.StructField("n_travel", T.IntegerType()),
        # open-trip assembly: pending non-activity units
        T.StructField("u_kind", T.ArrayType(T.IntegerType())),  # 1 sp, 2 tripleg
        T.StructField("u_start_us", T.ArrayType(T.LongType())),
        T.StructField("u_end_us", T.ArrayType(T.LongType())),
        # current origin activity (-1 = none / gap)
        T.StructField("origin_start_us", T.LongType()),
        T.StructField("origin_end_us", T.LongType()),
        # settled-time watermark for the empty-scan-state edge
        T.StructField("wm_us", T.LongType()),
    ]
)

_SP, _TPL = 1, 2


def trips_stream_exact(
    pfs: DataFrame,
    dist_threshold: float = 100.0,
    time_threshold: float = 5.0,
    gap_threshold: float = 15.0,
    activity_threshold: float = 15.0,
    max_disorder: float = 0.0,
    late: str = "raise",
) -> DataFrame:
    """Streaming trip generation over (id, user_id, tracked_at, lon,
    lat) rows. ``gap_threshold`` plays the role of BOTH the scan's gap
    and the trip gap (minutes) — passing them separately is possible
    but the reference pipelines use one value. Works on a streaming OR
    batch DataFrame (unified API).

    ``max_disorder`` (minutes, default 0) opts into the bounded-
    disorder hold-and-sort buffer
    (:mod:`trackintel_spark.streaming.reorder`); ``late`` picks raise
    vs drop for arrivals beyond the bound."""
    time_s = time_threshold * 60.0
    gap_s = gap_threshold * 60.0
    act_s = activity_threshold * 60.0

    def fn(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            (ids, ts_us, lons, lats, n_travel,
             u_kind, u_start, u_end, origin_start, origin_end, wm_us) = state.get
            scan_state = (ids, ts_us, lons, lats, n_travel)
        else:
            scan_state = None
            u_kind, u_start, u_end = [], [], []
            origin_start, origin_end, wm_us = -1, -1, -1

        # The scan's own floor (candidate-window start) already protects
        # settled history whenever scan state exists — and it is LOOSER
        # than the last unit's end (a staypoint's finished_at is the
        # first fix OUTSIDE it, i.e. inside the next window), so
        # filtering against wm_us there would drop fixes the batch run
        # accepts. wm_us only guards the one unprotected case: scan
        # state fully consumed (empty) while trip state still pends.
        scan_empty = scan_state is None or not scan_state[1]

        def _wm_filter(it):
            for pdf in it:
                if scan_empty and wm_us >= 0:
                    floor = pd.Timestamp(wm_us, unit="us")
                    pdf = pdf[pdf["tracked_at"] >= floor]
                yield pdf

        full, sps, closed_runs, open_run, new_scan_state = _ingest_and_settle(
            user_id, scan_state, _wm_filter(batches), dist_threshold, time_s, gap_s
        )

        # ---- build new closed units, time-ordered -----------------------
        units = []  # (start_us, end_us, kind, is_activity)
        for _, sp in sps.iterrows():
            s = int(pd.Timestamp(sp["started_at"]).value // 1000)
            e = int(pd.Timestamp(sp["finished_at"]).value // 1000)
            units.append((s, e, _SP, (e - s) / 1e6 > act_s))
        ts_all = full["tracked_at"].to_numpy().astype("int64")
        for run in closed_runs:
            s = int(ts_all[run[0]] // 1000)
            e = int(ts_all[run[-1]] // 1000)
            units.append((s, e, _TPL, False))
        units.sort()

        # ---- trip assembly (batch generate_trips boundary rules) --------
        pend = list(zip(u_kind, u_start, u_end))  # (kind, start, end)
        origin = (origin_start, origin_end) if origin_start >= 0 else None
        out_rows = []

        def close_run(dest_start_us):
            nonlocal pend
            n_tpl = sum(1 for k, _, _ in pend if k == _TPL)
            if n_tpl:
                out_rows.append(
                    (
                        user_id,
                        pd.Timestamp(pend[0][1], unit="us"),
                        pd.Timestamp(pend[-1][2], unit="us"),
                        pd.Timestamp(origin[0], unit="us") if origin else None,
                        pd.Timestamp(dest_start_us, unit="us")
                        if dest_start_us is not None
                        else None,
                        n_tpl,
                        len(pend) - n_tpl,
                    )
                )
            pend = []

        for s, e, kind, is_act in units:
            prev_end = pend[-1][2] if pend else (origin[1] if origin else None)
            if prev_end is not None and (s - prev_end) / 1e6 > gap_s:
                close_run(None)
                origin = None
            if is_act:
                close_run(s)
                origin = (s, e)
            else:
                pend.append((kind, s, e))

        # ---- end-of-batch: close on a PROVEN future gap ------------------
        # earliest possible start of any future unit = the open travel
        # run's first fix, else the candidate window's first fix
        nxt_floor_us = None
        if len(open_run):
            nxt_floor_us = int(ts_all[open_run[0]] // 1000)
        elif len(new_scan_state[1]) > new_scan_state[4]:
            nxt_floor_us = int(new_scan_state[1][new_scan_state[4]])
        last_end = pend[-1][2] if pend else (origin[1] if origin else None)
        if (
            nxt_floor_us is not None
            and last_end is not None
            and (nxt_floor_us - last_end) / 1e6 > gap_s
        ):
            close_run(None)
            origin = None

        new_wm = wm_us
        if units:
            new_wm = max(new_wm, units[-1][1])
        state.update(
            (
                *new_scan_state,
                [int(k) for k, _, _ in pend],
                [int(s) for _, s, _ in pend],
                [int(e) for _, _, e in pend],
                int(origin[0]) if origin else -1,
                int(origin[1]) if origin else -1,
                int(new_wm),
            )
        )
        if out_rows:
            yield pd.DataFrame(out_rows, columns=[f.name for f in _OUT_SCHEMA.fields])

    return apply_with_reorder(
        pfs, ("user_id",), fn, _OUT_SCHEMA, _STATE_SCHEMA,
        time_col="tracked_at", max_disorder_s=max_disorder * 60.0, late=late,
    )
