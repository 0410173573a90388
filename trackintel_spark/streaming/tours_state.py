"""Exact ONLINE tour emission — applyInPandasWithState.

``tours_stream_exact`` completes the streaming mobility chain
(staypoints → triplegs → trips → THIS): tours close the moment their
closing trip arrives (the reference scan needs no future evidence —
preprocessing/trips.py:291-336), so unlike trips there is no
watermark/pending logic: state is exactly the reference candidate
stack, bounded by the ``max_time`` window (stale candidates are pruned
by the scan itself), plus the per-user emission counter.

The per-trip transition is the SAME ``_scan_step`` the batch
``generate_tours`` kernel executes (operators/tours.py) — batch ≡
stream by construction, pinned across arbitrary micro-batch splits by
tests/test_streaming_tours.py.

Input: a stream of TRIPS with the kernel columns — ``id, user_id,
started_at, finished_at, origin_staypoint_id,
destination_staypoint_id`` plus either ``origin_loc``/``dest_loc``
(locations mode; resolve them with a stream-static join against the
locations-labeled staypoints, see :func:`attach_trip_locations`) or a
``geom`` struct of origin/dest points (max_dist mode). Trips must
arrive per-user in ``started_at`` order across micro-batches (each
batch is sorted internally) — upstream ``trips_stream_exact`` emits in
order. The contract is ENFORCED: the last processed ``started_at`` is
kept in state and an out-of-order arrival raises instead of silently
corrupting the candidate stack.

Output: (user_id, seq, started_at, finished_at, origin_staypoint_id,
destination_staypoint_id, location_id, trips) — ``seq`` is the dense
per-user tour index, identical to the batch kernel's pre-``dense_id``
ordering; streams cannot assign the global dense ids, join on
(user_id, seq) to attach them downstream.

State per user: the candidate stack as parallel arrays (GAP markers
encoded as id = -1 rows) — bounded by trips-per-``max_time``-window —
and ``n_emitted``.
"""

from __future__ import annotations

import math
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState

from trackintel_spark.operators.tours import _GAP, _Trip, _scan_step, _tour_row, _trip_records
from trackintel_spark.streaming.reorder import apply_with_reorder

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("started_at", T.TimestampType()),
        T.StructField("finished_at", T.TimestampType()),
        T.StructField("origin_staypoint_id", T.LongType()),
        T.StructField("destination_staypoint_id", T.LongType()),
        T.StructField("location_id", T.LongType()),
        T.StructField("trips", T.ArrayType(T.LongType())),
    ]
)

# candidate stack as parallel arrays; a GAP marker is id = -1 with NaNs.
# NOTE: any change to this schema (last_start_us was ADDED for the
# out-of-order guard) is checkpoint-incompatible — a running query
# restarted from a pre-change checkpoint fails its first stateful batch.
# Restart such queries with a fresh checkpoint directory (replaying the
# source from the last committed offset of the OLD sink, the standard
# Structured Streaming state-schema-evolution procedure).
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("c_id", T.ArrayType(T.LongType())),
        T.StructField("c_start_us", T.ArrayType(T.LongType())),
        T.StructField("c_end_us", T.ArrayType(T.LongType())),
        T.StructField("c_ostp", T.ArrayType(T.DoubleType())),
        T.StructField("c_dstp", T.ArrayType(T.DoubleType())),
        T.StructField("c_oloc", T.ArrayType(T.DoubleType())),
        T.StructField("c_dloc", T.ArrayType(T.DoubleType())),
        T.StructField("c_olon", T.ArrayType(T.DoubleType())),
        T.StructField("c_olat", T.ArrayType(T.DoubleType())),
        T.StructField("c_dlon", T.ArrayType(T.DoubleType())),
        T.StructField("c_dlat", T.ArrayType(T.DoubleType())),
        T.StructField("last_start_us", T.LongType()),
        T.StructField("n_emitted", T.LongType()),
    ]
)

# sentinel "no trip processed yet" — below any real epoch-µs
_NEVER_US = -(1 << 62)


def _pack(candidates: list) -> tuple:
    cols: list[list] = [[] for _ in range(11)]
    for c in candidates:
        if c is _GAP:
            row = (-1, -1, -1, math.nan, math.nan, math.nan, math.nan,
                   math.nan, math.nan, math.nan, math.nan)
        else:
            row = (
                c.id, c.start_us, c.end_us,
                math.nan if c.o_stp is None else float(c.o_stp),
                math.nan if c.d_stp is None else float(c.d_stp),
                math.nan if c.o_loc is None else float(c.o_loc),
                math.nan if c.d_loc is None else float(c.d_loc),
                c.o_lon, c.o_lat, c.d_lon, c.d_lat,
            )
        for col, v in zip(cols, row):
            col.append(v)
    return tuple(cols)


def _unpack(packed: tuple) -> list:
    def _i(v):
        return None if v != v else int(v)  # NaN check

    out = []
    for (cid, s, e, ostp, dstp, oloc, dloc, olon, olat, dlon, dlat) in zip(*packed):
        if cid == -1:
            out.append(_GAP)
        else:
            out.append(_Trip(int(cid), int(s), int(e), _i(ostp), _i(dstp),
                             _i(oloc), _i(dloc), float(olon), float(olat),
                             float(dlon), float(dlat)))
    return out


def attach_trip_locations(trips: DataFrame, staypoints: DataFrame) -> DataFrame:
    """Resolve ``origin_loc``/``dest_loc`` onto a TRIPS STREAM with two
    stream-static equi-joins against the (static) staypoint->location
    map. The batch operator melts to ONE join (operators/tours.py), but
    a streaming groupBy-pivot would add an aggregation state store;
    two broadcast-able stream-static joins are the streaming-native
    shape."""
    sp_loc = staypoints.select(F.col("id").alias("__sp"), F.col("location_id").alias("__loc"))
    out = (
        trips.join(
            sp_loc.select(F.col("__sp").alias("origin_staypoint_id"),
                          F.col("__loc").alias("origin_loc")),
            on="origin_staypoint_id", how="left",
        )
        .join(
            sp_loc.select(F.col("__sp").alias("destination_staypoint_id"),
                          F.col("__loc").alias("dest_loc")),
            on="destination_staypoint_id", how="left",
        )
    )
    return out


def tours_stream_exact(
    trips: DataFrame,
    max_dist: float = 100.0,
    max_time: float = 1440.0,
    max_nr_gaps: int = 0,
    max_disorder: float = 0.0,
) -> DataFrame:
    """Streaming tour generation. Locations mode when the input carries
    ``origin_loc``/``dest_loc`` (see :func:`attach_trip_locations`),
    else max_dist mode from the ``geom`` origin/dest struct. Works on a
    streaming OR batch DataFrame (unified API); ``max_time`` in
    minutes, like batch :func:`generate_tours`.

    ``max_disorder`` (minutes, default 0 = strict order) opts into the
    bounded-disorder hold-and-sort buffer
    (:mod:`trackintel_spark.streaming.reorder`): trips jittering up to
    that bound across micro-batches are re-sorted before hitting the
    candidate-stack scan; beyond the bound the query still raises."""
    use_locations = "origin_loc" in trips.columns and "dest_loc" in trips.columns
    max_time_s = max_time * 60.0

    if use_locations:
        kin = trips.select(
            "id", "user_id", "started_at", "finished_at",
            "origin_staypoint_id", "destination_staypoint_id",
            "origin_loc", "dest_loc",
        )
    else:
        if "geom" not in trips.columns:
            raise ValueError(
                "trips must carry origin_loc/dest_loc (locations mode) or a "
                "'geom' origin/dest struct (max_dist mode)"
            )
        kin = trips.select(
            "id", "user_id", "started_at", "finished_at",
            "origin_staypoint_id", "destination_staypoint_id",
            F.col("geom.origin.lon").alias("o_lon"),
            F.col("geom.origin.lat").alias("o_lat"),
            F.col("geom.dest.lon").alias("d_lon"),
            F.col("geom.dest.lat").alias("d_lat"),
        )

    def fn(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            *packed, last_start_us, n_emitted = state.get
            candidates = _unpack(tuple(packed))
        else:
            candidates, last_start_us, n_emitted = [], _NEVER_US, 0

        rows = []
        pdf_all = pd.concat(list(batches), ignore_index=True)
        recs = _trip_records(pdf_all, use_locations)
        # enforce the documented per-user ordering contract: a trip that
        # starts BEFORE one already folded into the candidate stack in a
        # previous micro-batch would silently corrupt the scan state —
        # fail loudly instead (the batch itself is sorted internally).
        if recs and recs[0].start_us < last_start_us:
            raise ValueError(
                f"tours_stream_exact: out-of-order trip for user {user_id}: "
                f"trip id {recs[0].id} starts at {recs[0].start_us} µs but a "
                f"trip starting at {last_start_us} µs was already processed "
                "in an earlier micro-batch; trips must arrive per-user in "
                "started_at order (upstream trips_stream_exact emits in order)"
            )
        for rec in recs:
            candidates, members = _scan_step(
                candidates, rec, use_locations, max_dist, max_time_s, max_nr_gaps
            )
            if members is not None:
                r = _tour_row(members, n_emitted, use_locations)
                n_emitted += 1
                rows.append(
                    (
                        user_id, r["seq"], r["started_at"], r["finished_at"],
                        r["origin_staypoint_id"], r["destination_staypoint_id"],
                        r["location_id"], r["trips"],
                    )
                )

        if recs:
            last_start_us = recs[-1].start_us
        state.update((*_pack(candidates), int(last_start_us), int(n_emitted)))
        if rows:
            yield pd.DataFrame(rows, columns=[f.name for f in _OUT_SCHEMA.fields])

    return apply_with_reorder(
        kin, ("user_id",), fn, _OUT_SCHEMA, _STATE_SCHEMA,
        time_col="started_at", max_disorder_s=max_disorder * 60.0,
    )
