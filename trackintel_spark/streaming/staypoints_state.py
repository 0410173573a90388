"""Exact ONLINE staypoint detection — applyInPandasWithState.

``staypoints_stream_exact`` runs the same Li et al. sliding scan as the
batch ``generate_staypoints`` (operators/staypoints.py) incrementally
over a positionfix stream. Per user, the state is exactly the scan's
open candidate window — the points from the current anchor onward that
a future fix could still extend into a staypoint. Each micro-batch:

1. prepend the retained window to the batch's fixes (event-time order);
2. run the unchanged batch kernel; every staypoint whose CLOSING fix
   has arrived is emitted — output rows are final, never updated
   (append semantics);
3. retain the kernel's final anchor window as the new state.

Because a staypoint only ever closes when a later fix arrives (the
batch semantics with ``include_last=False``), no timeout is needed for
correctness: results are identical to running the batch operator over
the full history, regardless of how the stream is chopped into
micro-batches. State size is bounded by the densest dwell a user can
record within one candidate window — fixes/minute x dwell duration.

Out-of-order input: fixes older than the retained anchor cannot be
replayed (the anchor may already have advanced past them) and are
dropped — the streaming analog of a watermark, made explicit here.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState

from trackintel_spark.operators.staypoints import _is_time_id_sorted, _sliding_kernel
from trackintel_spark.streaming.reorder import apply_with_reorder

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("started_at", T.TimestampType()),
        T.StructField("finished_at", T.TimestampType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("n_pfs", T.IntegerType()),
    ]
)

# open candidate window, columnar: ids, epoch-us timestamps, coords
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("lons", T.ArrayType(T.DoubleType())),
        T.StructField("lats", T.ArrayType(T.DoubleType())),
    ]
)


def staypoints_stream_exact(
    pfs: DataFrame,
    dist_threshold: float = 100.0,
    time_threshold: float = 5.0,
    gap_threshold: float = 15.0,
    max_disorder: float = 0.0,
    late: str = "raise",
) -> DataFrame:
    """Streaming-exact generate_staypoints over (id, user_id,
    tracked_at, lon, lat) rows. Thresholds in the reference's units
    (meters / minutes). Works on a streaming OR batch DataFrame — the
    unified API keeps one code path testable both ways.

    ``max_disorder`` (minutes, default 0) opts into the bounded-
    disorder hold-and-sort buffer
    (:mod:`trackintel_spark.streaming.reorder`): fixes jittering up to
    that bound across micro-batches are re-sorted before the scan;
    beyond the bound the query raises (``late='raise'``) or falls back
    to this kernel's native drop-behind-the-anchor watermark
    (``late='drop'``)."""
    time_s = time_threshold * 60.0
    gap_s = gap_threshold * 60.0

    def fn(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            ids, ts_us, lons, lats = state.get
        else:
            ids, ts_us, lons, lats = [], [], [], []

        # state frame built from typed numpy arrays (r13, guide §4.2):
        # equivalent to the former per-column Series + to_datetime
        # construction (int64 epoch-µs -> datetime64[us] -> [ns] is
        # exactly to_datetime(unit="us")) at a fraction of the per-group
        # overhead — this body runs once per user per micro-batch.
        frames = []
        if ids:
            frames.append(
                pd.DataFrame(
                    {
                        "id": np.asarray(ids, dtype="int64"),
                        "tracked_at": np.asarray(ts_us, dtype="int64")
                        .astype("datetime64[us]")
                        .astype("datetime64[ns]"),
                        "lon": np.asarray(lons, dtype="float64"),
                        "lat": np.asarray(lats, dtype="float64"),
                    }
                )
            )
        for pdf in batches:
            frames.append(pdf[["id", "tracked_at", "lon", "lat"]])
        if not frames:
            full = pd.DataFrame(columns=["id", "tracked_at", "lon", "lat"])
        elif len(frames) == 1:
            full = frames[0]
        else:
            full = pd.concat(frames, ignore_index=True)
        # drop late fixes that precede the retained anchor — they can no
        # longer influence the scan (explicit watermark semantics)
        if ts_us:
            floor_ts = pd.Timestamp(ts_us[0], unit="us")
            full = full[full["tracked_at"] >= floor_ts]
        # stable (tracked_at, id) order; skip the lexsort when already
        # ordered (state is sorted by construction and time-ordered
        # sources arrive sorted — the common case)
        if not _is_time_id_sorted(
            full["tracked_at"].to_numpy(), full["id"].to_numpy()
        ):
            full = full.sort_values(["tracked_at", "id"], kind="stable")
        full = full.reset_index(drop=True)
        full["user_id"] = user_id
        # NOTE: no "elevation" column — the kernel only reads it when
        # elevation_flag=True; building an all-None object column per
        # group was pure overhead

        tail: list[int] = []
        out = _sliding_kernel(
            full,
            dist_threshold=dist_threshold,
            time_threshold_s=time_s,
            gap_threshold_s=gap_s,
            include_last=False,
            elevation_flag=False,
            tail_out=tail,
        )
        keep = full.iloc[tail[0]:] if len(full) else full
        # vectorized state extraction: datetime64[ns] -> int64 ns
        # // 1000 is exactly Timestamp.value // 1000 per row
        state.update(
            (
                keep["id"].to_numpy(dtype="int64").tolist(),
                (keep["tracked_at"].to_numpy().astype("int64") // 1000).tolist(),
                keep["lon"].to_numpy(dtype="float64").tolist(),
                keep["lat"].to_numpy(dtype="float64").tolist(),
            )
        )
        if len(out):
            yield pd.DataFrame(
                {
                    "user_id": out["user_id"],
                    "started_at": out["started_at"],
                    "finished_at": out["finished_at"],
                    "lon": out["lon"],
                    "lat": out["lat"],
                    "n_pfs": out["pfs_ids"].map(len).astype("int32"),
                }
            )

    return apply_with_reorder(
        pfs, ("user_id",), fn, _OUT_SCHEMA, _STATE_SCHEMA,
        time_col="tracked_at", max_disorder_s=max_disorder * 60.0, late=late,
    )
