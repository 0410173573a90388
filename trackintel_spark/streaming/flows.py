"""Windowed origin–destination flow aggregation over a TRIPS stream.

The batch :func:`trackintel_spark.analysis.flows.origin_destination_matrix`
collapses all of history into one matrix; a live mobility dashboard
wants flows PER TIME WINDOW with bounded state — the canonical
Structured Streaming watermark + tumbling-window aggregation:

* event time = the trip's ``started_at``;
* ``withWatermark`` bounds how late a trip may arrive and still be
  counted — the engine drops later arrivals AND evicts closed windows
  from the aggregation state, so state is proportional to
  (open windows) x (active OD pairs), not stream length;
* zone resolution is the same stream-static staypoint->zone equi-join
  the tours stage uses (small static side, broadcast-able).

Append mode emits each (window, origin, destination) row once, when
the watermark passes the window end — rows are final, ready for a
flow-map sink. On a batch frame the same groupBy runs directly (the
watermark is a no-op there) so batch == stream on closed history,
pinned by tests/test_streaming_flows.py.

The reference is batch-only (it stops at generate_trips); this is an
extension surface, like the rest of this package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def od_flows_stream(
    trips: DataFrame,
    staypoints: DataFrame | None = None,
    by: str = "location_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
    drop_self_loops: bool = False,
) -> DataFrame:
    """Per-window OD flow counts for a trips stream (or batch frame —
    unified API). ``staypoints`` (static, with ``id`` and ``by``
    columns) maps ``origin_staypoint_id`` / ``destination_staypoint_id``
    to zones; ``None`` aggregates on raw staypoint ids. NULL endpoints
    (gap trips) aggregate under a NULL zone, like the batch operator.

    Returns (window_start, window_end, origin, destination, n_trips).
    """
    t = trips
    if staypoints is not None:
        zone = staypoints.select(F.col("id").alias("__sp"), F.col(by).alias("__zone"))
        t = (
            t.join(
                zone.select(F.col("__sp").alias("origin_staypoint_id"),
                            F.col("__zone").alias("__o")),
                on="origin_staypoint_id", how="left",
            )
            .join(
                zone.select(F.col("__sp").alias("destination_staypoint_id"),
                            F.col("__zone").alias("__d")),
                on="destination_staypoint_id", how="left",
            )
        )
    else:
        t = t.withColumn("__o", F.col("origin_staypoint_id")).withColumn(
            "__d", F.col("destination_staypoint_id")
        )
    if drop_self_loops:
        t = t.filter(
            ~(F.col("__o").eqNullSafe(F.col("__d"))) | F.col("__o").isNull()
        )
    if t.isStreaming:
        t = t.withWatermark("started_at", watermark)
    out = (
        t.groupBy(
            F.window(F.col("started_at"), window).alias("__w"),
            F.col("__o").alias("origin"),
            F.col("__d").alias("destination"),
        )
        .agg(F.count(F.lit(1)).alias("n_trips"))
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            "origin", "destination", "n_trips",
        )
    )
    return out
