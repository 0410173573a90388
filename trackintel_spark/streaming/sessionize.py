"""Structured Streaming extensions.

The reference has no streaming operators (it is an eager batch
library); these are the natural streaming re-expressions for live
positionfix ingestion — the driver's ``events`` table is the model
input. Both operators work identically on batch DataFrames (Spark's
unified API), which is how the tests pin their semantics.

* ``sessionize_stream`` — gap-based session windows per user
  (``session_window`` + watermark): the streaming analog of the
  tripleg/session segmentation.
* ``staypoints_stream`` — incremental staypoint-ish detection:
  spatially-quantized session windows, i.e. a session closes when the
  user leaves the grid cell OR goes silent past the gap. An online
  approximation of generate_staypoints (the exact Li et al. scan is
  inherently offline — it looks ahead to the closing fix).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sessionize_stream(
    events: DataFrame,
    gap_minutes: float = 30.0,
    watermark_minutes: float = 60.0,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-user session aggregation with a session_window.

    On a stream, late fixes beyond the watermark drop; on a batch frame
    the same code returns the complete sessionization.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, f"{int(watermark_minutes)} minutes")
    return (
        df.groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), f"{int(gap_minutes)} minutes").alias("session"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("session.start").alias("started_at"),
            F.col("session.end").alias("finished_at"),
            "n_events",
        )
    )


def staypoints_stream(
    pfs: DataFrame,
    cell_size_m: float = 100.0,
    gap_minutes: float = 15.0,
    watermark_minutes: float = 60.0,
) -> DataFrame:
    """Online staypoint approximation: session windows keyed by
    (user, grid cell) — a 'stay' is continuous presence in one cell."""
    df = pfs
    if df.isStreaming:
        df = df.withWatermark("tracked_at", f"{int(watermark_minutes)} minutes")
    lat0 = 111320.0
    cell_lat = F.floor(F.col("geom.lat") * lat0 / cell_size_m)
    cell_lon = F.floor(F.col("geom.lon") * lat0 * F.cos(F.radians(F.col("geom.lat"))) / cell_size_m)
    return (
        df.withColumn("__cell", F.concat_ws("_", cell_lon, cell_lat))
        .groupBy(
            "user_id",
            "__cell",
            F.session_window(F.col("tracked_at"), f"{int(gap_minutes)} minutes").alias("session"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pfs"),
            F.avg("geom.lon").alias("__lon"),
            F.avg("geom.lat").alias("__lat"),
        )
        .select(
            "user_id",
            F.col("session.start").alias("started_at"),
            F.col("session.end").alias("finished_at"),
            "n_pfs",
            F.struct(F.col("__lon").alias("lon"), F.col("__lat").alias("lat")).alias("geom"),
        )
    )
