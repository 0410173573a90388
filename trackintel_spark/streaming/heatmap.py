"""Windowed grid-cell aggregation over a positionfix stream — the
ONLINE path of the rollup family (:mod:`trackintel_spark.analysis.rollup`
is the batch hypertable rollup; this serves live heatmap tiles).

The canonical watermark + tumbling-window aggregation:

* event time = ``tracked_at``; ``withWatermark`` bounds lateness and
  evicts closed windows, so state is (open windows) x (occupied
  cells), not stream length;
* cells are the same lon/lat quadtree as :func:`grid_rollup`
  (``floor(coord / cell_deg)``) — a sink can roll emitted level-0
  rows up to coarser tiles with the batch operator's sum identity,
  counts and coordinate sums being associative;
* per cell the row carries ``n``, exact coordinate sums (for
  centroids downstream) and, with ``user_col``, the DataSketches HLL
  sketch BYTES (``users_sketch``) plus its point estimate
  (``approx_users``). Emitting the sketch — not just the estimate —
  keeps user counts inside the rollup identity: a sink unions child
  sketches (``hll_union_agg``) for coarser tiles or longer windows,
  where summed estimates would double-count users spanning cells.

Append mode emits each (window, cell) row once when the watermark
passes the window end. On a batch frame the same groupBy runs
directly (watermark is a no-op) — batch == stream on closed history,
pinned in tests/test_streaming_heatmap.py.

The reference is batch-only; extension surface like the rest of this
package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["grid_counts_stream"]


def grid_counts_stream(
    pfs: DataFrame,
    cell_deg: float = 0.001,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "tracked_at",
    lon_col: str = "lon",
    lat_col: str = "lat",
    user_col: str | None = None,
) -> DataFrame:
    """Per-(window, cell) fix counts for a positionfix stream (or
    batch frame — unified API). Returns ``(window_start, window_end,
    cy, cx, n, sum_lon, sum_lat [, users_sketch, approx_users])``."""
    if cell_deg <= 0:
        raise ValueError(f"cell_deg must be > 0, got {cell_deg}")
    src = pfs
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    keyed = src.select(
        F.col(ts_col).alias("__ts"),
        F.floor(F.col(lat_col) / cell_deg).cast("long").alias("cy"),
        F.floor(F.col(lon_col) / cell_deg).cast("long").alias("cx"),
        F.col(lon_col).alias("__lon"),
        F.col(lat_col).alias("__lat"),
        *((F.col(user_col).alias("__u"),) if user_col else ()),
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("__lon").alias("sum_lon"),
        F.sum("__lat").alias("sum_lat"),
    ]
    if user_col:
        aggs.append(F.hll_sketch_agg("__u").alias("users_sketch"))
    out = keyed.groupBy(F.window("__ts", window).alias("__w"), "cy", "cx").agg(*aggs)
    cols = [
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        F.col("cy"), F.col("cx"), F.col("n"), F.col("sum_lon"), F.col("sum_lat"),
    ]
    if user_col:
        cols += [
            F.col("users_sketch"),
            F.hll_sketch_estimate("users_sketch").alias("approx_users"),
        ]
    return out.select(*cols)
