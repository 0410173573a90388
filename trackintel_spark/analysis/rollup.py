"""Multi-resolution spatial grid rollup — the hypertable-rollup shape.

Dashboard and tile workloads ask the same question at many zoom
levels: how many fixes / staypoints / users per cell, where is the
cell's mass centered. Naively that is one full groupBy PER level —
at 100 TB, L scans and L full shuffles. The OLAP rollup identity
makes all coarser levels derivable from the finest aggregates
(counts and coordinate SUMS are associative; a parent cell is exactly
the union of its 4 children), so:

* the DATA is scanned and shuffled ONCE, at the finest cell size
  (map-side combine collapses the shuffle to one row per occupied
  cell);
* every coarser level re-aggregates the previous level's CELL ROWS —
  input size = occupied cells, not points, shrinking ~4x per level;
* distinct-user counts are not associative, so they ride as mergeable
  HLL sketches (the scale/profile.py discipline) and surface as
  ``users_est``; counts and centroids stay exact.

Cells are a plain lon/lat quadtree: level 0 cells are
``base_cell_deg`` degrees on each axis, level k cells are ``2^k``
times larger, child (cy, cx) -> parent (cy >> 1, cx >> 1) — floor
division keeps negative indices correct.

The reference has no rollup surface (its closest tools are one-level
``location_occupancy``-style counts); this is extension surface for
serving mobility heatmaps out of the same engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["grid_rollup", "merge_grid_tiles", "time_rollup", "merge_time_buckets"]


def grid_rollup(
    points: DataFrame,
    levels: int = 4,
    base_cell_deg: float = 0.001,
    lon_col: str = "lon",
    lat_col: str = "lat",
    user_col: str | None = None,
    emit_state: bool = False,
) -> DataFrame:
    """Aggregate points onto ``levels`` nested grids in one data pass.

    Returns one row per (level, occupied cell):
    ``(level, cell_deg, cy, cx, n, centroid_lon, centroid_lat
    [, users_est])`` where level 0 is the finest. Centroids are exact
    (sum-rollup); ``users_est`` (only with ``user_col``) is a
    DataSketches HLL estimate, mergeable across levels and shards.

    With ``emit_state=True`` each row additionally carries the
    MERGEABLE aggregation state — ``sum_lon``, ``sum_lat`` and (with
    ``user_col``) the HLL ``users_sketch`` bytes — so a serving layer
    can fold later cell updates (e.g. rows emitted by
    ``streaming.grid_counts_stream``) into the tile table with
    :func:`merge_grid_tiles` instead of rescanning history.
    """
    if levels < 1:
        raise ValueError(f"levels must be >= 1, got {levels}")
    if base_cell_deg <= 0:
        raise ValueError(f"base_cell_deg must be > 0, got {base_cell_deg}")

    base = points.select(
        F.floor(F.col(lat_col) / base_cell_deg).cast("long").alias("cy"),
        F.floor(F.col(lon_col) / base_cell_deg).cast("long").alias("cx"),
        F.col(lon_col).alias("__lon"),
        F.col(lat_col).alias("__lat"),
        *((F.col(user_col).alias("__u"),) if user_col else ()),
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("__lon").alias("__slon"),
        F.sum("__lat").alias("__slat"),
    ]
    if user_col:
        aggs.append(F.hll_sketch_agg("__u").alias("__hll"))
    finest = base.groupBy("cy", "cx").agg(*aggs)

    def _finish(df: DataFrame, level: int) -> DataFrame:
        cols = [
            F.lit(level).alias("level"),
            F.lit(base_cell_deg * (2 ** level)).alias("cell_deg"),
            F.col("cy"), F.col("cx"), F.col("n"),
            (F.col("__slon") / F.col("n")).alias("centroid_lon"),
            (F.col("__slat") / F.col("n")).alias("centroid_lat"),
        ]
        if user_col:
            cols.append(F.hll_sketch_estimate("__hll").alias("users_est"))
        if emit_state:
            cols += [F.col("__slon").alias("sum_lon"), F.col("__slat").alias("sum_lat")]
            if user_col:
                cols.append(F.col("__hll").alias("users_sketch"))
        return df.select(*cols)

    # child -> parent via arithmetic shift (floor semantics on negatives)
    def _parent(df: DataFrame) -> DataFrame:
        roll = [
            F.sum("n").alias("n"),
            F.sum("__slon").alias("__slon"),
            F.sum("__slat").alias("__slat"),
        ]
        if user_col:
            roll.append(F.hll_union_agg("__hll").alias("__hll"))
        return (
            df.select(
                F.shiftright("cy", 1).alias("cy"),
                F.shiftright("cx", 1).alias("cx"),
                "n", "__slon", "__slat",
                *(("__hll",) if user_col else ()),
            )
            .groupBy("cy", "cx")
            .agg(*roll)
        )

    # MATERIALIZE each level (eager localCheckpoint, the plans/graph.py
    # idiom): without it the union's branches re-derive from the RAW
    # points — Spark shares no common subplan across a union, so the
    # point scan and its shuffle would run once per level, which is
    # exactly the L-scans plan this operator exists to avoid. With it,
    # the points feed ONE exchange and every coarser level re-aggregates
    # a few cached cell rows (plan-pinned in tests/test_rollup.py).
    if points.isStreaming:
        raise ValueError("grid_rollup is batch-only (rollup levels materialize)")
    level_df = finest.localCheckpoint(eager=True)
    out = _finish(level_df, 0)
    for lvl in range(1, levels):
        level_df = _parent(level_df).localCheckpoint(eager=True)
        out = out.unionByName(_finish(level_df, lvl))
    return out


def merge_grid_tiles(
    tiles: DataFrame,
    updates: DataFrame,
    levels: int = 4,
    base_cell_deg: float = 0.001,
) -> DataFrame:
    """Fold level-0 cell updates into an existing tile table — the
    serve-time half of the rollup story.

    ``tiles`` is a :func:`grid_rollup(..., emit_state=True)` result
    (historical tiles at every level, carrying sums and HLL sketch
    bytes); ``updates`` is finest-cell delta rows ``(cy, cx, n,
    sum_lon, sum_lat[, users_sketch])`` — exactly what a
    ``streaming.grid_counts_stream`` query emits (windows already
    summed away, or kept upstream for time-sliced tiles). Every
    statistic merges by the rollup identity: counts and coordinate
    sums add, user sketches union (``hll_union_agg``) — so users seen
    both in history and in the stream are never double-counted, which
    summed estimates would get wrong. The updates are lifted to each
    coarser level by index shift; one shuffle keyed on (level, cy, cx)
    touches only tile rows and deltas, never history points.

    Returns the merged table in the same ``emit_state=True`` schema, so
    merging is closed under composition (tonight's tiles + tomorrow's
    deltas + ...). Stream-merge == batch-rollup-of-everything is pinned
    in tests/test_rollup.py.
    """
    if levels < 1:
        raise ValueError(f"levels must be >= 1, got {levels}")
    has_users = "users_sketch" in tiles.columns
    if has_users != ("users_sketch" in updates.columns):
        raise ValueError("tiles and updates must both (or neither) carry users_sketch")

    state = ["n", "sum_lon", "sum_lat"] + (["users_sketch"] if has_users else [])
    lifted = None
    for lvl in range(levels):
        lv = updates.select(
            F.lit(lvl).alias("level"),
            F.lit(base_cell_deg * (2 ** lvl)).alias("cell_deg"),
            F.shiftright("cy", lvl).alias("cy"),
            F.shiftright("cx", lvl).alias("cx"),
            *state,
        )
        lifted = lv if lifted is None else lifted.unionByName(lv)
    both = tiles.select("level", "cell_deg", "cy", "cx", *state).unionByName(lifted)
    aggs = [
        F.sum("n").alias("n"),
        F.sum("sum_lon").alias("sum_lon"),
        F.sum("sum_lat").alias("sum_lat"),
    ]
    if has_users:
        aggs.append(F.hll_union_agg("users_sketch").alias("users_sketch"))
    merged = both.groupBy("level", "cell_deg", "cy", "cx").agg(*aggs)
    cols = [
        "level", "cell_deg", "cy", "cx", "n",
        (F.col("sum_lon") / F.col("n")).alias("centroid_lon"),
        (F.col("sum_lat") / F.col("n")).alias("centroid_lat"),
    ]
    if has_users:
        cols.append(F.hll_sketch_estimate("users_sketch").alias("users_est"))
    cols += ["sum_lon", "sum_lat"] + (["users_sketch"] if has_users else [])
    return merged.select(*cols)


_TIME_UNITS = ("hour", "day", "week", "month")


def time_rollup(
    events: DataFrame,
    ts_col: str = "tracked_at",
    units: tuple[str, ...] = _TIME_UNITS,
    user_col: str | None = None,
    emit_state: bool = False,
) -> DataFrame:
    """Temporal sibling of :func:`grid_rollup`: event counts per hour,
    day, week, and month in ONE data pass.

    Truncation only composes along the calendar lattice — ``day`` is
    derivable from ``hour``, and ``week`` / ``month`` from ``day`` (or
    ``hour``), but NOT from each other (a week spans month
    boundaries, so ``date_trunc('month', week_start)`` is wrong for
    rows whose week starts in the previous month). The rollup
    therefore aggregates events once at the finest requested unit and
    derives every coarser unit from the finest FINER materialized
    level the lattice allows. Returns one row per (unit, bucket):
    ``(unit, bucket, n [, users_est])``.

    With ``emit_state=True`` (and ``user_col``) each row also carries
    the HLL ``users_sketch`` bytes, so later finest-unit deltas fold
    in via :func:`merge_time_buckets` without a history rescan.
    """
    order = {u: i for i, u in enumerate(_TIME_UNITS)}
    if not units or any(u not in order for u in units):
        raise ValueError(f"units must be drawn from {_TIME_UNITS}, got {units!r}")
    if list(units) != sorted(units, key=order.__getitem__) or len(set(units)) != len(units):
        raise ValueError(f"units must be strictly coarsening, got {units!r}")
    if events.isStreaming:
        raise ValueError("time_rollup is batch-only (rollup levels materialize)")

    # lattice: what each unit may be derived from (finer -> coarser)
    derivable_from = {
        "day": ("hour",),
        "week": ("day", "hour"),
        "month": ("day", "hour"),
    }

    base = events.select(
        F.date_trunc(units[0], F.col(ts_col)).alias("bucket"),
        *((F.col(user_col).alias("__u"),) if user_col else ()),
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    if user_col:
        aggs.append(F.hll_sketch_agg("__u").alias("__hll"))
    levels = {units[0]: base.groupBy("bucket").agg(*aggs).localCheckpoint(eager=True)}

    def _finish(df: DataFrame, unit: str) -> DataFrame:
        cols = [F.lit(unit).alias("unit"), F.col("bucket"), F.col("n")]
        if user_col:
            cols.append(F.hll_sketch_estimate("__hll").alias("users_est"))
            if emit_state:
                cols.append(F.col("__hll").alias("users_sketch"))
        return df.select(*cols)

    out = _finish(levels[units[0]], units[0])
    for unit in units[1:]:
        src = next((f for f in derivable_from.get(unit, ()) if f in levels), None)
        if src is None:
            # no finer materialized level composes to this unit
            # (e.g. units started at "week" and now ask for "month"):
            # aggregate it from the raw events instead — one extra
            # data pass, correctness over cleverness
            lvl = (
                events.select(
                    F.date_trunc(unit, F.col(ts_col)).alias("bucket"),
                    *((F.col(user_col).alias("__u"),) if user_col else ()),
                )
                .groupBy("bucket")
                .agg(*aggs)
                .localCheckpoint(eager=True)
            )
        else:
            roll = [F.sum("n").alias("n")]
            if user_col:
                roll.append(F.hll_union_agg("__hll").alias("__hll"))
            lvl = (
                levels[src]
                .select(F.date_trunc(unit, F.col("bucket")).alias("bucket"), "n",
                        *(("__hll",) if user_col else ()))
                .groupBy("bucket")
                .agg(*roll)
                .localCheckpoint(eager=True)
            )
        levels[unit] = lvl
        out = out.unionByName(_finish(lvl, unit))
    return out


def merge_time_buckets(
    rollup: DataFrame,
    updates: DataFrame,
    units: tuple[str, ...] = _TIME_UNITS,
) -> DataFrame:
    """Temporal counterpart of :func:`merge_grid_tiles`: fold
    finest-unit bucket deltas into an existing :func:`time_rollup`
    result.

    ``rollup`` is a ``time_rollup(..., emit_state=True)`` output;
    ``updates`` is delta rows ``(bucket, n[, users_sketch])`` already
    truncated to ``units[0]`` (e.g. hourly counts a streaming query
    emitted). Lifting the deltas straight from the finest unit to
    EVERY coarser unit via ``date_trunc`` is lattice-safe — the
    week/month incomparability only bites when deriving one COARSE
    unit from another, never from the finest. Counts add, sketches
    union (users in both history and the delta count once). Output
    keeps the state schema, so merges compose.
    """
    order = {u: i for i, u in enumerate(_TIME_UNITS)}
    if not units or any(u not in order for u in units):
        raise ValueError(f"units must be drawn from {_TIME_UNITS}, got {units!r}")
    has_users = "users_sketch" in rollup.columns
    if has_users != ("users_sketch" in updates.columns):
        raise ValueError("rollup and updates must both (or neither) carry users_sketch")

    state = ["n"] + (["users_sketch"] if has_users else [])
    lifted = None
    for unit in units:
        lv = updates.select(
            F.lit(unit).alias("unit"),
            F.date_trunc(unit, F.col("bucket")).alias("bucket"),
            *state,
        )
        lifted = lv if lifted is None else lifted.unionByName(lv)
    both = rollup.select("unit", "bucket", *state).unionByName(lifted)
    aggs = [F.sum("n").alias("n")]
    if has_users:
        aggs.append(F.hll_union_agg("users_sketch").alias("users_sketch"))
    merged = both.groupBy("unit", "bucket").agg(*aggs)
    cols = ["unit", "bucket", "n"]
    if has_users:
        cols += [
            F.hll_sketch_estimate("users_sketch").alias("users_est"),
            "users_sketch",
        ]
    return merged.select(*cols)
