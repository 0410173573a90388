"""k-anonymous spatial publication — quadtree cloaking over the
rollup grid.

Publishing mobility heatmaps leaks home/work locations unless every
published cell aggregates enough PEOPLE: the standard fix is
quadtree generalization (the Casper / adaptive-cloaking family,
Mokbel et al. 2006; Gruteser & Grunwald 2003 introduced the
k-anonymity reading) — descend the grid top-down, splitting a cell
into its children only while EVERY occupied child still covers >= k
distinct users, publishing the cell where descent stops. The split
rule makes published cells DISJOINT (no nesting — a nested
publication would let a reader subtract regions), keeps every
published row at >= k users, and folds sparse corners into their
published parent instead of dropping them; only space whose
top-level cell never reaches k is suppressed outright.

Distinct-user counts here are EXACT, not sketches: privacy thresholds
should not ride on HLL error. Exactness costs one distinct pass —
``(user, finest-cell)`` pairs — after which every coarser level's
user count is another distinct over shifted indices of the shrinking
pair frame (pair-dedup IS the associative form of count-distinct),
so the raw points are scanned once, like :func:`grid_rollup`.

Cells anchor at (lon+180, lat+90) so indices are non-negative and a
parent is plain integer halving in any engine (the antimeridian seam
is a cell boundary, consistent with geogr/_grid.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["anonymize_grid", "anonymize_time"]


def anonymize_grid(
    points: DataFrame,
    k: int = 5,
    levels: int = 4,
    base_cell_deg: float = 0.001,
    lon_col: str = "lon",
    lat_col: str = "lat",
    user_col: str = "user_id",
) -> DataFrame:
    """Publishable cells under k-anonymity (top-down quadtree descent).

    Returns one row per published cell:
    ``(level, cell_deg, cy, cx, n_users, n_points)``, cells disjoint,
    every row with ``n_users >= k``; points whose level-(levels-1)
    cell never reaches ``k`` users are suppressed (absent). The
    disjointness, the k-invariant, and the published+suppressed ==
    input partition identity are pinned in tests/test_privacy.py.

    The driver loop runs ``levels`` (a handful) iterations over
    CELL-sized frames; the raw points feed one distinct and one count
    aggregation total.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if levels < 1:
        raise ValueError(f"levels must be >= 1, got {levels}")
    if base_cell_deg <= 0:
        raise ValueError(f"base_cell_deg must be > 0, got {base_cell_deg}")

    base = points.select(
        F.col(user_col).alias("__u"),
        F.floor((F.col(lat_col) + F.lit(90.0)) / base_cell_deg).cast("long").alias("cy"),
        F.floor((F.col(lon_col) + F.lit(180.0)) / base_cell_deg).cast("long").alias("cx"),
    )
    pts0 = base.groupBy("cy", "cx").agg(F.count(F.lit(1)).alias("n_points")).localCheckpoint(
        eager=True
    )

    # exact distinct users per cell at every level from ONE distinct
    # pass over the points (pair-dedup rolls up through index shifts)
    pairs = base.distinct().localCheckpoint(eager=True)
    users_at = []
    for lvl in range(levels):
        users_at.append(
            pairs.select(
                F.shiftright("cy", lvl).alias("cy"),
                F.shiftright("cx", lvl).alias("cx"),
                "__u",
            )
            .distinct()
            .groupBy("cy", "cx")
            .agg(F.count(F.lit(1)).alias("n_users"))
            .localCheckpoint(eager=True)
        )

    # top-down: active cells at the top level are those meeting k
    # (everything else is suppressed); a cell splits iff every occupied
    # child meets k, else it is published where descent stopped
    published = []  # (level, frame of (cy, cx, n_users))
    active = users_at[levels - 1].filter(F.col("n_users") >= k)
    for lvl in range(levels - 1, 0, -1):
        child = users_at[lvl - 1].select(
            "cy", "cx", "n_users",
            F.shiftright("cy", 1).alias("__py"),
            F.shiftright("cx", 1).alias("__px"),
        )
        splittable = (
            child.groupBy("__py", "__px")
            .agg(F.min((F.col("n_users") >= k).cast("int")).alias("__all_ok"))
            .filter(F.col("__all_ok") == 1)
            .select(F.col("__py").alias("cy"), F.col("__px").alias("cx"))
        )
        published.append(
            (lvl, active.join(splittable, on=["cy", "cx"], how="left_anti"))
        )
        descend = active.join(splittable, on=["cy", "cx"], how="left_semi")
        active = child.join(
            descend.select(F.col("cy").alias("__py"), F.col("cx").alias("__px")),
            on=["__py", "__px"],
        ).select("cy", "cx", "n_users")
    published.append((0, active))

    # point counts fold into the published ancestor (disjoint, so each
    # finest cell matches exactly one published cell)
    out = None
    for lvl, cells in published:
        joined = (
            pts0.select(
                F.shiftright("cy", lvl).alias("cy"),
                F.shiftright("cx", lvl).alias("cx"),
                "n_points",
            )
            .groupBy("cy", "cx")
            .agg(F.sum("n_points").alias("n_points"))
            .join(cells, on=["cy", "cx"])
            .select(
                F.lit(lvl).alias("level"),
                F.lit(base_cell_deg * (2 ** lvl)).alias("cell_deg"),
                "cy", "cx", "n_users", "n_points",
            )
        )
        out = joined if out is None else out.unionByName(joined)
    return out


# consecutive (finer, coarser) unit pairs where the coarser bucket is
# date_trunc-derivable from the finer bucket value — week and month are
# incomparable (a week spans month boundaries), so neither may follow
# the other in a descent chain (the analysis/rollup.py lattice)
_TIME_CHAIN_OK = {
    ("hour", "day"), ("hour", "week"), ("hour", "month"),
    ("day", "week"), ("day", "month"),
}


def anonymize_time(
    events: DataFrame,
    k: int = 5,
    units: tuple[str, ...] = ("hour", "day", "month"),
    ts_col: str = "tracked_at",
    user_col: str = "user_id",
) -> DataFrame:
    """k-anonymous TEMPORAL publication — the calendar-lattice sibling
    of :func:`anonymize_grid`: a time bucket published with < k
    distinct users leaks presence the same way a sparse grid cell does
    (Gruteser & Grunwald 2003's temporal cloaking axis).

    Top-down descent along ``units`` (finest first, strictly
    coarsening, each consecutive pair ``date_trunc``-derivable — week
    and month are mutually incomparable and may not be chained): a
    coarse bucket splits into its children only while EVERY occupied
    child still covers >= ``k`` distinct users, and is published where
    descent stops. Published buckets are DISJOINT (no nesting — a
    nested publication lets a reader subtract intervals), every row
    has ``n_users >= k``, sparse children fold into their published
    parent, and only time whose coarsest bucket never reaches ``k`` is
    suppressed outright.

    Distinct-user counts are EXACT (pair-dedup census, not sketches):
    one ``(user, finest-bucket)`` distinct pass over the events, after
    which every coarser level re-dedups the shrinking pair frame.

    Returns one row per published bucket:
    ``(unit, bucket, n_users, n_events)``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not units:
        raise ValueError("units must be non-empty")
    for a, b in zip(units, units[1:]):
        if (a, b) not in _TIME_CHAIN_OK:
            raise ValueError(
                f"units must be strictly coarsening along the calendar "
                f"lattice (week/month are incomparable); bad pair ({a!r}, {b!r})"
            )

    base = events.select(
        F.col(user_col).alias("__u"),
        F.date_trunc(units[0], F.col(ts_col)).alias("b"),
    )
    pts0 = base.groupBy("b").agg(F.count(F.lit(1)).alias("n_events")).localCheckpoint(
        eager=True
    )
    pairs = base.distinct().localCheckpoint(eager=True)

    levels = len(units)
    users_at = []
    for lvl in range(levels):
        bucket = F.col("b") if lvl == 0 else F.date_trunc(units[lvl], F.col("b"))
        users_at.append(
            pairs.select(bucket.alias("b"), "__u")
            .distinct()
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("n_users"))
            .localCheckpoint(eager=True)
        )

    published = []  # (level, frame of (b, n_users))
    active = users_at[levels - 1].filter(F.col("n_users") >= k)
    for lvl in range(levels - 1, 0, -1):
        child = users_at[lvl - 1].select(
            "b", "n_users", F.date_trunc(units[lvl], F.col("b")).alias("__p")
        )
        splittable = (
            child.groupBy("__p")
            .agg(F.min((F.col("n_users") >= k).cast("int")).alias("__all_ok"))
            .filter(F.col("__all_ok") == 1)
            .select(F.col("__p").alias("b"))
        )
        published.append((lvl, active.join(splittable, on="b", how="left_anti")))
        descend = active.join(splittable, on="b", how="left_semi")
        active = child.join(
            descend.select(F.col("b").alias("__p")), on="__p"
        ).select("b", "n_users")
    published.append((0, active))

    out = None
    for lvl, cells in published:
        bucket = F.col("b") if lvl == 0 else F.date_trunc(units[lvl], F.col("b"))
        joined = (
            pts0.select(bucket.alias("b"), "n_events")
            .groupBy("b")
            .agg(F.sum("n_events").alias("n_events"))
            .join(cells, on="b")
            .select(
                F.lit(units[lvl]).alias("unit"),
                F.col("b").alias("bucket"),
                "n_users",
                "n_events",
            )
        )
        out = joined if out is None else out.unionByName(joined)
    return out
