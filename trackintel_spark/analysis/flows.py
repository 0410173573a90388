"""Origin–destination flow aggregation over trips.

The reference stops at ``generate_trips`` (trips carry
``origin_staypoint_id`` / ``destination_staypoint_id``, reference
preprocessing/triplegs.py trips schema); turning those into
location-level OD flows is the standard next step of every mobility
analysis (flow maps, gravity-model fitting, transition matrices) and a
pure relational plan: two staypoint→location lookups + one groupBy.

Scale shape: the two lookups are plain equi-joins on staypoint_id (AQE
picks the strategy; staypoints are data-sized so nothing is hinted),
the aggregation has map-side combine, and the optional per-user
normalization is one window over the OD key's user — no collect, no
cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def origin_destination_matrix(
    trips: DataFrame,
    staypoints: DataFrame | None = None,
    by: str = "location_id",
    per_user: bool = False,
    drop_self_loops: bool = False,
) -> DataFrame:
    """Long-form OD matrix: one row per (origin, destination[, user])
    with ``n_trips`` and ``flow_share``.

    ``staypoints`` (with ``id`` and ``by`` columns, e.g. from
    ``generate_locations``) maps trip endpoint staypoints to zones;
    pass None to aggregate on the raw staypoint ids. Trips with a NULL
    endpoint (gap-started/-ended trips) aggregate under a NULL zone —
    filter beforehand if unwanted. ``flow_share`` normalizes within
    the whole matrix, or within each user when ``per_user``;
    ``drop_self_loops`` removes origin == destination rows (before
    normalization).
    """
    t = trips.select(
        "user_id",
        F.col("origin_staypoint_id").alias("__o_sp"),
        F.col("destination_staypoint_id").alias("__d_sp"),
    )
    if staypoints is not None:
        zo = staypoints.select(F.col("id").alias("__o_sp"), F.col(by).alias("origin"))
        zd = staypoints.select(F.col("id").alias("__d_sp"), F.col(by).alias("destination"))
        t = t.join(zo, on="__o_sp", how="left").join(zd, on="__d_sp", how="left")
    else:
        t = t.withColumn("origin", F.col("__o_sp")).withColumn(
            "destination", F.col("__d_sp")
        )
    if drop_self_loops:
        t = t.filter(
            ~F.col("origin").eqNullSafe(F.col("destination")) | F.col("origin").isNull()
        )
    keys = (["user_id"] if per_user else []) + ["origin", "destination"]
    od = t.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_trips"))
    if per_user:
        w = Window.partitionBy("user_id")
        return od.withColumn("flow_share", F.col("n_trips") / F.sum("n_trips").over(w))
    # whole-matrix share: 1-row total via agg + broadcast, never a
    # global (single-task) window over the OD matrix
    total = od.agg(F.sum("n_trips").alias("__tot"))
    return (
        od.crossJoin(F.broadcast(total))
        .withColumn("flow_share", F.col("n_trips") / F.col("__tot"))
        .drop("__tot")
    )
