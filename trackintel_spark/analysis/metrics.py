"""Mobility metrics: radius of gyration, jump length.

Reference: analysis/metrics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trackintel_spark.functions.spatial import euclidean_m, haversine_m, haversine_point
from trackintel_spark.model.schemas import validate


def radius_gyration(sp: DataFrame, method: str = "count", metric: str = "haversine") -> DataFrame:
    """Per-user radius of gyration (Gonzalez et al. 2008).

    Reference: analysis/metrics.py:8-79 — weighted (count|duration)
    center of mass (plain lon/lat mean, NOT wrap-safe, :72-73), then
    sqrt of the weighted mean squared haversine distance to it.

    Two-phase: per-user centers (tiny) broadcast back; both aggregations
    shuffle once on user_id.
    """
    if method not in ("count", "duration"):
        raise ValueError(f'Method unknown. Should be one of {{"count", "duration"}}. You passed "{method}"')
    if metric not in ("haversine", "euclidean"):
        raise ValueError(f"metric must be 'haversine' or 'euclidean', got {metric!r}")
    validate(sp, "staypoints")

    w = (
        (F.col("finished_at").cast("double") - F.col("started_at").cast("double"))
        if method == "duration"
        else F.lit(1.0)
    )
    weighted = sp.select("user_id", F.col("geom.lon").alias("x"), F.col("geom.lat").alias("y"), w.alias("w"))
    # try_divide: users whose weights sum to zero (all zero-duration
    # staypoints) get NULL, matching SQL division-by-zero semantics
    centers = weighted.groupBy("user_id").agg(
        F.try_divide(F.sum(F.col("w") * F.col("x")), F.sum("w")).alias("__cx"),
        F.try_divide(F.sum(F.col("w") * F.col("y")), F.sum("w")).alias("__cy"),
    )
    # no broadcast hint: centers has one row per user, which grows with
    # the data; the user_id-keyed equi-join lets AQE pick the strategy
    joined = weighted.join(centers, on="user_id")
    dist_fn = haversine_m if metric == "haversine" else euclidean_m
    sq = F.pow(dist_fn(F.col("x"), F.col("y"), F.col("__cx"), F.col("__cy")), 2)
    return joined.groupBy("user_id").agg(
        F.sqrt(F.try_divide(F.sum(sq * F.col("w")), F.sum("w"))).alias("radius_gyration")
    )


def jump_length(sp: DataFrame, metric: str = "haversine") -> DataFrame:
    """Distance to the user's next staypoint; the user's last staypoint
    gets NULL (reference analysis/metrics.py:82-128). ``metric``:
    'haversine' for WGS84, 'euclidean' for projected coordinates (the
    check_gdf_planar switch, like the reference's planar branch)."""
    if metric not in ("haversine", "euclidean"):
        raise ValueError(f"metric must be 'haversine' or 'euclidean', got {metric!r}")
    validate(sp, "staypoints")
    w = Window.partitionBy("user_id").orderBy("started_at", "id")
    nxt = F.lead("geom").over(w)
    if metric == "haversine":
        d = haversine_point(F.col("geom"), nxt)
    else:
        d = euclidean_m(F.col("geom")["lon"], F.col("geom")["lat"], nxt["lon"], nxt["lat"])
    return sp.withColumn("jump_length", d)
