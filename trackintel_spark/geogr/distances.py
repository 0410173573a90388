"""Distance / speed operators.

Reference: trackintel geogr/distances.py. All point math is pure Column
expressions (whole-stage codegen); the all-pairs matrix is long-form
(i, j, dist) — the only sane shape at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trackintel_spark.functions.spatial import euclidean_m, haversine_point, linestring_length_m
from trackintel_spark.functions.temporal import duration_s
from trackintel_spark.model.schemas import validate


def get_speed_positionfixes(pfs: DataFrame) -> DataFrame:
    """Speed per positionfix in m/s (geogr/distances.py:280-316).

    Distance/time to the previous pf of the same user in time order;
    the first pf copies the second one's speed (:314). (The reference
    computes over the frame's current row order; the deterministic
    distributed equivalent is per user ordered by tracked_at.)
    """
    validate(pfs, "positionfixes")
    w = Window.partitionBy("user_id").orderBy("tracked_at", "id")
    prev_pt = F.lag("geom").over(w)
    prev_ts = F.lag("tracked_at").over(w)
    speed = F.try_divide(haversine_point(F.col("geom"), prev_pt), duration_s(prev_ts, F.col("tracked_at")))
    out = pfs.withColumn("__speed_raw", speed)
    # first-row imputation: take the next row's computed speed
    out = out.withColumn("speed", F.coalesce(F.col("__speed_raw"), F.lead("__speed_raw").over(w)))
    return out.drop("__speed_raw")


def get_speed_triplegs(tpls: DataFrame, pfs: DataFrame | None = None, method: str = "tpls_speed") -> DataFrame:
    """Speed per tripleg in m/s (geogr/distances.py:319-374)."""
    validate(tpls, "triplegs")
    if method == "tpls_speed":
        return tpls.withColumn(
            "speed",
            F.try_divide(linestring_length_m(F.col("geom")), duration_s(F.col("started_at"), F.col("finished_at"))),
        )
    if method == "pfs_mean_speed":
        if pfs is None:
            raise ValueError('Method "pfs_mean_speed" requires positionfixes as input.')
        if "tripleg_id" not in pfs.columns:
            raise AttributeError('Positionfixes must include column "tripleg_id".')
        # mean of member-pf speeds, skipping each leg's first pf (:371-374)
        w = Window.partitionBy("tripleg_id").orderBy("tracked_at", "id")
        member = pfs.filter(F.col("tripleg_id").isNotNull())
        member = member.withColumn(
            "__speed",
            F.try_divide(
                haversine_point(F.col("geom"), F.lag("geom").over(w)),
                duration_s(F.lag("tracked_at").over(w), F.col("tracked_at")),
            ),
        )
        speeds = member.groupBy("tripleg_id").agg(F.avg("__speed").alias("speed"))
        return tpls.join(speeds.withColumnRenamed("tripleg_id", "id"), on="id", how="left")
    raise ValueError(f"Method {method} not known for speed computation.")


# planar metrics mirror sklearn's pairwise_distances passthrough in the
# reference (geogr/distances.py:144-153): plain vector math on the raw
# coordinate values, whatever their units (meters for projected CRS).
# All are >= |Δlat| for p >= 1, so the band prefilter below stays valid.
_PLANAR_METRICS = ("euclidean", "cityblock", "manhattan", "chebyshev", "minkowski")


def calculate_distance_matrix(
    X: DataFrame,
    Y: DataFrame | None = None,
    dist_threshold: float | None = None,
    metric: str = "haversine",
    p: float = 2.0,
) -> DataFrame:
    """All-pairs distances in long form (i, j, dist_m).

    Reference: calculate_distance_matrix (geogr/distances.py:89-185)
    returns a dense n x n numpy matrix — unusable at scale. We emit the
    long form; for X==Y only the upper triangle (i < j), mirroring the
    reference's upper-triangle optimization (:173-179).

    ``metric``: 'haversine' for WGS84 lon/lat; for projected (planar)
    coordinates — the check_gdf_planar switch — any of 'euclidean',
    'cityblock'/'manhattan', 'chebyshev', 'minkowski' (order ``p``),
    matching the reference's sklearn metric passthrough (geogr/
    distances.py:144-153) as pure Column expressions.
    ``dist_threshold`` adds a bounding-box band prefilter so Catalyst can
    turn the cross join into a pruned range join (the scalable variant).
    """
    if metric not in ("haversine",) + _PLANAR_METRICS:
        raise ValueError(
            f"metric must be 'haversine' or one of {_PLANAR_METRICS}, got {metric!r}"
        )
    if metric == "minkowski" and p < 1.0:
        raise ValueError(f"minkowski order p must be >= 1, got {p!r}")
    symmetric = Y is None
    a = X.select(F.col("id").alias("i"), F.col("geom").alias("__ga"))
    b = (X if symmetric else Y).select(F.col("id").alias("j"), F.col("geom").alias("__gb"))
    cond = [F.col("i") < F.col("j")] if symmetric else []
    if dist_threshold is not None:
        # band predicate before the trig: ~1 deg lat = 111.32 km for
        # geographic data, coordinate units directly for planar (every
        # supported planar metric is >= the per-axis difference)
        band = dist_threshold / 111320.0 if metric == "haversine" else dist_threshold
        cond.append(F.abs(a["__ga"]["lat"] - b["__gb"]["lat"]) <= band)
    joined = a.join(b, on=cond if cond else None, how="cross" if not cond else "inner")
    dx = F.abs(F.col("__ga")["lon"] - F.col("__gb")["lon"])
    dy = F.abs(F.col("__ga")["lat"] - F.col("__gb")["lat"])
    if metric == "haversine":
        d = haversine_point(F.col("__ga"), F.col("__gb"))
    elif metric == "euclidean":
        d = euclidean_m(
            F.col("__ga")["lon"], F.col("__ga")["lat"], F.col("__gb")["lon"], F.col("__gb")["lat"]
        )
    elif metric in ("cityblock", "manhattan"):
        d = dx + dy
    elif metric == "chebyshev":
        d = F.greatest(dx, dy)
    else:  # minkowski
        d = F.pow(F.pow(dx, F.lit(p)) + F.pow(dy, F.lit(p)), F.lit(1.0 / p))
    out = joined.withColumn("dist_m", d).select("i", "j", "dist_m")
    if dist_threshold is not None:
        out = out.filter(F.col("dist_m") <= dist_threshold)
    return out


def jump_length(sp: DataFrame) -> DataFrame:
    """Distance to each user's NEXT staypoint; last one NULL.

    Reference: analysis/metrics.py:82-128 (lead + haversine).
    """
    validate(sp, "staypoints")
    w = Window.partitionBy("user_id").orderBy("started_at", "id")
    return sp.withColumn("jump_length_m", haversine_point(F.col("geom"), F.lead("geom").over(w)))
