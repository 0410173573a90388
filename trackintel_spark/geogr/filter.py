"""spatial_filter — keep rows whose geometry satisfies a spatial
predicate against a set of area polygons.

Reference: geogr/filter.py:1-69. The reference prefilters with an
R-tree on bounding boxes (:45-54) then applies the exact shapely
predicate (:57-62). Here:

* the bbox prefilter is a broadcast range predicate — pushdown-friendly
  and parquet min/max-skippable;
* the exact point-in-polygon test is a ray-casting expression evaluated
  per (row, polygon) after the broadcast join — pure SQL for points;
* areas are expected tiny (a handful of polygons) and are broadcast.

Polygons are ``array<struct<lon,lat>>`` exterior rings (closed or not).
Supported methods: 'within' / 'intersects' for Point geometries (for
points the two are equivalent except on the boundary; we follow the
even-odd ray-casting rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _point_in_ring(pt, ring):
    """Even-odd ray casting as a SQL expression over an array of vertices.

    Counts crossings of the horizontal ray from the point; works on a
    closed or open exterior ring.
    """
    n = F.size(ring)
    ring_closed = F.when(
        (F.element_at(ring, 1)["lon"] == F.element_at(ring, -1)["lon"])
        & (F.element_at(ring, 1)["lat"] == F.element_at(ring, -1)["lat"]),
        ring,
    ).otherwise(F.concat(ring, F.array(F.element_at(ring, 1))))
    edges = F.zip_with(
        F.slice(ring_closed, 1, F.size(ring_closed) - 1),
        F.slice(ring_closed, 2, F.size(ring_closed) - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    crossings = F.filter(
        edges,
        lambda e: ((e["a"]["lat"] > pt["lat"]) != (e["b"]["lat"] > pt["lat"]))
        & (
            pt["lon"]
            < (e["b"]["lon"] - e["a"]["lon"])
            * (pt["lat"] - e["a"]["lat"])
            / (e["b"]["lat"] - e["a"]["lat"])
            + e["a"]["lon"]
        ),
    )
    return (F.size(crossings) % 2) == 1


def spatial_filter(
    source: DataFrame,
    areas: DataFrame,
    method: str = "within",
    geom_col: str = "geom",
) -> DataFrame:
    """Filter ``source`` rows whose point geometry lies in ANY area polygon.

    ``areas``: DataFrame with column ``polygon: array<struct<lon,lat>>``.
    """
    if method not in ("within", "intersects"):
        raise ValueError(f"method unknown, one of ('within','intersects'), got {method!r}")

    pt = F.col(geom_col)
    ar = areas.select(
        F.col("polygon").alias("__poly"),
        F.array_min(F.transform("polygon", lambda p: p["lon"])).alias("__min_lon"),
        F.array_max(F.transform("polygon", lambda p: p["lon"])).alias("__max_lon"),
        F.array_min(F.transform("polygon", lambda p: p["lat"])).alias("__min_lat"),
        F.array_max(F.transform("polygon", lambda p: p["lat"])).alias("__max_lat"),
    )
    # bbox prefilter (reference R-tree, geogr/filter.py:45-54) as a
    # broadcast theta-join, then the exact even-odd test.
    joined = source.join(
        F.broadcast(ar),
        on=(
            (pt["lon"] >= F.col("__min_lon"))
            & (pt["lon"] <= F.col("__max_lon"))
            & (pt["lat"] >= F.col("__min_lat"))
            & (pt["lat"] <= F.col("__max_lat"))
        ),
        how="inner",
    ).filter(_point_in_ring(pt, F.col("__poly")))
    return joined.select(*source.columns).dropDuplicates([c for c in ("id",) if c in source.columns] or None)
