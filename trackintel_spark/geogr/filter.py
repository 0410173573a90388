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


def _close_ring(ring):
    return F.when(
        (F.element_at(ring, 1)["lon"] == F.element_at(ring, -1)["lon"])
        & (F.element_at(ring, 1)["lat"] == F.element_at(ring, -1)["lat"]),
        ring,
    ).otherwise(F.concat(ring, F.array(F.element_at(ring, 1))))


def _edges(vertices):
    return F.zip_with(
        F.slice(vertices, 1, F.size(vertices) - 1),
        F.slice(vertices, 2, F.size(vertices) - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


def _segments_cross(e1, e2):
    """Proper segment intersection via orientation tests (standard ccw
    predicate); collinear touching is not counted — matching shapely's
    open-interior semantics closely enough for real GPS data."""

    def ccw(a, b, c):
        return (c["lat"] - a["lat"]) * (b["lon"] - a["lon"]) > (b["lat"] - a["lat"]) * (
            c["lon"] - a["lon"]
        )

    return (
        ccw(e1["a"], e2["a"], e2["b"]) != ccw(e1["b"], e2["a"], e2["b"])
    ) & (ccw(e1["a"], e1["b"], e2["a"]) != ccw(e1["a"], e1["b"], e2["b"]))


def _line_predicates(line, ring):
    """(all_vertices_in, any_vertex_in, any_edge_crossing) for an
    array<struct<lon,lat>> linestring against a polygon ring."""
    closed = _close_ring(ring)
    ring_edges = _edges(closed)
    verts_in = F.transform(line, lambda v: _point_in_ring(v, ring))
    all_in = F.forall(verts_in, lambda x: x)
    any_in = F.exists(verts_in, lambda x: x)
    crossing = F.exists(
        _edges(line), lambda le: F.exists(ring_edges, lambda re: _segments_cross(le, re))
    )
    return all_in, any_in, crossing


def spatial_filter(
    source: DataFrame,
    areas: DataFrame,
    method: str = "within",
    geom_col: str = "geom",
) -> DataFrame:
    """Filter ``source`` rows whose geometry satisfies ``method`` against
    ANY area polygon. Point geometries (``struct<lon,lat>``) support
    within/intersects (equivalent off-boundary); linestrings
    (``array<struct<lon,lat>>``) support within / intersects / crosses
    with exact vertex + segment-crossing tests (reference
    geogr/filter.py:57-62 delegates the same predicates to shapely).

    ``areas``: DataFrame with column ``polygon: array<struct<lon,lat>>``.
    """
    is_line = dict(source.dtypes)[geom_col].startswith("array")
    if method not in ("within", "intersects", "crosses"):
        raise ValueError(f"method unknown, one of ('within','intersects','crosses'), got {method!r}")
    if method == "crosses" and not is_line:
        # a point never crosses a polygon (reference: shapely crosses on
        # points yields an empty result, geogr/test_filter.py:45)
        return source.filter(F.lit(False))

    g = F.col(geom_col)
    ar = areas.select(
        F.col("polygon").alias("__poly"),
        F.array_min(F.transform("polygon", lambda p: p["lon"])).alias("__min_lon"),
        F.array_max(F.transform("polygon", lambda p: p["lon"])).alias("__max_lon"),
        F.array_min(F.transform("polygon", lambda p: p["lat"])).alias("__min_lat"),
        F.array_max(F.transform("polygon", lambda p: p["lat"])).alias("__max_lat"),
    )
    if is_line:
        lon_min = F.array_min(F.transform(g, lambda p: p["lon"]))
        lon_max = F.array_max(F.transform(g, lambda p: p["lon"]))
        lat_min = F.array_min(F.transform(g, lambda p: p["lat"]))
        lat_max = F.array_max(F.transform(g, lambda p: p["lat"]))
        bbox = (
            (lon_min <= F.col("__max_lon"))
            & (lon_max >= F.col("__min_lon"))
            & (lat_min <= F.col("__max_lat"))
            & (lat_max >= F.col("__min_lat"))
        )
    else:
        bbox = (
            (g["lon"] >= F.col("__min_lon"))
            & (g["lon"] <= F.col("__max_lon"))
            & (g["lat"] >= F.col("__min_lat"))
            & (g["lat"] <= F.col("__max_lat"))
        )
    # bbox prefilter (reference R-tree, geogr/filter.py:45-54) as a
    # broadcast theta-join, then the exact predicate.
    joined = source.join(F.broadcast(ar), on=bbox, how="inner")
    if is_line:
        all_in, any_in, crossing = _line_predicates(g, F.col("__poly"))
        pred = {
            "within": all_in & ~crossing,
            "intersects": any_in | crossing,
            "crosses": (any_in | crossing) & ~(all_in & ~crossing),
        }[method]
    else:
        pred = _point_in_ring(g, F.col("__poly"))
    joined = joined.filter(pred)
    return joined.select(*source.columns).dropDuplicates([c for c in ("id",) if c in source.columns] or None)
