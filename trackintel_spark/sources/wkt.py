"""WKT parse/format as pure Column expressions (no UDFs).

The reference round-trips geometry through shapely WKT in its CSV IO
(io/file.py:191, :259, :322 write with ``to_wkt``; readers use
``GeoSeries.from_wkt``). Here POINT / LINESTRING / MULTIPOINT / POLYGON
(exterior ring) map to the engine's struct/array representations with
regexp + split + transform expressions — fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_NUM = r"[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?"


def parse_wkt_point(col: Column) -> Column:
    """'POINT (lon lat)' -> struct<lon,lat>."""
    lon = F.regexp_extract(col, rf"POINT\s*\(\s*({_NUM})\s+{_NUM}\s*\)", 1)
    lat = F.regexp_extract(col, rf"POINT\s*\(\s*{_NUM}\s+({_NUM})\s*\)", 1)
    return F.when(
        F.trim(col) != "",
        F.struct(lon.cast("double").alias("lon"), lat.cast("double").alias("lat")),
    )


def _coord_seq(body: Column) -> Column:
    """'x1 y1, x2 y2, ...' -> array<struct<lon,lat>>."""
    parts = F.split(F.trim(body), r"\s*,\s*")
    return F.transform(
        parts,
        lambda p: F.struct(
            F.split(F.trim(p), r"\s+")[0].cast("double").alias("lon"),
            F.split(F.trim(p), r"\s+")[1].cast("double").alias("lat"),
        ),
    )


def parse_wkt_linestring(col: Column) -> Column:
    """'LINESTRING (x1 y1, x2 y2, ...)' -> array<struct<lon,lat>>.

    Anchored: a MULTILINESTRING yields NULL, never a corrupt array
    (its inner parens would land in the split tokens and cast to NULL
    doubles) — use :func:`parse_wkt_line_flat` to accept both.
    """
    body = F.regexp_extract(col, r"^\s*LINESTRING\s*\((.*)\)\s*$", 1)
    return F.when(body != "", _coord_seq(body))


def parse_wkt_line_flat(col: Column) -> Column:
    """LINESTRING or MULTILINESTRING -> one array<struct<lon,lat>>.

    Multi-part geometry is FLATTENED: the parts' coordinate sequences
    concatenate in order (part boundaries are lost — callers that need
    them should keep the WKT column too)."""
    ml = F.regexp_extract(col, r"^\s*MULTILINESTRING\s*\((.*)\)\s*$", 1)
    ml_flat = F.regexp_replace(F.regexp_replace(ml, r"\)\s*,\s*\(", ", "), r"[()]", "")
    ls = F.regexp_extract(col, r"^\s*LINESTRING\s*\((.*)\)\s*$", 1)
    body = F.when(ml != "", ml_flat).otherwise(ls)
    return F.when(body != "", _coord_seq(body))


def parse_wkt_polygon(col: Column) -> Column:
    """'POLYGON ((x1 y1, ...))' -> exterior ring array<struct<lon,lat>>."""
    body = F.regexp_extract(col, r"POLYGON\s*\(\s*\((.*?)\)", 1)
    return F.when(body != "", _coord_seq(body))


def parse_wkt_multipoint_od(col: Column) -> Column:
    """'MULTIPOINT (x1 y1, x2 y2)' (both bare and parenthesized member
    forms) -> struct<origin:point, dest:point> (trips geometry)."""
    body = F.regexp_extract(col, r"MULTIPOINT\s*\((.*)\)", 1)
    cleaned = F.regexp_replace(body, r"[()]", "")
    seq = _coord_seq(cleaned)
    return F.when(
        body != "",
        F.struct(F.element_at(seq, 1).alias("origin"), F.element_at(seq, 2).alias("dest")),
    )


def _fmt(v: Column) -> Column:
    # minimal float formatting: integral values keep '.0' off? The
    # reference writes shapely repr (full precision). format_number
    # would add commas; use plain cast which gives repr-style output.
    return v.cast("string")


def format_wkt_point(p: Column) -> Column:
    return F.when(
        p.isNotNull(), F.concat(F.lit("POINT ("), _fmt(p["lon"]), F.lit(" "), _fmt(p["lat"]), F.lit(")"))
    )


def format_wkt_linestring(vertices: Column) -> Column:
    coords = F.transform(vertices, lambda v: F.concat(_fmt(v["lon"]), F.lit(" "), _fmt(v["lat"])))
    return F.when(
        vertices.isNotNull(), F.concat(F.lit("LINESTRING ("), F.concat_ws(", ", coords), F.lit(")"))
    )


def format_wkt_polygon(ring: Column) -> Column:
    closed = F.when(
        (F.element_at(ring, 1)["lon"] == F.element_at(ring, -1)["lon"])
        & (F.element_at(ring, 1)["lat"] == F.element_at(ring, -1)["lat"]),
        ring,
    ).otherwise(F.concat(ring, F.array(F.element_at(ring, 1))))
    coords = F.transform(closed, lambda v: F.concat(_fmt(v["lon"]), F.lit(" "), _fmt(v["lat"])))
    return F.when(
        ring.isNotNull(), F.concat(F.lit("POLYGON (("), F.concat_ws(", ", coords), F.lit("))"))
    )


def format_wkt_multipoint_od(od: Column) -> Column:
    return F.when(
        od.isNotNull(),
        F.concat(
            F.lit("MULTIPOINT ("),
            _fmt(od["origin"]["lon"]), F.lit(" "), _fmt(od["origin"]["lat"]),
            F.lit(", "),
            _fmt(od["dest"]["lon"]), F.lit(" "), _fmt(od["dest"]["lat"]),
            F.lit(")"),
        ),
    )
