"""Distributed shapefile reader vs hand-written .shp/.shx/.dbf bytes.

The writer below packs the ESRI Technical Description layouts directly,
so the reader is tested against the spec, not against itself.
"""

from __future__ import annotations

import os
import zipfile

import pytest

from trackintel_spark.sources.shapefile import read_shapefile


from _shp_writer import (  # noqa: E402
    _null_shape,
    _point,
    _polygon,
    _polyline,
    write_shapefile,
)

# --------------------------------------------------------------------------

FIELDS = [("HHNR", "N", 8, 0), ("ETNR", "N", 4, 0), ("NAME", "C", 12, 0), ("WT", "N", 8, 3)]


@pytest.fixture()
def polyline_shp(tmp_path):
    base = str(tmp_path / "routes")
    shapes = [
        _polyline([[(8.5, 47.3), (8.6, 47.4)]]),
        _polyline([[(7.0, 46.0), (7.1, 46.1), (7.2, 46.0)], [(7.5, 46.5), (7.6, 46.6)]]),
        _null_shape(),
    ]
    rows = [(101, 1, "zurich", 1.5), (102, 2, "bern", 2.25), (103, 3, None, None)]
    write_shapefile(base, shapes, 3, FIELDS, rows)
    return base + ".shp"


def test_polyline_roundtrip(spark, polyline_shp):
    df = read_shapefile(spark, polyline_shp)
    rows = {r["shape_id"]: r for r in df.collect()}
    assert len(rows) == 3
    assert rows[0]["HHNR"] == 101 and rows[0]["NAME"] == "zurich"
    assert rows[0]["geometry"] == "LINESTRING (8.5 47.3, 8.6 47.4)"
    assert rows[1]["geometry"] == (
        "MULTILINESTRING ((7 46, 7.1 46.1, 7.2 46), (7.5 46.5, 7.6 46.6))"
    )
    assert rows[1]["WT"] == pytest.approx(2.25)
    assert rows[2]["geometry"] is None and rows[2]["NAME"] is None and rows[2]["WT"] is None
    # dbf typing: N/0 -> bigint, N/dec -> double, C -> string
    dt = dict(df.dtypes)
    assert dt["HHNR"] == "bigint" and dt["WT"] == "double" and dt["NAME"] == "string"


def test_point_and_polygon(spark, tmp_path):
    base = str(tmp_path / "mix")
    shapes = [_point(8.55, 47.37)]
    write_shapefile(base, shapes, 1, [("ID", "N", 4, 0)], [(7,)])
    df = read_shapefile(spark, base + ".shp")
    assert df.collect()[0]["geometry"] == "POINT (8.55 47.37)"

    base2 = str(tmp_path / "poly")
    outer = [(0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0)]  # CW = ESRI outer
    hole = [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)]  # CCW = hole
    write_shapefile(base2, [_polygon([outer, hole])], 5, [("ID", "N", 4, 0)], [(1,)])
    g = read_shapefile(spark, base2 + ".shp").collect()[0]["geometry"]
    assert g.startswith("POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0), (1 1, 2 1,")


def test_zip_and_column_pruning(spark, tmp_path, polyline_shp):
    zpath = str(tmp_path / "routes.zip")
    base = polyline_shp[:-4]
    with zipfile.ZipFile(zpath, "w") as zf:
        for ext in (".shp", ".shx", ".dbf"):
            zf.write(base + ext, "CH_routen/routes" + ext)
    df = read_shapefile(spark, zpath, columns=["HHNR", "ETNR"])
    assert set(df.columns) == {"HHNR", "ETNR", "shape_id", "geometry"}
    assert df.count() == 3
    with pytest.raises(ValueError, match="not in dbf"):
        read_shapefile(spark, zpath, columns=["NOPE"])
    # NON-PREFIX pruning: skipped fields before the selected ones must
    # not shift byte offsets — values still read from true positions
    part = {r["shape_id"]: r for r in
            read_shapefile(spark, zpath, columns=["ETNR", "WT"]).collect()}
    assert [part[i]["ETNR"] for i in range(3)] == [1, 2, 3]
    assert part[0]["WT"] == pytest.approx(1.5) and part[1]["WT"] == pytest.approx(2.25)
    assert part[2]["WT"] is None


def test_many_records_partitioned(spark, tmp_path):
    """Ranges split across tasks; order and values survive the shuffle."""
    base = str(tmp_path / "many")
    n = 1000
    shapes = [_point(float(i), float(-i)) for i in range(n)]
    write_shapefile(base, shapes, 1, [("ID", "N", 8, 0)], [(i,) for i in range(n)])
    df = read_shapefile(spark, base + ".shp", target_records_per_task=97)
    got = df.orderBy("shape_id").collect()
    assert len(got) == n
    assert all(r["ID"] == r["shape_id"] for r in got)
    assert got[777]["geometry"] == "POINT (777 -777)"


def test_missing_shx_fallback(spark, tmp_path):
    base = str(tmp_path / "noshx")
    write_shapefile(base, [_point(1.0, 2.0), _point(3.0, 4.0)], 1,
                    [("ID", "N", 4, 0)], [(1,), (2,)])
    os.remove(base + ".shx")
    df = read_shapefile(spark, base + ".shp")
    assert [r["geometry"] for r in df.orderBy("shape_id").collect()] == [
        "POINT (1 2)", "POINT (3 4)"
    ]


def test_hypothesis_polyline_roundtrip(spark, tmp_path):
    """Fuzz the binary parser: random multi-part polylines + dbf rows
    written by the spec-writer must round-trip exactly."""
    import random

    rng = random.Random(42)
    for trial in range(3):
        shapes, rows, expect = [], [], []
        for i in range(rng.randint(1, 40)):
            parts = []
            for _ in range(rng.randint(1, 3)):
                pts = [
                    (round(rng.uniform(-179, 179), 6), round(rng.uniform(-89, 89), 6))
                    for _ in range(rng.randint(2, 12))
                ]
                parts.append(pts)
            shapes.append(_polyline(parts))
            rows.append((i, rng.randint(-9999999, 9999999)))
            expect.append(parts)
        base = str(tmp_path / f"fuzz{trial}")
        write_shapefile(base, shapes, 3, [("ID", "N", 4, 0), ("V", "N", 10, 0)], rows)
        got = read_shapefile(spark, base + ".shp", target_records_per_task=7)
        recs = {r["shape_id"]: r for r in got.collect()}
        assert len(recs) == len(shapes)
        for i, parts in enumerate(expect):
            wkt = recs[i]["geometry"]
            n_pts = sum(len(p) for p in parts)
            assert wkt.count(",") == n_pts - 1
            if len(parts) == 1:
                assert wkt.startswith("LINESTRING (")
            else:
                assert wkt.startswith("MULTILINESTRING (")
                assert wkt.count("(") == len(parts) + 1
            # first vertex survives byte-exact through the float repr
            x0, y0 = parts[0][0]
            assert wkt.split("(")[-1 if len(parts) == 1 else 2].startswith(
                f"{x0:.10g} {y0:.10g}"
            ) or f"{x0:.10g} {y0:.10g}" in wkt
            assert recs[i]["V"] == rows[i][1]


def test_shapefile_polygons_drive_spatial_filter(spark, tmp_path):
    """End-to-end synergy: polygon areas read from a shapefile feed
    spatial_filter — the workflow a reference user runs with
    gpd.read_file + within()."""
    from pyspark.sql import functions as F

    from trackintel_spark.geogr.filter import spatial_filter
    from trackintel_spark.sources import wkt

    base = str(tmp_path / "areas")
    # CW outer ring around (8.50-8.52, 47.39-47.41)
    ring = [(8.50, 47.39), (8.50, 47.41), (8.52, 47.41), (8.52, 47.39), (8.50, 47.39)]
    write_shapefile(base, [_polygon([ring])], 5, [("NAME", "C", 8, 0)], [("zone1",)])

    areas = read_shapefile(spark, base + ".shp").select(
        wkt.parse_wkt_polygon(F.col("geometry")).alias("polygon")
    )
    pts = spark.createDataFrame(
        [(0, 8.51, 47.40), (1, 8.60, 47.40), (2, 8.505, 47.395)],
        "id long, lon double, lat double",
    ).select("id", F.struct("lon", "lat").alias("geom"))
    got = sorted(r.id for r in spatial_filter(pts, areas, method="within").collect())
    assert got == [0, 2]
