"""Visualization layer preparation (reference visualization/plotting.py).

matplotlib is absent in this container, so these tests cover the
distributed half of the port — bounds, decimation, reprojection,
radius conversion, modal-split pivot framing — and assert the render
entry points fail with clear errors rather than import crashes.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import make_pfs
from trackintel_spark.visualization import (
    a4_figsize,
    modal_split_frame,
    plot,
    prepare_plot_layers,
)


def _sp(spark, rows):
    """rows: (id, user_id, start_iso, finish_iso, lon, lat)"""
    df = spark.createDataFrame(
        rows, "id long, user_id long, started_at string, finished_at string, lon double, lat double"
    )
    return df.select(
        "id", "user_id",
        F.to_timestamp("started_at").alias("started_at"),
        F.to_timestamp("finished_at").alias("finished_at"),
        F.struct("lon", "lat").alias("geom"),
    )


def test_a4_figsize_matches_reference_constants():
    w, h = a4_figsize(columns=2)
    assert w == pytest.approx(174.0 / 25.4)
    assert h == pytest.approx(174.0 * (math.sqrt(5) - 1) / 2 / 25.4)
    w1, _ = a4_figsize(columns=1)
    assert w1 == pytest.approx(84.0 / 25.4)
    # 234 mm height cap
    _, hcap = a4_figsize(fig_height_mm=500, columns=2)
    assert hcap == pytest.approx(234.0 / 25.4)
    with pytest.raises(ValueError):
        a4_figsize(columns=3)


def test_bounds_positionfixes_unpadded(spark):
    pfs = make_pfs(spark, [
        (1, 1, "2023-01-01 00:00:00", 8.50, 47.30),
        (2, 1, "2023-01-01 00:01:00", 8.60, 47.40),
    ])
    layers = prepare_plot_layers(positionfixes=pfs)
    west, south, east, north = layers.bbox
    assert (west, south, east, north) == pytest.approx((8.50, 47.30, 8.60, 47.40))
    assert list(layers.positionfixes.columns) == ["lon", "lat"]
    assert len(layers.positionfixes) == 2
    assert layers.staypoints is None and layers.triplegs is None and layers.locations is None


def test_bounds_staypoints_padded_and_radius(spark):
    sp = _sp(spark, [
        (1, 1, "2023-01-01 00:00:00", "2023-01-01 01:00:00", 8.50, -0.01),
        (2, 1, "2023-01-01 02:00:00", "2023-01-01 03:00:00", 8.60, 0.01),
    ])
    layers = prepare_plot_layers(staypoints=sp, radius_sp=100.0)
    west, south, east, north = layers.bbox
    assert (west, south, east, north) == pytest.approx((8.47, -0.04, 8.63, 0.04))
    # equatorial bbox midpoint: radius = m / 111.32 km exactly
    assert layers.radius_sp_deg == pytest.approx(100.0 / 111_320.0, rel=1e-6)


def test_triplegs_vertex_bounds_and_coords(spark):
    tpls = spark.createDataFrame(
        [(1, 1, "2023-01-01 00:00:00", "2023-01-01 00:10:00",
          [(8.5, 47.3), (8.7, 47.5)])],
        "id long, user_id long, started_at string, finished_at string, "
        "geom array<struct<lon:double,lat:double>>",
    ).select(
        "id", "user_id",
        F.to_timestamp("started_at").alias("started_at"),
        F.to_timestamp("finished_at").alias("finished_at"),
        "geom",
    )
    layers = prepare_plot_layers(triplegs=tpls)
    assert layers.bbox == pytest.approx((8.5 - 0.03, 47.3 - 0.03, 8.7 + 0.03, 47.5 + 0.03))
    coords = list(layers.triplegs["coords"])
    assert len(coords) == 1
    assert [list(p) for p in coords[0]] == [[8.5, 47.3], [8.7, 47.5]]


def test_decimation_bounds_rows_deterministically(spark):
    pfs = make_pfs(spark, [
        (i, 1, "2023-01-01 00:00:00", 8.0 + i * 1e-4, 47.0) for i in range(200)
    ])
    a = prepare_plot_layers(positionfixes=pfs, max_rows_per_layer=50)
    b = prepare_plot_layers(positionfixes=pfs, max_rows_per_layer=50)
    assert len(a.positionfixes) == 50
    # hash top-k is deterministic: identical runs select identical rows
    assert a.positionfixes["lon"].tolist() == b.positionfixes["lon"].tolist()
    # bounds still reflect ALL data, not the decimated subset
    assert a.bbox[0] == pytest.approx(8.0)
    assert a.bbox[2] == pytest.approx(8.0 + 199 * 1e-4)


def test_planar_input_reprojected_to_wgs84(spark):
    # Web Mercator coordinates of (lon=8.6, lat=47.4)
    from trackintel_spark.geogr.crs import WEB_MERCATOR

    x = 8.6 * math.pi / 180 * 6378137.0
    y = math.log(math.tan(math.pi / 4 + 47.4 * math.pi / 180 / 2)) * 6378137.0
    pfs = spark.createDataFrame(
        [(1, 1, "2023-01-01 00:00:00", x, y)],
        "id long, user_id long, tracked_at string, lon double, lat double",
    ).select(
        "id", "user_id", F.to_timestamp("tracked_at").alias("tracked_at"),
        F.struct("lon", "lat").alias("geom"),
    )
    layers = prepare_plot_layers(positionfixes=pfs, epsg=WEB_MERCATOR)
    assert layers.positionfixes["lon"][0] == pytest.approx(8.6, abs=1e-9)
    assert layers.positionfixes["lat"][0] == pytest.approx(47.4, abs=1e-9)


def test_all_none_raises():
    with pytest.raises(ValueError):
        prepare_plot_layers()


def test_plot_osm_unsupported(spark):
    pfs = make_pfs(spark, [(1, 1, "2023-01-01 00:00:00", 8.5, 47.3)])
    with pytest.raises(NotImplementedError):
        plot(positionfixes=pfs, plot_osm=True)


def test_plot_requires_matplotlib_cleanly(spark):
    pytest.importorskip  # matplotlib IS absent in this container
    try:
        import matplotlib  # noqa: F401
        pytest.skip("matplotlib installed; render path exercised elsewhere")
    except ImportError:
        pass
    pfs = make_pfs(spark, [(1, 1, "2023-01-01 00:00:00", 8.5, 47.3)])
    with pytest.raises(ImportError, match="prepare_plot_layers"):
        plot(positionfixes=pfs)


def test_modal_split_frame_pivots_by_bucket(spark):
    from trackintel_spark.analysis.modal_split import calculate_modal_split

    tpls = spark.createDataFrame(
        [
            (1, 1, "2023-01-02 08:00:00", "2023-01-02 09:00:00", "walk"),
            (2, 1, "2023-01-02 10:00:00", "2023-01-02 11:00:00", "car"),
            (3, 1, "2023-01-03 08:00:00", "2023-01-03 09:00:00", "walk"),
        ],
        "id long, user_id long, started_at string, finished_at string, mode string",
    ).select(
        "id", "user_id",
        F.to_timestamp("started_at").alias("started_at"),
        F.to_timestamp("finished_at").alias("finished_at"),
        F.lit(None).cast("array<struct<lon:double,lat:double>>").alias("geom"),
        "mode",
    )
    ms = calculate_modal_split(tpls, freq="D", metric="count")
    pdf = modal_split_frame(ms)
    assert sorted(pdf.columns) == ["car", "walk"]
    assert len(pdf) == 2
    assert pdf["walk"].tolist() == [1.0, 1.0]
    assert pdf["car"].tolist() == [1.0, 0.0]
    assert str(pdf.index.dtype).startswith("datetime64")


def test_modal_split_frame_rejects_per_user_and_unbucketed(spark):
    from trackintel_spark.analysis.modal_split import calculate_modal_split

    tpls = spark.createDataFrame(
        [(1, 1, "2023-01-02 08:00:00", "2023-01-02 09:00:00", "walk")],
        "id long, user_id long, started_at string, finished_at string, mode string",
    ).select(
        "id", "user_id",
        F.to_timestamp("started_at").alias("started_at"),
        F.to_timestamp("finished_at").alias("finished_at"),
        F.lit(None).cast("array<struct<lon:double,lat:double>>").alias("geom"),
        "mode",
    )
    with pytest.raises(ValueError, match="per_user"):
        modal_split_frame(calculate_modal_split(tpls, freq="D", per_user=True))
    with pytest.raises(ValueError, match="freq"):
        modal_split_frame(calculate_modal_split(tpls, freq=None))
