import math

import pytest
from pyspark.sql import functions as F

from trackintel_spark.functions import (
    haversine_m,
    linestring_length_m,
    meters_to_decimal_degrees,
    temp_overlap_ratio,
)


def _ref_haversine(lon1, lat1, lon2, lat2):
    """Great-circle distance, r=6371000 as in geogr/distances.py:15-86.

    The reference computes the law-of-cosines form; the engine uses the
    mathematically identical asin form (well-conditioned near zero
    distance). The two agree to ~1e-5 relative; this helper mirrors the
    engine formula so the equality check can stay tight.
    """
    la1, la2 = math.radians(lat1), math.radians(lat2)
    dlon_h = (math.radians(lon1) - math.radians(lon2)) / 2.0
    s = math.sqrt(math.sin((la1 - la2) / 2.0) ** 2 + math.cos(la1) * math.cos(la2) * math.sin(dlon_h) ** 2)
    return 2 * 6371000 * math.asin(min(1.0, s))


def test_haversine_matches_reference_formula(spark):
    cases = [
        (8.5, 47.4, 8.6, 47.5),
        (0.0, 0.0, 0.0, 0.0),
        (179.9, 10.0, -179.9, 10.0),  # dateline wrap
        (-122.4, 37.8, 2.35, 48.85),  # SF -> Paris
    ]
    df = spark.createDataFrame(cases, "lon1 double, lat1 double, lon2 double, lat2 double")
    got = df.select(haversine_m(F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")).alias("d")).collect()
    for row, c in zip(got, cases):
        assert abs(row.d - _ref_haversine(*c)) < 1e-6


def test_linestring_length(spark):
    df = spark.createDataFrame([(1,)], "id long").select(
        F.array(
            F.struct(F.lit(8.5).alias("lon"), F.lit(47.4).alias("lat")),
            F.struct(F.lit(8.5).alias("lon"), F.lit(47.41).alias("lat")),
            F.struct(F.lit(8.51).alias("lon"), F.lit(47.41).alias("lat")),
        ).alias("v")
    )
    (got,) = df.select(linestring_length_m(F.col("v")).alias("len")).collect()
    want = _ref_haversine(8.5, 47.4, 8.5, 47.41) + _ref_haversine(8.5, 47.41, 8.51, 47.41)
    assert abs(got.len - want) < 1e-6


def test_linestring_length_degenerate(spark):
    df = spark.createDataFrame([(1,)], "id long").select(
        F.array(F.struct(F.lit(8.5).alias("lon"), F.lit(47.4).alias("lat"))).alias("v")
    )
    (got,) = df.select(linestring_length_m(F.col("v")).alias("len")).collect()
    assert got.len == 0.0


def test_meters_to_decimal_degrees(spark):
    df = spark.createDataFrame([(111320.0, 0.0)], "m double, lat double")
    (got,) = df.select(meters_to_decimal_degrees(F.col("m"), F.col("lat")).alias("deg")).collect()
    assert abs(got.deg - 1.0) < 1e-9


def test_temp_overlap_ratio(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-01-01 01:00:00", "2024-01-01 00:30:00", "2024-01-01 02:00:00")],
        "s1 string, e1 string, s2 string, e2 string",
    ).select(*[F.to_timestamp(c).alias(c) for c in ("s1", "e1", "s2", "e2")])
    (got,) = df.select(
        temp_overlap_ratio(F.col("s1"), F.col("e1"), F.col("s2"), F.col("e2")).alias("r")
    ).collect()
    assert abs(got.r - 0.5) < 1e-12


def test_get_speed_triplegs_pfs_mean_speed(spark):
    """Reference geogr/distances.py:319-374: mean of member-pf speeds,
    skipping each leg's first pf (its speed has no in-leg predecessor)."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from trackintel_spark.geogr import get_speed_triplegs
    from trackintel_spark.functions.spatial import haversine_m as _h

    t0 = datetime(2024, 1, 1, 8, 0, 0)
    # leg 0: three pfs, 60 s apart, 0.001 deg lat steps
    pfs_rows = [
        (0, 1, t0, 8.5, 47.400, 0),
        (1, 1, t0 + timedelta(seconds=60), 8.5, 47.401, 0),
        (2, 1, t0 + timedelta(seconds=120), 8.5, 47.403, 0),
        (3, 1, t0 + timedelta(seconds=300), 8.5, 47.500, None),  # not in a leg
    ]
    pfs = spark.createDataFrame(
        [(i, u, ts, lon, lat, tl) for i, u, ts, lon, lat, tl in pfs_rows],
        "id long, user_id long, tracked_at timestamp, lon double, lat double, tripleg_id long",
    ).select("id", "user_id", "tracked_at", F.struct("lon", "lat").alias("geom"), "tripleg_id")
    tpls = spark.createDataFrame(
        [(0, 1, t0, t0 + timedelta(seconds=120), [(8.5, 47.400), (8.5, 47.401), (8.5, 47.403)])],
        "id long, user_id long, started_at timestamp, finished_at timestamp, geom array<struct<lon double, lat double>>",
    )
    out = get_speed_triplegs(tpls, pfs, method="pfs_mean_speed").collect()
    assert len(out) == 1
    # expected: mean of the two successor-pf speeds (first pf skipped)
    d1 = 0.001 * 111194.92664455873  # haversine over pure-lat 0.001 deg
    d2 = 0.002 * 111194.92664455873
    expected = (d1 / 60 + d2 / 60) / 2
    assert abs(out[0].speed - expected) / expected < 1e-3

    with pytest.raises(ValueError, match="requires positionfixes"):
        get_speed_triplegs(tpls, method="pfs_mean_speed")
