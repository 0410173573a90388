"""Fluent accessor layer: chained reference-style call sites over the
functional core (reference model/*.py accessor methods)."""

import pytest

from tests.conftest import make_pfs
from trackintel_spark.model import Positionfixes, Staypoints, Triplegs
from trackintel_spark.model.schemas import SchemaError


def _walkers(spark):
    # two users: a stay at home, a walk, a stay at work, long gap, stay home
    rows = []
    for u in range(2):
        t = 0
        for i in range(12):  # 1h at home
            rows.append((u * 100 + len(rows), u, f"2023-01-0{u+1}T08:{t:02d}:00Z", 8.50, 47.40))
            t += 5
        for i, frac in enumerate((0.2, 0.4, 0.6, 0.8)):  # 20 min walk
            rows.append((u * 100 + len(rows), u, f"2023-01-0{u+1}T09:{i*5:02d}:00Z", 8.50 + 0.02 * frac, 47.40))
        for i in range(12):  # 1h at work
            rows.append((u * 100 + len(rows), u, f"2023-01-0{u+1}T10:{i*5:02d}:00Z", 8.52, 47.40))
    return make_pfs(spark, rows)


@pytest.mark.slow
def test_accessor_pipeline_chains(spark):
    pfs = Positionfixes(_walkers(spark))

    pfs, sp = pfs.generate_staypoints(dist_threshold=150, time_threshold=20, gap_threshold=600)
    assert isinstance(sp, Staypoints)
    n_sp = sp.count()  # __getattr__ proxies to the DataFrame
    assert n_sp >= 4  # >=2 stays per user

    pfs, tpls = pfs.generate_triplegs(sp)
    assert isinstance(tpls, Triplegs)
    assert tpls.count() >= 2

    sp = sp.create_activity_flag(time_threshold=15)
    sp2, tpls2, trips = sp.generate_trips(tpls, gap_threshold=15)
    assert trips.count() >= 2
    assert "trip_id" in tpls2.df.columns and "next_trip_id" in sp2.df.columns

    sp3, locs = sp2.generate_locations(epsilon=100, num_samples=1)
    assert locs.count() >= 2 and "center" in locs.df.columns

    # analysis passthroughs return plain DataFrames
    rg = sp2.radius_gyration()
    assert set(rg.columns) == {"user_id", "radius_gyration"}
    speeds = tpls2.get_speed()
    assert "speed" in speeds.df.columns


def test_accessor_validates_on_construction(spark):
    bad = _walkers(spark).drop("tracked_at")
    with pytest.raises(SchemaError):
        Positionfixes(bad)


def test_accessor_center_property(spark):
    pfs = Positionfixes(_walkers(spark))
    lon, lat = pfs.center
    assert 8.49 < lon < 8.53 and 47.39 < lat < 47.41


@pytest.mark.slow
def test_trips_generate_tours_roundtrip(spark):
    pfs = Positionfixes(_walkers(spark))
    _, sp = pfs.generate_staypoints(dist_threshold=150, time_threshold=20, gap_threshold=600)
    _, tpls = pfs.generate_triplegs(sp)
    sp = sp.create_activity_flag(time_threshold=15)
    _, _, trips = sp.generate_trips(tpls, gap_threshold=15)
    trips2, tours = trips.generate_tours(max_dist=5000)
    assert "tour_id" in trips2.df.columns
    assert tours.count() >= 0  # tours table materializes with the contract schema
    assert {"id", "user_id", "started_at", "finished_at"} <= set(tours.df.columns)


def test_staypoints_entropy_and_trips_od_accessors(spark):
    from pyspark.sql import functions as F

    from trackintel_spark.model import Staypoints, Trips

    sp_rows = []
    for k in range(8):
        sp_rows.append((k, 1, k * 3600, (k + 1) * 3600 - 600, 8.5, 47.4, k % 2))
    sp = spark.createDataFrame(
        sp_rows, "id long, user_id long, s long, f long, lon double, lat double, location_id long"
    ).select(
        "id", "user_id",
        F.timestamp_seconds(F.col("s") + 1700000000).alias("started_at"),
        F.timestamp_seconds(F.col("f") + 1700000000).alias("finished_at"),
        F.struct("lon", "lat").alias("geom"), "location_id",
    )
    ent = Staypoints(sp).location_entropy("uncorrelated").collect()
    assert len(ent) == 1 and abs(ent[0]["entropy"] - 1.0) < 1e-9

    trips = spark.createDataFrame(
        [(1, 1, 0, 1), (2, 1, 2, 3)],
        "id long, user_id long, origin_staypoint_id long, destination_staypoint_id long",
    ).select(
        "id", "user_id",
        F.timestamp_seconds(F.lit(1700000000)).alias("started_at"),
        F.timestamp_seconds(F.lit(1700003600)).alias("finished_at"),
        "origin_staypoint_id", "destination_staypoint_id",
    )
    od = Trips(trips).origin_destination_matrix(sp.select("id", "location_id"))
    got = {(r["origin"], r["destination"]): r["n_trips"] for r in od.collect()}
    assert got == {(0, 1): 2}
