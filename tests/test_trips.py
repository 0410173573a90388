"""generate_trips tests modeled on the reference's gap-golden scenario
(tests/data/trips/sp_tpls_gaps.csv semantics)."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from trackintel_spark.operators import generate_trips

T0 = datetime(2024, 1, 1, 8, 0, 0)


def _mk_sp(spark, rows):
    """(id, user, start_min, end_min, is_activity, lon, lat)"""
    df = spark.createDataFrame(
        [(i, u, T0 + timedelta(minutes=s), T0 + timedelta(minutes=e), a, lon, lat) for i, u, s, e, a, lon, lat in rows],
        "id long, user_id long, started_at timestamp, finished_at timestamp, is_activity boolean, lon double, lat double",
    )
    return df.select("id", "user_id", "started_at", "finished_at", "is_activity",
                     F.struct("lon", "lat").alias("geom"))


def _mk_tpls(spark, rows):
    """(id, user, start_min, end_min, [(lon,lat)...])"""
    data = [
        (i, u, T0 + timedelta(minutes=s), T0 + timedelta(minutes=e), [{"lon": p[0], "lat": p[1]} for p in pts])
        for i, u, s, e, pts in rows
    ]
    return spark.createDataFrame(
        data,
        "id long, user_id long, started_at timestamp, finished_at timestamp, "
        "geom array<struct<lon:double,lat:double>>",
    )


def _basic(spark):
    # user 1: activity A (0-30) -> leg0 (31-40) -> staypoint non-act (41-45)
    #         -> leg1 (46-60) -> activity B (61-120) -> leg2 (125-130)
    #         -> [GAP > 15] -> leg3 (160-170) -> activity C (171-200)
    sp = _mk_sp(
        spark,
        [
            (0, 1, 0, 30, True, 8.50, 47.40),
            (1, 1, 41, 45, False, 8.55, 47.42),
            (2, 1, 61, 120, True, 8.60, 47.45),
            (3, 1, 171, 200, True, 8.80, 47.55),
        ],
    )
    tpls = _mk_tpls(
        spark,
        [
            (0, 1, 31, 40, [(8.50, 47.40), (8.55, 47.42)]),
            (1, 1, 46, 60, [(8.55, 47.42), (8.60, 47.45)]),
            (2, 1, 125, 130, [(8.60, 47.45), (8.65, 47.47)]),
            (3, 1, 160, 170, [(8.75, 47.52), (8.80, 47.55)]),
        ],
    )
    return sp, tpls


def test_trip_segmentation_and_ids(spark):
    sp, tpls = _basic(spark)
    sp_o, tpls_o, trips = generate_trips(sp, tpls, gap_threshold=15)
    got = trips.orderBy("id").collect()
    # trip0: leg0 + sp1 + leg1 (A -> B); trip1: leg2 (B -> gap);
    # trip2: leg3 (gap -> C)
    assert [r.id for r in got] == [0, 1, 2]
    assert got[0].origin_staypoint_id == 0 and got[0].destination_staypoint_id == 2
    assert got[0].started_at == T0 + timedelta(minutes=31)
    assert got[0].finished_at == T0 + timedelta(minutes=60)
    # trip1 ends at a gap -> unknown destination
    assert got[1].origin_staypoint_id == 2 and got[1].destination_staypoint_id is None
    # trip2 starts after the gap -> unknown origin
    assert got[2].origin_staypoint_id is None and got[2].destination_staypoint_id == 3


def test_geometry_imputation_at_gaps(spark):
    sp, tpls = _basic(spark)
    _, _, trips = generate_trips(sp, tpls, gap_threshold=15)
    got = {r.id: r for r in trips.collect()}
    # trip1 destination imputed from last coord of its last tripleg (leg2)
    assert got[1].geom.dest.lon == 8.65 and got[1].geom.dest.lat == 47.47
    # trip2 origin imputed from first coord of leg3
    assert got[2].geom.origin.lon == 8.75 and got[2].geom.origin.lat == 47.52
    # trip0 endpoints are the activity staypoint geometries
    assert got[0].geom.origin.lon == 8.50 and got[0].geom.dest.lon == 8.60


def test_linkage_columns(spark):
    sp, tpls = _basic(spark)
    sp_o, tpls_o, trips = generate_trips(sp, tpls, gap_threshold=15)
    tpl_links = {r.id: r.trip_id for r in tpls_o.collect()}
    assert tpl_links == {0: 0, 1: 0, 2: 1, 3: 2}
    sp_rows = {r.id: r for r in sp_o.collect()}
    # non-activity staypoint 1 belongs to trip 0
    assert sp_rows[1].trip_id == 0
    # activity staypoints carry prev/next
    assert sp_rows[0].prev_trip_id is None and sp_rows[0].next_trip_id == 0
    assert sp_rows[2].prev_trip_id == 0 and sp_rows[2].next_trip_id == 1
    assert sp_rows[3].prev_trip_id == 2 and sp_rows[3].next_trip_id is None


def test_trip_without_triplegs_dropped(spark):
    # activity, lone non-activity staypoint, activity -> no trip at all
    sp = _mk_sp(
        spark,
        [
            (0, 1, 0, 30, True, 8.5, 47.4),
            (1, 1, 31, 40, False, 8.55, 47.42),
            (2, 1, 41, 90, True, 8.6, 47.45),
        ],
    )
    tpls = _mk_tpls(spark, [(0, 2, 0, 10, [(1.0, 1.0), (1.1, 1.1)])])
    _, _, trips = generate_trips(sp, tpls, gap_threshold=15)
    assert trips.filter(F.col("user_id") == 1).count() == 0
    assert trips.filter(F.col("user_id") == 2).count() == 1


def test_requires_is_activity(spark):
    sp, tpls = _basic(spark)
    import pytest

    with pytest.raises(AttributeError, match="is_activity"):
        generate_trips(sp.drop("is_activity"), tpls)


def test_trips_partition_count_invariance(spark):
    sp, tpls = _basic(spark)
    outs = []
    for n in (1, 7):
        _, _, trips = generate_trips(sp.repartition(n), tpls.repartition(n), gap_threshold=15)
        outs.append(sorted(map(str, trips.drop("geom").collect())))
    assert outs[0] == outs[1]
