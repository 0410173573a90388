"""generate_triplegs tests: segmentation triggers, <2-pf legs dropped,
zero-extent geometry dropped, case-2 interval matching."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from tests.conftest import make_pfs
from trackintel_spark.operators import generate_staypoints, generate_triplegs

T0 = datetime(2024, 1, 1, 8, 0, 0)


def _ts(minutes):
    return (T0 + timedelta(minutes=minutes)).strftime("%Y-%m-%dT%H:%M:%SZ")


def _pipeline_fixture(spark):
    """stay A (0-10), transit pfs (12,13,14 distinct points), stay B (16-26),
    closing pf 28; staypoints from generate_staypoints."""
    rows = []
    i = 0
    for m in range(0, 11, 2):
        rows.append((i, 1, _ts(m), 8.5, 47.4))
        i += 1
    for k, m in enumerate((12, 13, 14)):
        rows.append((i, 1, _ts(m), 8.52 + 0.01 * k, 47.42))
        i += 1
    for m in range(16, 27, 2):
        rows.append((i, 1, _ts(m), 8.7, 47.5))
        i += 1
    rows.append((i, 1, _ts(28), 8.9, 47.7))
    return make_pfs(spark, rows)


def test_one_leg_between_two_staypoints(spark):
    pfs = _pipeline_fixture(spark)
    pfs_sp, sp = generate_staypoints(pfs, dist_threshold=100, time_threshold=5, gap_threshold=60)
    pfs_out, tpls = generate_triplegs(pfs_sp, gap_threshold=60)
    legs = tpls.orderBy("id").collect()
    assert len(legs) == 1
    leg = legs[0]
    assert leg.id == 0
    # leg spans the three transit pfs: started_at = first pf after sp A
    assert leg.started_at == T0 + timedelta(minutes=12)
    assert leg.finished_at == T0 + timedelta(minutes=14)
    assert [(p.lon, p.lat) for p in leg.geom] == [(8.52, 47.42), (8.53, 47.42), (8.54, 47.42)]
    linked = {r.id: r.tripleg_id for r in pfs_out.collect()}
    assert linked[6] == 0 and linked[7] == 0 and linked[8] == 0
    assert linked[0] is None  # staypoint member
    # trailing single pf after staypoint B: 1-pf leg -> dropped
    assert linked[15] is None


def test_gap_splits_legs(spark):
    rows = [
        (0, 1, _ts(0), 8.50, 47.40),
        (1, 1, _ts(2), 8.51, 47.41),
        (2, 1, _ts(4), 8.52, 47.42),
        # 30-min gap
        (3, 1, _ts(34), 8.60, 47.50),
        (4, 1, _ts(36), 8.61, 47.51),
    ]
    pfs = make_pfs(spark, rows).withColumn("staypoint_id", F.lit(None).cast("long"))
    _, tpls = generate_triplegs(pfs, gap_threshold=15)
    legs = tpls.orderBy("id").collect()
    assert len(legs) == 2
    assert legs[0].finished_at == T0 + timedelta(minutes=4)
    assert legs[1].started_at == T0 + timedelta(minutes=34)


def test_user_change_splits_legs(spark):
    rows = [
        (0, 1, _ts(0), 8.50, 47.40),
        (1, 1, _ts(2), 8.51, 47.41),
        (2, 2, _ts(1), 9.50, 48.40),
        (3, 2, _ts(3), 9.51, 48.41),
    ]
    pfs = make_pfs(spark, rows).withColumn("staypoint_id", F.lit(None).cast("long"))
    _, tpls = generate_triplegs(pfs, gap_threshold=15)
    legs = tpls.orderBy("id").collect()
    assert [(r.id, r.user_id) for r in legs] == [(0, 1), (1, 2)]


def test_zero_extent_leg_dropped(spark):
    rows = [
        (0, 1, _ts(0), 8.50, 47.40),
        (1, 1, _ts(2), 8.50, 47.40),  # identical points -> invalid LineString
    ]
    pfs = make_pfs(spark, rows).withColumn("staypoint_id", F.lit(None).cast("long"))
    pfs_out, tpls = generate_triplegs(pfs, gap_threshold=15)
    assert tpls.count() == 0
    assert all(r.tripleg_id is None for r in pfs_out.collect())


def test_case2_staypoints_without_link(spark):
    pfs = _pipeline_fixture(spark)
    pfs_sp, sp = generate_staypoints(pfs, dist_threshold=100, time_threshold=5, gap_threshold=60)
    # strip the staypoint_id column: case 2 must re-derive membership
    pfs_nolink = pfs_sp.drop("staypoint_id")
    _, tpls_case2 = generate_triplegs(pfs_nolink, staypoints=sp, gap_threshold=60)
    _, tpls_case1 = generate_triplegs(pfs_sp, gap_threshold=60)
    got1 = [(r.id, r.started_at, r.finished_at) for r in tpls_case1.orderBy("id").collect()]
    got2 = [(r.id, r.started_at, r.finished_at) for r in tpls_case2.orderBy("id").collect()]
    assert got1 == got2


def test_overlap_staypoints_method(spark):
    pfs = _pipeline_fixture(spark)
    pfs_sp, sp = generate_staypoints(pfs, dist_threshold=100, time_threshold=5, gap_threshold=60)
    pfs_b, tpls_b = generate_triplegs(pfs_sp, gap_threshold=60)
    pfs_o, tpls_o = generate_triplegs(pfs_sp, staypoints=sp, method="overlap_staypoints", gap_threshold=60)
    leg_b = tpls_b.orderBy("id").collect()[0]
    leg_o = tpls_o.orderBy("id").collect()[0]
    # started_at unchanged; finished_at extends to the first pf of the
    # following staypoint (reference docstring :227-228)
    assert leg_o.started_at == leg_b.started_at
    assert leg_o.finished_at > leg_b.finished_at
    assert leg_o.finished_at == T0 + timedelta(minutes=16)
    # geometry shares endpoints with the bounding staypoint centroids
    sps = {r.id: r for r in sp.collect()}
    assert abs(leg_o.geom[0].lon - sps[0].geom.lon) < 1e-9
    assert abs(leg_o.geom[-1].lon - sps[1].geom.lon) < 1e-9
    # between-method geometry does NOT include staypoint coords
    assert leg_b.geom[0].lon != leg_o.geom[0].lon


def test_overlap_staypoints_requires_inputs(spark):
    import pytest

    pfs = _pipeline_fixture(spark)
    pfs_sp, sp = generate_staypoints(pfs, dist_threshold=100, time_threshold=5, gap_threshold=60)
    with pytest.raises(TypeError, match="staypoints input"):
        generate_triplegs(pfs_sp, method="overlap_staypoints")
    with pytest.raises(TypeError, match="staypoint_id column"):
        generate_triplegs(pfs_sp.drop("staypoint_id"), staypoints=sp, method="overlap_staypoints")
