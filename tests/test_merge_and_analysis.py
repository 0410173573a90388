"""merge_staypoints, activity flag, transport mode, metrics, modal split,
tracking quality."""

import math
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from trackintel_spark.analysis import (
    calculate_modal_split,
    create_activity_flag,
    predict_transport_mode,
    radius_gyration,
    temporal_tracking_quality,
)
from trackintel_spark.analysis.metrics import jump_length
from trackintel_spark.analysis.tracking_quality import split_overlaps
from trackintel_spark.operators import merge_staypoints

T0 = datetime(2024, 1, 1, 8, 0, 0)


def _mk_sp(spark, rows, with_loc=False):
    schema = "id long, user_id long, started_at timestamp, finished_at timestamp, lon double, lat double"
    if with_loc:
        schema += ", location_id long"
    data = [
        (r[0], r[1], T0 + timedelta(minutes=r[2]), T0 + timedelta(minutes=r[3]), r[4], r[5], *r[6:])
        for r in rows
    ]
    df = spark.createDataFrame(data, schema)
    cols = ["id", "user_id", "started_at", "finished_at", F.struct("lon", "lat").alias("geom")]
    if with_loc:
        cols.append("location_id")
    return df.select(*cols)


def _mk_tpls(spark, rows):
    data = [
        (i, u, T0 + timedelta(minutes=s), T0 + timedelta(minutes=e), [{"lon": p[0], "lat": p[1]} for p in pts])
        for i, u, s, e, pts in rows
    ]
    return spark.createDataFrame(
        data,
        "id long, user_id long, started_at timestamp, finished_at timestamp, geom array<struct<lon:double,lat:double>>",
    )


# -- merge_staypoints ---------------------------------------------------------


def test_merge_chain(spark):
    # three same-location staypoints within gap -> one merged row
    sp = _mk_sp(
        spark,
        [
            (0, 1, 0, 10, 8.5, 47.4, 5),
            (1, 1, 15, 25, 8.5, 47.4, 5),
            (2, 1, 30, 40, 8.5, 47.4, 5),
            (3, 1, 120, 130, 8.5, 47.4, 5),  # too far in time
        ],
        with_loc=True,
    )
    tpls = _mk_tpls(spark, [])  # empty triplegs
    tpls = spark.createDataFrame(
        [], "id long, user_id long, started_at timestamp, finished_at timestamp, geom array<struct<lon:double,lat:double>>"
    )
    out = merge_staypoints(sp, tpls, max_time_gap=10).orderBy("started_at").collect()
    assert len(out) == 2
    assert out[0].id == 0
    assert out[0].started_at == T0 and out[0].finished_at == T0 + timedelta(minutes=40)
    assert out[1].id == 3


def test_merge_blocked_by_tripleg(spark):
    sp = _mk_sp(
        spark,
        [(0, 1, 0, 10, 8.5, 47.4, 5), (1, 1, 15, 25, 8.5, 47.4, 5)],
        with_loc=True,
    )
    tpls = _mk_tpls(spark, [(0, 1, 11, 14, [(8.5, 47.4), (8.51, 47.41)])])
    out = merge_staypoints(sp, tpls, max_time_gap=10).collect()
    assert len(out) == 2


def test_merge_different_location_not_merged(spark):
    sp = _mk_sp(
        spark,
        [(0, 1, 0, 10, 8.5, 47.4, 5), (1, 1, 15, 25, 8.5, 47.4, 6)],
        with_loc=True,
    )
    tpls = _mk_tpls(spark, [])
    tpls = spark.createDataFrame(
        [], "id long, user_id long, started_at timestamp, finished_at timestamp, geom array<struct<lon:double,lat:double>>"
    )
    assert merge_staypoints(sp, tpls, max_time_gap=10).count() == 2


def test_merge_agg(spark):
    sp = _mk_sp(
        spark,
        [(0, 1, 0, 10, 8.5, 47.4, 5), (1, 1, 15, 25, 8.6, 47.5, 5)],
        with_loc=True,
    ).withColumn("elevation", F.col("id").cast("double") * 100)
    tpls = spark.createDataFrame(
        [], "id long, user_id long, started_at timestamp, finished_at timestamp, geom array<struct<lon:double,lat:double>>"
    )
    out = merge_staypoints(sp, tpls, max_time_gap=10, agg={"elevation": "mean", "geom": "first"}).collect()
    assert len(out) == 1
    assert out[0].elevation == 50.0
    assert out[0].geom.lon == 8.5


# -- labelling ----------------------------------------------------------------


def test_activity_flag(spark):
    sp = _mk_sp(spark, [(0, 1, 0, 20, 8.5, 47.4), (1, 1, 30, 40, 8.5, 47.4)])
    out = {r.id: r.is_activity for r in create_activity_flag(sp, time_threshold=15).collect()}
    assert out == {0: True, 1: False}


def test_predict_transport_mode(spark):
    # ~1.1 km in 10 min -> ~1.9 m/s slow; same dist in 30 s -> ~37 m/s fast
    tpls = _mk_tpls(
        spark,
        [
            (0, 1, 0, 10, [(8.5, 47.4), (8.5, 47.41)]),
            (1, 1, 20, 20.5, [(8.5, 47.4), (8.5, 47.41)]),
        ],
    )
    out = {r.id: r.mode for r in predict_transport_mode(tpls).collect()}
    assert out[0] == "slow_mobility"
    assert out[1] == "fast_mobility"


# -- metrics ------------------------------------------------------------------


def test_radius_gyration_symmetric_pair(spark):
    # two points symmetric around a center: rg = distance to center
    sp = _mk_sp(spark, [(0, 1, 0, 10, 8.5, 47.40), (1, 1, 20, 30, 8.5, 47.42)])
    (row,) = radius_gyration(sp, method="count").collect()
    from trackintel_spark.functions.spatial import EARTH_RADIUS_M

    # expected: haversine((8.5,47.40),(8.5,47.41))
    expected = 0.01 / 180 * math.pi * EARTH_RADIUS_M
    assert abs(row.radius_gyration - expected) < 1.0


def test_radius_gyration_duration_weighting(spark):
    # all weight on one point -> center is that point; rg pulled toward 0
    sp = _mk_sp(spark, [(0, 1, 0, 1000, 8.5, 47.40), (1, 1, 2000, 2001, 8.5, 47.42)])
    (c,) = radius_gyration(sp, "count").collect()
    (d,) = radius_gyration(sp, "duration").collect()
    assert d.radius_gyration < c.radius_gyration


def test_jump_length(spark):
    sp = _mk_sp(spark, [(0, 1, 0, 10, 8.5, 47.40), (1, 1, 20, 30, 8.5, 47.41)])
    rows = {r.id: r.jump_length for r in jump_length(sp).collect()}
    assert rows[1] is None
    assert abs(rows[0] - 1111.9) < 5


# -- modal split --------------------------------------------------------------


def test_modal_split_count_norm(spark):
    tpls = _mk_tpls(
        spark,
        [
            (0, 1, 0, 10, [(8.5, 47.4), (8.5, 47.41)]),
            (1, 1, 20, 30, [(8.5, 47.4), (8.5, 47.41)]),
            (2, 1, 40, 40.5, [(8.5, 47.4), (8.5, 47.41)]),
        ],
    )
    tpls = predict_transport_mode(tpls)
    out = calculate_modal_split(tpls, per_user=True, norm=True).collect()
    assert len(out) == 1
    row = out[0].asDict()
    assert abs(row["slow_mobility"] - 2 / 3) < 1e-12
    assert abs(row["fast_mobility"] - 1 / 3) < 1e-12


# -- tracking quality ---------------------------------------------------------


def test_split_overlaps_day(spark):
    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 22, 0), datetime(2024, 1, 3, 2, 0))],
        "user_id long, started_at timestamp, finished_at timestamp",
    )
    rows = split_overlaps(df, "day").orderBy("started_at").collect()
    assert [(r.started_at, r.finished_at) for r in rows] == [
        (datetime(2024, 1, 1, 22, 0), datetime(2024, 1, 2, 0, 0)),
        (datetime(2024, 1, 2, 0, 0), datetime(2024, 1, 3, 0, 0)),
        (datetime(2024, 1, 3, 0, 0), datetime(2024, 1, 3, 2, 0)),
    ]


def test_tracking_quality_all(spark):
    sp = _mk_sp(spark, [(0, 1, 0, 30, 8.5, 47.4), (1, 1, 60, 90, 8.5, 47.4)])
    (row,) = temporal_tracking_quality(sp, "all").collect()
    assert abs(row.quality - 60 / 90) < 1e-12


def test_tracking_quality_day(spark):
    sp = _mk_sp(spark, [(0, 1, 0, 30, 8.5, 47.4)])  # 30 min on Jan 1
    (row,) = temporal_tracking_quality(sp, "day").collect()
    assert row.day == datetime(2024, 1, 1)
    assert abs(row.quality - 1800 / 86400) < 1e-12


def test_tracking_quality_bad_granularity(spark):
    sp = _mk_sp(spark, [(0, 1, 0, 30, 8.5, 47.4)])
    with pytest.raises(ValueError, match="granularity unknown"):
        temporal_tracking_quality(sp, "year")


def test_predict_transport_mode_reference_fixture(spark):
    """Reference tests/analysis/test_label.py expects slow/motorized/fast
    for the first three rows of its checked-in fixture."""
    from trackintel_spark.analysis import predict_transport_mode
    from trackintel_spark.sources import read_triplegs_csv

    tpls = read_triplegs_csv(
        spark, "/root/reference/tests/data/triplegs_transport_mode_identification.csv", sep=";"
    )
    got = {r.id: r.mode for r in predict_transport_mode(tpls).collect()}
    assert got[0] == "slow_mobility"
    assert got[1] == "motorized_mobility"
    assert got[2] == "fast_mobility"


def test_radius_gyration_planar_reference_values(spark):
    """Reference analysis/test_metrics.py closed-form expectations for
    planar (projected) coordinates: user 0 -> sqrt(12), user 1 (with a
    zero-duration staypoint) -> sqrt(2*(8+16)/3) count / 0 duration."""
    import math

    from pyspark.sql import functions as F

    from trackintel_spark.analysis import radius_gyration
    from trackintel_spark.analysis.metrics import jump_length

    rows = [
        (1, 0, 0, 1, 0.0, 9.0),
        (2, 0, 1, 3, 3.0, 12.0),
        (3, 0, 3, 4, 6.0, 15.0),
        (4, 1, 0, 1, 0.0, 9.0),
        (7, 1, 1, 2, 0.0, 9.0),
        (8, 1, 2, 2, 6.0, 15.0),
    ]
    sp = spark.createDataFrame(rows, "id long, user_id long, s long, e long, lon double, lat double").select(
        "id", "user_id",
        F.timestamp_seconds(F.col("s") * 3600).alias("started_at"),
        F.timestamp_seconds(F.col("e") * 3600).alias("finished_at"),
        F.struct("lon", "lat").alias("geom"),
    )
    cnt = {r.user_id: r.radius_gyration for r in radius_gyration(sp, "count", metric="euclidean").collect()}
    assert abs(cnt[0] - math.sqrt(4 * 9 / 3)) < 1e-9
    assert abs(cnt[1] - math.sqrt(2 * (8 + 16) / 3)) < 1e-9
    dur = {r.user_id: r.radius_gyration for r in radius_gyration(sp, "duration", metric="euclidean").collect()}
    assert abs(dur[0] - math.sqrt(9)) < 1e-9
    assert dur[1] == 0.0  # zero-duration staypoint carries no weight

    jl = {r.id: r.jump_length for r in jump_length(sp, metric="euclidean").collect()}
    assert abs(jl[1] - math.sqrt(18)) < 1e-9 and abs(jl[2] - math.sqrt(18)) < 1e-9
    assert jl[3] is None
    assert jl[4] == 0.0 and abs(jl[7] - math.sqrt(72)) < 1e-9 and jl[8] is None


def test_modal_split_daily_weekly_reference_expectations(spark):
    """Reference analysis/test_modal_split.py daily + anchored-week
    (W-MON) expectations: weekly bins label with the NEXT Monday."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from trackintel_spark.analysis import calculate_modal_split

    rows = [
        (0, 0, "1970-01-01 00:00:00", "car"),
        (1, 0, "1970-01-01 02:00:00", "bike"),
        (2, 0, "1970-01-02 02:00:00", "walk"),
        (3, 0, "1970-01-08 02:00:00", "walk"),
        (4, 1, "1970-01-01 03:00:00", "walk"),
        (5, 1, "1970-01-01 05:00:00", "walk"),
    ]
    tpls = spark.createDataFrame(rows, "id long, user_id long, s string, mode string").select(
        "id", "user_id", F.to_timestamp("s").alias("started_at"),
        (F.to_timestamp("s") + F.expr("INTERVAL 30 MINUTE")).alias("finished_at"),
        "mode",
        F.array(F.struct(F.lit(8.5).alias("lon"), F.lit(47.4).alias("lat")),
                F.struct(F.lit(8.6).alias("lon"), F.lit(47.5).alias("lat"))).alias("geom"),
    )
    daily = {(r.user_id, r.timestamp): r.asDict() for r in
             calculate_modal_split(tpls, metric="count", freq="D", per_user=True).collect()}
    d1, d2, d8 = datetime(1970, 1, 1), datetime(1970, 1, 2), datetime(1970, 1, 8)
    assert daily[(0, d1)]["bike"] == 1 and daily[(0, d1)]["car"] == 1
    assert daily[(0, d2)]["walk"] == 1 and daily[(0, d8)]["walk"] == 1
    assert daily[(1, d1)]["walk"] == 2

    weekly = {(r.user_id, r.timestamp): r.asDict() for r in
              calculate_modal_split(tpls, metric="count", freq="W-MON", per_user=True).collect()}
    w1, w2 = datetime(1970, 1, 5), datetime(1970, 1, 12)
    assert weekly[(0, w1)]["bike"] == 1 and weekly[(0, w1)]["car"] == 1 and weekly[(0, w1)]["walk"] == 1
    assert weekly[(0, w2)]["walk"] == 1
    assert weekly[(1, w1)]["walk"] == 2


def test_origin_destination_matrix(spark):
    from trackintel_spark.analysis import origin_destination_matrix

    trips = spark.createDataFrame(
        [
            # user 1: A->B twice, B->A once, gap-start (NULL origin)
            (1, 10, 11), (1, 12, 13), (1, 11, 10), (1, None, 10),
            # user 2: A->A self loop
            (2, 20, 21),
        ],
        "user_id long, origin_staypoint_id long, destination_staypoint_id long",
    )
    sp = spark.createDataFrame(
        [(10, 100), (11, 200), (12, 100), (13, 200), (20, 300), (21, 300)],
        "id long, location_id long",
    )
    od = {
        (r["origin"], r["destination"]): r
        for r in origin_destination_matrix(trips, sp).collect()
    }
    assert od[(100, 200)]["n_trips"] == 2
    assert od[(200, 100)]["n_trips"] == 1
    assert od[(300, 300)]["n_trips"] == 1
    assert od[(None, 100)]["n_trips"] == 1
    assert sum(r["n_trips"] for r in od.values()) == 5
    assert abs(sum(r["flow_share"] for r in od.values()) - 1.0) < 1e-12
    assert od[(100, 200)]["flow_share"] == 2 / 5

    # self loops dropped (NULL-endpoint rows retained)
    no_loop = {
        (r["origin"], r["destination"])
        for r in origin_destination_matrix(trips, sp, drop_self_loops=True).collect()
    }
    assert (300, 300) not in no_loop and (None, 100) in no_loop

    # per-user shares normalize within the user
    per_u = {
        (r["user_id"], r["origin"], r["destination"]): r["flow_share"]
        for r in origin_destination_matrix(trips, sp, per_user=True).collect()
    }
    assert per_u[(1, 100, 200)] == 2 / 4 and per_u[(2, 300, 300)] == 1.0

    # raw staypoint granularity without a zone table
    raw = {
        (r["origin"], r["destination"]): r["n_trips"]
        for r in origin_destination_matrix(trips).collect()
    }
    assert raw[(10, 11)] == 1 and raw[(12, 13)] == 1


def test_location_entropy_all_methods(spark):
    import math

    from trackintel_spark.analysis import location_entropy

    # user 1 visits A,B,A,B,A,B... (period-2 routine); user 2 uniform
    # over 4 locations; user 3 always home; NULL locations dropped
    rows = []
    for k in range(12):
        rows.append((1, [10, 20][k % 2], k))
    for k in range(12):
        rows.append((2, [1, 2, 3, 4][k % 4], k))
    for k in range(6):
        rows.append((3, 7, k))
    rows.append((1, None, 99))
    sp = spark.createDataFrame(rows, "user_id long, location_id long, sec long").select(
        "user_id", "location_id",
        __import__("pyspark.sql.functions", fromlist=["x"]).timestamp_seconds(
            __import__("pyspark.sql.functions", fromlist=["x"]).col("sec") + 1700000000
        ).alias("started_at"),
    )

    rand = {r["user_id"]: r for r in location_entropy(sp, "random").collect()}
    assert rand[1]["entropy"] == pytest.approx(1.0)   # log2(2)
    assert rand[2]["entropy"] == pytest.approx(2.0)   # log2(4)
    assert rand[3]["entropy"] == pytest.approx(0.0)
    assert rand[1]["n_visits"] == 12 and rand[1]["n_locations"] == 2

    unc = {r["user_id"]: r["entropy"] for r in location_entropy(sp, "uncorrelated").collect()}
    assert unc[1] == pytest.approx(1.0)  # balanced 2-way histogram
    assert unc[2] == pytest.approx(2.0)
    assert unc[3] == pytest.approx(0.0)

    act = {r["user_id"]: r["entropy"] for r in location_entropy(sp, "actual").collect()}
    # the alternating routine is highly predictable: actual << uncorrelated
    assert act[1] < unc[1]
    # LZ estimator matches a direct python recomputation
    from trackintel_spark.analysis.entropy import _lz_entropy_bits
    import numpy as np

    assert act[1] == pytest.approx(_lz_entropy_bits(np.array([10, 20] * 6)))
    assert act[2] == pytest.approx(_lz_entropy_bits(np.array([1, 2, 3, 4] * 3)))

    with pytest.raises(ValueError):
        location_entropy(sp, "nope")


def test_lz_entropy_reference_values():
    """Hand-checkable sequences for the Kontoyiannis estimator."""
    import numpy as np

    from trackintel_spark.analysis.entropy import _lz_entropy_bits

    # constant sequence: sum(lambda) ~ n^2/4 -> entropy ~ 4 log2(n)/n,
    # slowly -> 0 (the estimator's known convergence rate)
    c64 = _lz_entropy_bits(np.array([5] * 64))
    c256 = _lz_entropy_bits(np.array([5] * 256))
    assert c256 < c64 < 0.5
    assert c64 == pytest.approx(64 * np.log2(64) / (64 * 67 / 4), rel=0.05)
    # i.i.d.-ish alternation vs random: random should be higher
    rng = np.random.RandomState(0)
    r = _lz_entropy_bits(rng.randint(0, 8, 256))
    a = _lz_entropy_bits(np.array([0, 1] * 128))
    assert r > a
    assert _lz_entropy_bits(np.array([1])) is None


def test_markov_next_location(spark):
    """Hand-computed first-order Markov fixture: visit sequence per
    user -> transition counts, row-normalized probabilities, argmax
    prediction with smaller-id tie-break, noise visits bridged."""
    from pyspark.sql import functions as F

    from trackintel_spark.analysis import (
        location_transition_matrix,
        predict_next_location,
    )

    rows = []
    # user 0: a->b->a->c->a->b  (from a: b x2, c x1 -> predict b 2/3)
    seq0 = ["a", "b", "a", "c", "a", "b"]
    # user 1: a->noise->b->b (noise dropped: a->b, b->b)
    seq1 = ["a", None, "b", "b"]
    for u, seq in ((0, seq0), (1, seq1)):
        for i, loc in enumerate(seq):
            rows.append((u, loc, i))
    sp = spark.createDataFrame(rows, "user_id long, location_id string, started_at long")

    tm = {
        (r.user_id, r.from_loc, r.to_loc): (r.n_trans, r.prob)
        for r in location_transition_matrix(sp).collect()
    }
    assert tm[(0, "a", "b")] == (2, 2 / 3)
    assert tm[(0, "a", "c")] == (1, 1 / 3)
    assert tm[(0, "b", "a")] == (1, 1.0)
    assert tm[(1, "a", "b")] == (1, 1.0)  # noise bridged
    assert tm[(1, "b", "b")] == (1, 1.0)
    assert (0, "c", "a") in tm and len(tm) == 6

    pred = {
        (r.user_id, r.from_loc): (r.predicted_loc, r.prob, r.n_obs)
        for r in predict_next_location(location_transition_matrix(sp)).collect()
    }
    assert pred[(0, "a")] == ("b", 2 / 3, 3)
    assert pred[(0, "b")] == ("a", 1.0, 1)
    # tie-break: user 2 sees a->b and a->c once each -> smaller id "b"
    sp2 = spark.createDataFrame(
        [(2, "a", 0), (2, "b", 1), (2, "a", 2), (2, "c", 3)],
        "user_id long, location_id string, started_at long",
    )
    p2 = predict_next_location(location_transition_matrix(sp2)).collect()
    tie = [r for r in p2 if r.from_loc == "a"][0]
    assert tie.predicted_loc == "b" and tie.prob == 0.5 and tie.n_obs == 2
    # self-loop drop
    tm2 = location_transition_matrix(sp, drop_self_loops=True)
    assert (1, "b", "b") not in {
        (r.user_id, r.from_loc, r.to_loc) for r in tm2.collect()
    }
