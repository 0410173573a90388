"""generate_locations (DBSCAN), generate_tours, location identification."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from trackintel_spark.analysis import freq_method, osna_method, pre_filter_locations
from trackintel_spark.operators import generate_locations, generate_tours, get_trips_grouped

T0 = datetime(2024, 1, 1, 8, 0, 0)  # a Monday


def _mk_sp(spark, rows):
    """(id, user, start_min, end_min, lon, lat)"""
    data = [(i, u, T0 + timedelta(minutes=s), T0 + timedelta(minutes=e), lon, lat) for i, u, s, e, lon, lat in rows]
    df = spark.createDataFrame(
        data, "id long, user_id long, started_at timestamp, finished_at timestamp, lon double, lat double"
    )
    return df.select("id", "user_id", "started_at", "finished_at", F.struct("lon", "lat").alias("geom"))


def _mk_trips(spark, rows):
    """(id, user, start_min, end_min, o_sp, d_sp)"""
    data = [
        (i, u, T0 + timedelta(minutes=s), T0 + timedelta(minutes=e), o, d) for i, u, s, e, o, d in rows
    ]
    return spark.createDataFrame(
        data,
        "id long, user_id long, started_at timestamp, finished_at timestamp, "
        "origin_staypoint_id long, destination_staypoint_id long",
    )


# -- locations ----------------------------------------------------------------


def test_dbscan_two_clusters_and_noise(spark):
    sp = _mk_sp(
        spark,
        [
            (0, 1, 0, 10, 8.5000, 47.4),
            (1, 1, 20, 30, 8.5001, 47.4),   # ~7.5m from 0 -> same cluster
            (2, 1, 40, 50, 8.6000, 47.4),
            (3, 1, 60, 70, 8.6001, 47.4),   # second cluster
            (4, 1, 80, 90, 9.9, 48.9),      # far away; min_samples=2 -> noise
        ],
    )
    sp_o, locs = generate_locations(sp, epsilon=100, num_samples=2)
    got = {r.id: r.location_id for r in sp_o.collect()}
    assert got[0] == got[1] and got[2] == got[3]
    assert got[0] != got[2]
    assert got[4] is None
    assert locs.count() == 2


def test_dbscan_min_samples_1_everything_clustered(spark):
    sp = _mk_sp(spark, [(0, 1, 0, 10, 8.5, 47.4), (1, 1, 20, 30, 9.9, 48.9)])
    sp_o, locs = generate_locations(sp, epsilon=100, num_samples=1)
    got = {r.id: r.location_id for r in sp_o.collect()}
    assert got[0] is not None and got[1] is not None and got[0] != got[1]


def test_location_id_offsets_across_users(spark):
    sp = _mk_sp(
        spark,
        [
            (0, 1, 0, 10, 8.5, 47.4),
            (1, 1, 20, 30, 8.6, 47.4),
            (2, 2, 0, 10, 8.5, 47.4),
        ],
    )
    _, locs = generate_locations(sp, epsilon=100, num_samples=1)
    rows = sorted((r.user_id, r.id) for r in locs.collect())
    # user 1 gets 0,1; user 2 continues at 2 (reference offsetting :119-137)
    assert rows == [(1, 0), (1, 1), (2, 2)]


def test_location_center_and_extent(spark):
    sp = _mk_sp(spark, [(0, 1, 0, 10, 8.5, 47.4), (1, 1, 20, 30, 8.502, 47.4)])
    _, locs = generate_locations(sp, epsilon=200, num_samples=1)
    (loc,) = locs.collect()
    assert abs(loc.center.lon - 8.501) < 1e-9
    assert abs(loc.center.lat - 47.4) < 1e-9
    lons = [p.lon for p in loc.extent]
    lats = [p.lat for p in loc.extent]
    # extent hull must contain both points buffered by ~200m (~0.0027 deg)
    assert min(lons) < 8.5 - 0.002 and max(lons) > 8.502 + 0.002
    assert min(lats) < 47.4 and max(lats) > 47.4


def test_dataset_agg_level_clusters_across_users(spark):
    sp = _mk_sp(spark, [(0, 1, 0, 10, 8.5, 47.4), (1, 2, 20, 30, 8.50005, 47.4)])
    _, locs_user = generate_locations(sp, epsilon=100, num_samples=1, agg_level="user")
    sp_o, locs_ds = generate_locations(sp, epsilon=100, num_samples=1, agg_level="dataset")
    assert locs_user.count() == 2
    got = {r.id: r.location_id for r in sp_o.collect()}
    assert got[0] == got[1]  # shared location across users
    assert locs_ds.count() == 2  # one (user, loc) row per user (:162-168)


def test_dataset_distributed_matches_exact_partitions(spark):
    # three users, two shared hotspots + one isolated noise-ish point;
    # the distributed route must produce the same cluster PARTITIONS as
    # the exact single-group kernel (numbering may differ)
    rows, sid = [], 0
    for u in (1, 2, 3):
        for k in range(3):
            rows.append((sid, u, sid * 40, sid * 40 + 10, 8.5 + k * 1e-5, 47.4)); sid += 1
            rows.append((sid, u, sid * 40, sid * 40 + 10, 9.0 + k * 1e-5, 48.0)); sid += 1
    rows.append((sid, 1, sid * 40, sid * 40 + 10, 12.0, 50.0)); sid += 1
    sp = _mk_sp(spark, rows)

    def partition(sp_o):
        clusters = {}
        for r in sp_o.collect():
            if r.location_id is not None:
                clusters.setdefault(r.location_id, set()).add(r.id)
        return {frozenset(v) for v in clusters.values()}

    exact_o, exact_locs = generate_locations(sp, epsilon=100, num_samples=2, agg_level="dataset")
    dist_o, dist_locs = generate_locations(
        sp, epsilon=100, num_samples=2, agg_level="dataset", distributed=True
    )
    assert partition(exact_o) == partition(dist_o)
    # noise point is unclustered on both paths
    noise_id = sid - 1
    assert {r.id: r.location_id for r in dist_o.collect()}[noise_id] is None
    assert dist_locs.count() == exact_locs.count()


# -- tours --------------------------------------------------------------------


def _sp_with_locs(spark, pairs):
    """staypoint id -> location id"""
    sp = _mk_sp(spark, [(i, 1, 0, 10, 8.5, 47.4) for i, _ in pairs])
    locmap = {i: l for i, l in pairs}
    return sp.withColumn(
        "location_id",
        F.udf(lambda i: locmap.get(i), "long")(F.col("id")),
    )


def test_tour_closes_at_same_location(spark):
    # trip0: loc A -> B, trip1: B -> A  => tour [0, 1]
    sp = _sp_with_locs(spark, [(0, 100), (1, 200), (2, 200), (3, 100)])
    trips = _mk_trips(spark, [(0, 1, 0, 60, 0, 1), (1, 1, 120, 180, 2, 3)])
    trips_o, tours = generate_tours(trips, staypoints=sp)
    got = tours.collect()
    assert len(got) == 1
    t = got[0]
    assert t.id == 0 and t.trips == [0, 1] and t.location_id == 100
    assert t.started_at == T0 and t.finished_at == T0 + timedelta(minutes=180)
    links = {r.id: r.tour_id for r in trips_o.collect()}
    assert links[0] == [0] and links[1] == [0]


def test_no_tour_when_max_time_exceeded(spark):
    sp = _sp_with_locs(spark, [(0, 100), (1, 200), (2, 200), (3, 100)])
    trips = _mk_trips(spark, [(0, 1, 0, 60, 0, 1), (1, 1, 2000, 2060, 2, 3)])
    _, tours = generate_tours(trips, staypoints=sp, max_time=1440)
    assert tours.count() == 0


def test_gap_breaks_chain_without_allowance(spark):
    # trip0 A->B, trip1 C->A (origin C != B => spatial gap)
    sp = _sp_with_locs(spark, [(0, 100), (1, 200), (2, 300), (3, 100)])
    trips = _mk_trips(spark, [(0, 1, 0, 60, 0, 1), (1, 1, 120, 180, 2, 3)])
    _, tours0 = generate_tours(trips, staypoints=sp, max_nr_gaps=0)
    assert tours0.count() == 0
    _, tours1 = generate_tours(trips, staypoints=sp, max_nr_gaps=1)
    got = tours1.collect()
    assert len(got) == 1 and got[0].trips == [0, 1]


def test_nested_tours(spark):
    # A->B, B->B (small loop), B->A : closes small tour [1] then big [0,1,2]
    sp = _sp_with_locs(spark, [(0, 100), (1, 200), (2, 200), (3, 200), (4, 200), (5, 100)])
    trips = _mk_trips(
        spark,
        [(0, 1, 0, 60, 0, 1), (1, 1, 120, 180, 2, 3), (2, 1, 240, 300, 4, 5)],
    )
    trips_o, tours = generate_tours(trips, staypoints=sp)
    got = sorted(tours.collect(), key=lambda r: r.id)
    assert len(got) == 2
    assert got[0].trips == [1]  # nested tour found first
    assert got[1].trips == [0, 1, 2]
    links = {r.id: r.tour_id for r in trips_o.collect()}
    assert links[1] == [0, 1]  # trip 1 belongs to both tours
    grouped = get_trips_grouped(trips_o, tours)
    assert grouped.filter(F.col("tour_id") == 1).count() == 3


def test_tours_max_dist_mode(spark):
    trips = _mk_trips(spark, [(0, 1, 0, 60, 0, 1), (1, 1, 120, 180, 2, 3)]).withColumn(
        "geom",
        F.when(
            F.col("id") == 0,
            F.struct(
                F.struct(F.lit(8.5).alias("lon"), F.lit(47.4).alias("lat")).alias("origin"),
                F.struct(F.lit(8.6).alias("lon"), F.lit(47.5).alias("lat")).alias("dest"),
            ),
        ).otherwise(
            F.struct(
                F.struct(F.lit(8.6).alias("lon"), F.lit(47.5).alias("lat")).alias("origin"),
                F.struct(F.lit(8.50001).alias("lon"), F.lit(47.40001).alias("lat")).alias("dest"),
            )
        ),
    )
    _, tours = generate_tours(trips, staypoints=None, max_dist=100)
    got = tours.collect()
    assert len(got) == 1 and got[0].trips == [0, 1] and got[0].location_id is None


# -- location identification --------------------------------------------------


def test_freq_method(spark):
    # loc 7 visited 3h, loc 8 visited 1h, loc 9 10min
    rows = [
        (0, 1, 0, 60, 8.5, 47.4),
        (1, 1, 100, 160, 8.5, 47.4),
        (2, 1, 200, 260, 8.5, 47.4),
        (3, 1, 300, 360, 8.6, 47.5),
        (4, 1, 400, 410, 8.7, 47.6),
    ]
    sp = _mk_sp(spark, rows).withColumn(
        "location_id", F.when(F.col("id") <= 2, 7).when(F.col("id") == 3, 8).otherwise(9).cast("long")
    )
    out = {r.id: r.purpose for r in freq_method(sp).collect()}
    assert out[0] == "home" and out[1] == "home" and out[2] == "home"
    assert out[3] == "work"
    assert out[4] is None


def test_pre_filter_locations(spark):
    # user 1: 12 staypoints across 12 locations -> user passes; but each
    # location has 1 sp -> all locations fail -> everything filtered out
    rows = [(i, 1, i * 500, i * 500 + 120, 8.5 + i * 0.01, 47.4) for i in range(12)]
    sp = _mk_sp(spark, rows).withColumn("location_id", F.col("id"))
    mask = pre_filter_locations(sp, thresh_sp=10, thresh_loc=10, thresh_sp_at_loc=2)
    assert mask.filter(F.col("total_filter")).count() == 0
    # with per-location thresholds disabled, everything passes
    mask2 = pre_filter_locations(sp, thresh_sp=10, thresh_loc=10, thresh_sp_at_loc=0, thresh_loc_time=0, thresh_loc_period=0)
    assert mask2.filter(F.col("total_filter")).count() == 12


def test_osna_method(spark):
    # Monday: night hours (rest->home) at loc 1, working hours at loc 2
    rows = [
        (0, 1, -5 * 60, -3 * 60, 8.5, 47.4),   # 03:00-05:00 Mon -> rest
        (1, 1, 60, 9 * 60, 8.6, 47.5),          # 09:00-17:00 Mon -> work
    ]
    sp = _mk_sp(spark, rows).withColumn("location_id", F.when(F.col("id") == 0, 1).otherwise(2).cast("long"))
    out = {r.id: r.purpose for r in osna_method(sp).collect()}
    assert out[0] == "home" and out[1] == "work"


def test_osna_conflict_home_wins(spark):
    # single location wins both home and work, second location gets work
    rows = [
        (0, 1, -5 * 60, -3 * 60, 8.5, 47.4),  # rest at loc 1
        (1, 1, 60, 9 * 60, 8.5, 47.4),         # work at loc 1 (same loc)
        (2, 1, 24 * 60 + 60, 24 * 60 + 120, 8.6, 47.5),  # Tue work at loc 2
    ]
    sp = _mk_sp(spark, rows).withColumn("location_id", F.when(F.col("id") <= 1, 1).otherwise(2).cast("long"))
    out = osna_method(sp)
    per_loc = {r.location_id: r.purpose for r in out.collect()}
    assert per_loc[1] == "home"
    assert per_loc[2] == "work"


def test_tours_session_salting_equivalence(spark, monkeypatch):
    """Splitting a user's trip stream at > max_time gaps (with the
    previous trip seeded as a context row) must be EXACTLY the unsalted
    kernel — including the reference's quirk that a post-gap self-loop
    trip does NOT close a 1-trip tour when the stack was non-empty
    (continuation skips the scan at a location break with
    max_nr_gaps=0), and including max_nr_gaps > 0 GAP bookkeeping."""
    import trackintel_spark.operators.staypoints as S

    # staypoint id i -> location; users 1 and 2 share the pattern
    pairs = []
    trips_rows = []
    tid = 0
    for u in (1, 2):
        spb = u * 100

        def loc_pairs(k, o_loc, d_loc):
            pairs.append((spb + 2 * k, o_loc))
            pairs.append((spb + 2 * k + 1, d_loc))
            return spb + 2 * k, spb + 2 * k + 1

        t = 0
        k = 0

        def trip(o_loc, d_loc, dwell=30):
            nonlocal t, tid, k
            o_sp, d_sp = loc_pairs(k, o_loc, d_loc)
            trips_rows.append((tid, u, t, t + 60, o_sp, d_sp))
            tid += 1
            k += 1
            t += 60 + dwell
        # session 1: one 3-trip tour + an open chain
        trip(0, 1); trip(1, 2); trip(2, 0); trip(0, 3)
        t += 3000  # > max_time=1440 min: salt boundary
        # session 2 opens with a SELF-LOOP trip (5 -> 5): the unsalted
        # kernel skips its scan (location break resets the stack), so no
        # 1-trip tour — the salted kernel must agree via the ctx seed
        trip(5, 5)
        trip(5, 6); trip(6, 5)  # a real tour in session 2
        t += 3000
        # session 3 opens same-location as the last session-2 trip ended
        # (5): continuation appends to the stack; ensure a tour still
        # closes inside the window
        trip(5, 7); trip(7, 5)

    sp = _mk_sp(spark, [(i, 1, 0, 10, 8.5, 47.4) for i, _ in pairs])
    locmap = {i: l for i, l in pairs}
    sp = sp.withColumn("location_id", F.udf(lambda i: locmap.get(i), "long")(F.col("id")))
    trips = _mk_trips(spark, trips_rows)

    for gaps in (0, 1):
        base_to, base_tours = generate_tours(
            trips, staypoints=sp, max_nr_gaps=gaps, salt_sessions=False
        )
        base = sorted(map(str, base_tours.collect()))
        base_links = sorted(map(str, base_to.select("id", "tour_id").collect()))

        monkeypatch.setattr(S, "_SALT_MIN_USER_ROWS", 0)
        salted_to, salted_tours = generate_tours(
            trips, staypoints=sp, max_nr_gaps=gaps, salt_sessions=True
        )
        assert sorted(map(str, salted_tours.collect())) == base, f"max_nr_gaps={gaps}"
        assert sorted(map(str, salted_to.select("id", "tour_id").collect())) == base_links
        monkeypatch.setattr(S, "_SALT_MIN_USER_ROWS", 200_000)
        # non-vacuous: tours exist in several sessions
        assert base_tours.count() >= 6


def test_salt_min_user_rows_conf_knob(spark):
    """Both sequential kernels read the shared session-salting threshold
    from plans.partitioning: the spark.trackintel.salt.minUserRows conf
    overrides the module default; non-numeric values fall back."""
    from trackintel_spark.plans.partitioning import (
        SALT_MIN_USER_ROWS_CONF, salt_min_user_rows,
    )

    assert salt_min_user_rows(spark) == 200_000
    assert salt_min_user_rows(spark, 7) == 7
    try:
        spark.conf.set(SALT_MIN_USER_ROWS_CONF, "123")
        assert salt_min_user_rows(spark) == 123
        assert salt_min_user_rows(spark, 7) == 123  # conf wins over default
        spark.conf.set(SALT_MIN_USER_ROWS_CONF, "not-a-number")
        assert salt_min_user_rows(spark, 7) == 7  # graceful fallback
    finally:
        spark.conf.unset(SALT_MIN_USER_ROWS_CONF)


def test_tours_salting_fuzz_randomized_streams(spark):
    """Adversarial-parameter fuzz for the gap-salting path: 60 users,
    each an independent RANDOM trip stream over a 5-location alphabet —
    random location breaks, self-loops, dwells, and >max_time gaps (so
    quantile-free session boundaries land everywhere, including directly
    after gaps and on post-gap self-loops, the reference quirks). The
    salting gate is forced to 0 via the conf knob, so EVERY user splits;
    salted must equal unsalted for max_nr_gaps in {0, 1, 3}.

    This fuzz originally CAUGHT a real defect: with max_nr_gaps > 0 the
    reference scan's gap-budget slicing (verbatim ``candidates[j+1:]``,
    a bottom-relative index) makes results depend on the absolute stack
    length including time-stale candidates, so no bounded context seed
    can make a session split exact. generate_tours now refuses to salt
    when max_nr_gaps > 0 — the {1, 3} legs pin that fallback."""
    import random

    from trackintel_spark.plans.partitioning import SALT_MIN_USER_ROWS_CONF

    rng = random.Random(20260814)
    pairs = []
    trips_rows = []
    tid = 0
    sp_id = 0
    for u in range(1, 61):
        t = 0
        prev_dest = None
        for _ in range(30):
            if prev_dest is not None and rng.random() < 0.7:
                o_loc = prev_dest  # chain continues
            else:
                o_loc = rng.randrange(5)  # location break
            d_loc = rng.randrange(5)  # self-loops included
            o_sp, d_sp = sp_id, sp_id + 1
            sp_id += 2
            pairs.append((o_sp, o_loc))
            pairs.append((d_sp, d_loc))
            trips_rows.append((tid, u, t, t + 60, o_sp, d_sp))
            tid += 1
            prev_dest = d_loc
            # dwell: mostly short; ~15% a > max_time(=1440 min) gap
            t += 60 + (2000 if rng.random() < 0.15 else rng.choice((10, 30, 100)))

    sp = _mk_sp(spark, [(i, 1, 0, 10, 8.5, 47.4) for i, _ in pairs])
    locmap = {i: l for i, l in pairs}
    sp = sp.withColumn("location_id", F.udf(lambda i: locmap.get(i), "long")(F.col("id")))
    trips = _mk_trips(spark, trips_rows)

    for gaps in (0, 1, 3):
        _, base_tours = generate_tours(
            trips, staypoints=sp, max_nr_gaps=gaps, salt_sessions=False
        )
        base = sorted(map(str, base_tours.collect()))
        assert len(base) >= 100  # non-vacuous at every gap setting
        try:
            spark.conf.set(SALT_MIN_USER_ROWS_CONF, "0")
            _, salted_tours = generate_tours(
                trips, staypoints=sp, max_nr_gaps=gaps, salt_sessions=True
            )
            got = sorted(map(str, salted_tours.collect()))
        finally:
            spark.conf.unset(SALT_MIN_USER_ROWS_CONF)
        assert got == base, f"max_nr_gaps={gaps}"


# -- journey flag (reference model/tours.py:25,30) -----------------------------


def _mk_tours(spark, rows):
    """(id, user, loc_or_None)"""
    data = [(i, u, T0, T0 + timedelta(minutes=60), loc) for i, u, loc in rows]
    return spark.createDataFrame(
        data,
        "id long, user_id long, started_at timestamp, finished_at timestamp, location_id long",
    )


def _mk_labeled_sp(spark, rows):
    """(id, user, loc, purpose)"""
    sp = _sp_with_locs(spark, [(i, loc) for i, _, loc, _ in rows])
    pmap = {i: p for i, _, loc, p in rows}
    umap = {i: u for i, u, _, _ in rows}
    return sp.withColumn("purpose", F.udf(lambda i: pmap.get(i), "string")(F.col("id"))).withColumn(
        "user_id", F.udf(lambda i: umap.get(i), "long")(F.col("id"))
    )


def test_flag_journeys_home_anchor(spark):
    from trackintel_spark.operators import flag_journeys

    # user 1 home = loc 100, user 2 home = loc 300
    sp = _mk_labeled_sp(
        spark,
        [
            (0, 1, 100, "home"),
            (1, 1, 200, "work"),
            (2, 1, 100, "home"),  # duplicate home staypoint: distinct() collapses
            (3, 2, 300, "home"),
            (4, 2, 100, None),  # loc 100 is NOT user 2's home
        ],
    )
    tours = _mk_tours(
        spark,
        [
            (0, 1, 100),  # anchored at user 1's home -> True
            (1, 1, 200),  # work anchor -> False
            (2, 2, 100),  # user 2 at loc 100: home only for user 1 -> False
            (3, 2, 300),  # user 2's home -> True
            (4, 2, None),  # geometry-mode tour -> NULL
        ],
    )
    out = {r.id: r.journey for r in flag_journeys(tours, sp).collect()}
    assert out == {0: True, 1: False, 2: False, 3: True, 4: None}
    # row count preserved (left join against a distinct home set)
    assert flag_journeys(tours, sp).count() == 5


def test_flag_journeys_requires_purpose(spark):
    from trackintel_spark.operators import flag_journeys

    tours = _mk_tours(spark, [(0, 1, 100)])
    sp = _sp_with_locs(spark, [(0, 100)])  # no purpose column
    with pytest.raises(AssertionError, match="purpose"):
        flag_journeys(tours, sp)
    with pytest.raises(AssertionError, match="location_id"):
        flag_journeys(tours.drop("location_id"), sp.withColumn("purpose", F.lit("home")))


def test_flag_journeys_end_to_end(spark):
    """generate_tours -> freq_method -> flag_journeys composition: the
    most-dwelled location becomes home, and only tours anchored there
    are journeys."""
    from trackintel_spark.operators import flag_journeys

    # home=100 (long dwells), shop=200. Tours: [home->shop->home] and a
    # nested shop loop [shop->shop].
    sp = _mk_sp(
        spark,
        [
            (0, 1, 0, 600, 8.5, 47.4),     # home, 10 h
            (1, 1, 660, 720, 8.6, 47.5),   # shop, 1 h
            (2, 1, 780, 840, 8.6, 47.5),   # shop again
            (3, 1, 900, 1500, 8.5, 47.4),  # home, 10 h
        ],
    ).withColumn("location_id", F.when(F.col("id").isin(0, 3), 100).otherwise(200).cast("long"))
    trips = _mk_trips(
        spark,
        [(0, 1, 600, 660, 0, 1), (1, 1, 720, 780, 1, 2), (2, 1, 840, 900, 2, 3)],
    )
    _, tours = generate_tours(trips, staypoints=sp)
    labeled = freq_method(sp)
    got = {tuple(r.trips): r.journey for r in flag_journeys(tours, labeled).collect()}
    assert got == {(1,): False, (0, 1, 2): True}


def test_flag_journeys_accessor(spark):
    from trackintel_spark.model.accessors import Tours

    sp = _mk_labeled_sp(spark, [(0, 1, 100, "home")])
    tours = _mk_tours(spark, [(0, 1, 100)])
    out = Tours(tours).flag_journeys(sp)
    assert out.df.collect()[0].journey is True


def test_scan_step_prunes_unreachable_front():
    """r12: with tours closing every 5 trips, the candidate stack must
    stay bounded by the max_time window (stale front entries are
    unreachable by the backward scan), not accrete the whole history —
    unbounded state in tours_stream_exact and O(n^2) batch work. The
    emitted tours are identical either way (pinned by the batch ==
    reference == stream parity suites and the generate_tours oracle)."""
    import time

    from trackintel_spark.operators.tours import _Trip, _scan_step

    candidates = []
    n = 20_000
    t0 = time.time()
    for i in range(n):
        o, d = i % 5, (i + 1) % 5
        start = i * 1200 * 1_000_000  # 20-min cadence
        rec = _Trip(i, start, start + 600_000_000, o, d, o, d, 0.0, 0.0, 0.0, 0.0)
        candidates, _members = _scan_step(candidates, rec, True, 100.0, 86400.0, 0)
        # window = 86400 s / 1200 s per trip = 72 candidates + slack
        assert len(candidates) <= 80, f"stack grew to {len(candidates)} at trip {i}"
    assert time.time() - t0 < 30, "scan_step quadratic regression"
