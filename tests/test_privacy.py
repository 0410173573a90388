"""k-anonymous quadtree cloaking: the k-invariant, the finest-
qualifying-ancestor election, the disjoint-coverage partition
identity, and suppression of never-qualifying space."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from trackintel_spark.analysis import anonymize_grid

CELL = 0.01


def _pts(spark, rows):
    return spark.createDataFrame(rows, "user_id long, lon double, lat double")


def test_election_and_suppression(spark):
    rows = []
    # dense block: 6 users co-located in one finest cell -> published at level 0
    for u in range(6):
        rows.append((u, 0.0051, 0.0051))
    # sparse 2x2 block of finest cells with one distinct user each,
    # sharing one level-1 parent -> k=4 met only at level 1
    for i, (dx, dy) in enumerate([(0, 0), (1, 0), (0, 1), (1, 1)]):
        rows.append((10 + i, 0.0251 + dx * CELL, 0.0251 + dy * CELL))
    # isolated single user far away -> never reaches k, suppressed
    rows.append((99, 1.5, 1.5))
    df = _pts(spark, rows)

    out = {(r.level, r.cy, r.cx): r for r in anonymize_grid(df, k=4, levels=3, base_cell_deg=CELL).collect()}
    # every published cell satisfies k
    assert all(r.n_users >= 4 for r in out.values())
    # dense cell at level 0 (anchored indices: lat+90, lon+180)
    l0 = (0, int((90.0051) / CELL), int((180.0051) / CELL))
    assert out[l0].n_users == 6 and out[l0].n_points == 6
    # sparse block published at level 1, covering all 4 points
    l1 = (1, int((90.0251) / CELL) >> 1, int((180.0251) / CELL) >> 1)
    assert out[l1].n_users == 4 and out[l1].n_points == 4
    # isolated user suppressed
    assert sum(r.n_points for r in out.values()) == 10  # 11 points - 1 suppressed
    assert len(out) == 2


def test_partition_identity_and_k_invariant_random(spark):
    rng = random.Random(3)
    rows = [
        (i % 9, rng.uniform(0, 0.2), rng.uniform(0, 0.2)) for i in range(300)
    ]
    df = _pts(spark, rows)
    for k in (2, 5):
        pub = anonymize_grid(df, k=k, levels=4, base_cell_deg=CELL).collect()
        assert all(r.n_users >= k for r in pub)
        # published cells are disjoint: no published cell is an ancestor
        # of another published cell
        cells = {(r.level, r.cy, r.cx) for r in pub}
        for lvl, cy, cx in cells:
            for anc in range(lvl + 1, 4):
                assert (anc, cy >> (anc - lvl), cx >> (anc - lvl)) not in cells
        # coverage: published points + suppressed points == all points
        top_users = (
            df.select(
                (F.floor((F.col("lat") + 90.0) / CELL) / 8).cast("long").alias("ty"),
                (F.floor((F.col("lon") + 180.0) / CELL) / 8).cast("long").alias("tx"),
                "user_id",
            )
            .distinct()
            .groupBy("ty", "tx")
            .count()
        )
        suppressed_tops = {(r.ty, r.tx) for r in top_users.filter(F.col("count") < k).collect()}
        n_suppressed = (
            df.filter(
                F.struct(
                    (F.floor((F.col("lat") + 90.0) / CELL) / 8).cast("long").alias("ty"),
                    (F.floor((F.col("lon") + 180.0) / CELL) / 8).cast("long").alias("tx"),
                ).isin([F.struct(F.lit(a).alias("ty"), F.lit(b).alias("tx")) for a, b in suppressed_tops])
                if suppressed_tops else F.lit(False)
            ).count()
        )
        assert sum(r.n_points for r in pub) + n_suppressed == 300


def test_validation(spark):
    df = _pts(spark, [(0, 0.0, 0.0)])
    with pytest.raises(ValueError):
        anonymize_grid(df, k=0)
    with pytest.raises(ValueError):
        anonymize_grid(df, levels=0)
    with pytest.raises(ValueError):
        anonymize_grid(df, base_cell_deg=0.0)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, tracked_at string"
    ).withColumn("tracked_at", F.to_timestamp("tracked_at"))


def test_time_election_and_suppression(spark):
    from trackintel_spark.analysis import anonymize_time

    rows = []
    # dense hour: 6 users in one hour -> published at 'hour'
    for u in range(6):
        rows.append((u, f"2023-03-10 14:{10 + u}:00"))
    # sparse day: 4 users spread over 4 different hours of one day,
    # one user per hour -> k=4 met only at 'day'
    for i in range(4):
        rows.append((10 + i, f"2023-03-12 {8 + i:02d}:30:00"))
    # isolated single user in another month -> suppressed
    rows.append((99, "2023-07-01 09:00:00"))
    out = {(r.unit, str(r.bucket)): r
           for r in anonymize_time(_ev(spark, rows), k=4).collect()}
    assert all(r.n_users >= 4 for r in out.values())
    hr = ("hour", "2023-03-10 14:00:00")
    assert out[hr].n_users == 6 and out[hr].n_events == 6
    day = ("day", "2023-03-12 00:00:00")
    assert out[day].n_users == 4 and out[day].n_events == 4
    assert sum(r.n_events for r in out.values()) == 10  # 11 - 1 suppressed
    assert len(out) == 2


def test_time_partition_identity_and_k_invariant_random(spark):
    """The anonymize_grid fuzz pattern on the calendar lattice: every
    published bucket >= k users, published buckets disjoint (no
    published hour inside a published day/month, no day inside a
    month), published + suppressed events == all events."""
    import datetime

    from trackintel_spark.analysis import anonymize_time

    rng = random.Random(7)
    t0 = datetime.datetime(2023, 1, 1)
    rows = [
        (i % 7, str(t0 + datetime.timedelta(hours=rng.randrange(0, 24 * 90))))
        for i in range(400)
    ]
    df = _ev(spark, rows)
    for k in (2, 4):
        pub = anonymize_time(df, k=k).collect()
        assert all(r.n_users >= k for r in pub)
        by_unit = {u: {str(r.bucket) for r in pub if r.unit == u}
                   for u in ("hour", "day", "month")}

        def trunc(b, unit):
            d = b.replace(minute=0, second=0)
            if unit == "day":
                d = d.replace(hour=0)
            if unit == "month":
                d = d.replace(hour=0, day=1)
            return str(d)

        for r in pub:
            if r.unit == "hour":
                assert trunc(r.bucket, "day") not in by_unit["day"]
            if r.unit in ("hour", "day"):
                assert trunc(r.bucket, "month") not in by_unit["month"]
        # suppression accounting: months under k users
        mu = (
            df.select(F.date_trunc("month", "tracked_at").alias("m"), "user_id")
            .distinct().groupBy("m").count()
        )
        bad_months = {str(r.m) for r in mu.filter(F.col("count") < k).collect()}
        n_sup = df.filter(
            F.date_trunc("month", "tracked_at").cast("string").isin(list(bad_months))
            if bad_months else F.lit(False)
        ).count()
        assert sum(r.n_events for r in pub) + n_sup == 400


def test_time_validation(spark):
    from trackintel_spark.analysis import anonymize_time

    df = _ev(spark, [(0, "2023-01-01 00:00:00")])
    with pytest.raises(ValueError):
        anonymize_time(df, k=0)
    with pytest.raises(ValueError):
        anonymize_time(df, units=())
    with pytest.raises(ValueError):
        anonymize_time(df, units=("hour", "week", "month"))  # week->month
    with pytest.raises(ValueError):
        anonymize_time(df, units=("day", "hour"))  # not coarsening
