"""plans/: dense id assignment, co-partitioning, bucketed persistence."""

from pyspark.sql import functions as F

from trackintel_spark.plans.ids import dense_id_by_user
from trackintel_spark.plans.partitioning import co_partition_by_user, write_bucketed_by_user


def test_dense_id_matches_global_row_number(spark):
    data = [(u, t) for u in (3, 1, 7) for t in range(5)]
    df = spark.createDataFrame(data, "user_id long, t long")
    out = dense_id_by_user(df, order_by=["t"], id_col="id")
    got = sorted((r.user_id, r.t, r.id) for r in out.collect())
    # expected: ids dense over (user_id, t) global ordering
    expected_order = sorted(data)
    expected = {pair: i for i, pair in enumerate(expected_order)}
    for u, t, i in got:
        assert i == expected[(u, t)]


def test_dense_id_partition_invariance(spark):
    data = [(u % 5, u * 7 % 13) for u in range(100)]
    df = spark.createDataFrame(data, "user_id long, t long").withColumn(
        "t", F.col("t") + F.monotonically_increasing_id() % 3
    )
    a = {tuple(r) for r in dense_id_by_user(df.repartition(1), ["t", "user_id"], "id").collect()}
    b = {tuple(r) for r in dense_id_by_user(df.repartition(17), ["t", "user_id"], "id").collect()}
    assert a == b


def test_co_partition_by_user(spark):
    df = spark.createDataFrame([(i % 4, i) for i in range(40)], "user_id long, v long")
    out = co_partition_by_user(df, num_partitions=4)
    # all rows of one user land in one partition
    parts = out.withColumn("__p", F.spark_partition_id()).groupBy("user_id").agg(
        F.countDistinct("__p").alias("n")
    )
    assert all(r.n == 1 for r in parts.collect())


def test_write_bucketed_by_user(spark, tmp_path):
    df = spark.createDataFrame(
        [(i % 3, i, f"2024-01-0{1 + i % 5}") for i in range(30)],
        "user_id long, v long, d string",
    ).select("user_id", "v", F.to_timestamp("d").alias("tracked_at"))
    write_bucketed_by_user(df, "t_bucketed", num_buckets=4)
    back = spark.table("t_bucketed")
    assert back.count() == 30
    # bucketed table: a groupBy on user_id plans without an Exchange
    plan = back.groupBy("user_id").count()._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    spark.sql("DROP TABLE t_bucketed")


def test_dense_rank_ordered_matches_global_rank(spark):
    from pyspark.sql import functions as F

    from trackintel_spark.plans.ids import dense_rank_ordered

    vals = [37, 2, 99, 2, 5, 41, 41, 8, 13, 0, 99, 7]
    df = spark.createDataFrame([(v,) for v in vals], "lbl long")
    got = {r.lbl: r.dense_id for r in dense_rank_ordered(df, "lbl").collect()}
    expected = {v: i for i, v in enumerate(sorted(set(vals)))}
    assert got == expected


def test_dense_rank_ordered_empty(spark):
    df = spark.createDataFrame([], "lbl long")
    from trackintel_spark.plans.ids import dense_rank_ordered

    assert dense_rank_ordered(df, "lbl").count() == 0


def test_sql_double_renders_typed_literal(spark):
    import math

    import pytest

    from trackintel_spark.plans.literals import sql_double

    assert sql_double(1800.0) == "1800.0D"
    assert sql_double(30) == "30.0D"  # ints render as doubles
    # shortest-repr round-trip: the rendered literal re-parses bit-equal
    v = 0.1 + 0.2
    assert float(sql_double(v)[:-1]) == v
    # Spark parses it as a DOUBLE literal (no decimal promotion in the plan)
    row = spark.sql(f"SELECT {sql_double(1800.0)} AS x").schema["x"]
    assert row.dataType.typeName() == "double"
    for bad in (math.inf, -math.inf, math.nan):
        with pytest.raises(ValueError):
            sql_double(bad)
