"""As-of join (operators/asof.py) — oracle is pandas.merge_asof."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from trackintel_spark.operators.asof import asof_join


def _mk(spark, left_pd, right_pd):
    return (
        spark.createDataFrame(left_pd),
        spark.createDataFrame(right_pd),
    )


def _sorted_records(df_pd, cols):
    out = df_pd[cols].astype(object)  # object dtype so None survives
    out = out.where(pd.notnull(out), None)
    return sorted(
        out.itertuples(index=False, name=None),
        key=lambda t: tuple((v is None, v) for v in t),
    )


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("allow_exact", [True, False])
def test_asof_matches_pandas_randomized(spark, direction, allow_exact):
    rng = np.random.RandomState(hash((direction, allow_exact)) % 2**31)
    keys = ["a", "b", "c"]
    left_pd = pd.DataFrame(
        {
            "k": rng.choice(keys, 60),
            "t": rng.randint(0, 50, 60).astype("float64"),
            "lv": np.arange(60),
        }
    ).sort_values("t", kind="stable").reset_index(drop=True)
    right_pd = pd.DataFrame(
        {
            "k": rng.choice(keys, 40),
            "t": rng.randint(0, 50, 40).astype("float64"),
            "rv": np.arange(40) * 10,
        }
    ).sort_values("t", kind="stable").reset_index(drop=True)

    expect = pd.merge_asof(
        left_pd,
        right_pd,
        on="t",
        by="k",
        direction=direction,
        allow_exact_matches=allow_exact,
        suffixes=("", "_right"),
    )
    l_df, r_df = _mk(spark, left_pd, right_pd)
    got = asof_join(
        l_df, r_df, on="t", by="k", direction=direction, allow_exact_matches=allow_exact
    ).toPandas()
    cols = ["k", "t", "lv", "rv"]
    assert _sorted_records(got, cols) == _sorted_records(expect, cols), direction


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_duplicate_right_timestamps_match_pandas(spark, direction):
    """Backward takes the LAST duplicate-timestamp right row, forward
    the FIRST — pandas searchsorted semantics."""
    left_pd = pd.DataFrame({"k": ["x", "x"], "t": [10.0, 4.9], "lv": [0, 1]})
    right_pd = pd.DataFrame(
        {"k": ["x"] * 4, "t": [5.0, 5.0, 5.0, 20.0], "rv": [1, 2, 3, 4]}
    )
    expect = pd.merge_asof(
        left_pd.sort_values("t"), right_pd, on="t", by="k", direction=direction
    )
    l_df, r_df = _mk(spark, left_pd, right_pd)
    got = asof_join(l_df, r_df, on="t", by="k", direction=direction).toPandas()
    cols = ["k", "t", "lv", "rv"]
    assert _sorted_records(got, cols) == _sorted_records(expect, cols)


def test_asof_tolerance_and_unmatched(spark):
    left_pd = pd.DataFrame({"k": ["a", "a", "b"], "t": [10.0, 100.0, 7.0], "lv": [1, 2, 3]})
    right_pd = pd.DataFrame({"k": ["a", "a"], "t": [8.0, 50.0], "rv": [80, 500]})
    expect = pd.merge_asof(
        left_pd.sort_values("t"), right_pd, on="t", by="k", tolerance=10.0
    )
    l_df, r_df = _mk(spark, left_pd, right_pd)
    got = asof_join(l_df, r_df, on="t", by="k", tolerance=10.0).toPandas()
    cols = ["k", "t", "lv", "rv"]
    assert _sorted_records(got, cols) == _sorted_records(expect, cols)
    # key b has no right rows at all -> NULL, row preserved
    assert got[got.k == "b"]["rv"].isna().all()


def test_asof_timestamps_and_column_collision(spark):
    """Timestamp on-columns work (tolerance in seconds) and colliding
    payload names get the suffix."""
    l_df = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00", 5.0)], "id long, ts string, v double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r_df = spark.createDataFrame(
        [("2024-01-01 00:05:00", 7.0), ("2024-01-01 00:09:00", 9.0)], "ts string, v double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = asof_join(l_df, r_df, on="ts", tolerance=120.0)
    row = out.collect()[0]
    assert row["v"] == 5.0 and row["v_right"] == 9.0
    none = asof_join(l_df, r_df, on="ts", tolerance=30.0).collect()[0]
    assert none["v_right"] is None


def test_asof_global_no_by_key(spark):
    left_pd = pd.DataFrame({"t": [1.0, 5.0, 9.0], "lv": [1, 2, 3]})
    right_pd = pd.DataFrame({"t": [0.0, 6.0], "rv": [10, 20]})
    expect = pd.merge_asof(left_pd, right_pd, on="t", direction="nearest")
    l_df, r_df = _mk(spark, left_pd, right_pd)
    got = asof_join(l_df, r_df, on="t", direction="nearest").toPandas()
    assert _sorted_records(got, ["t", "lv", "rv"]) == _sorted_records(expect, ["t", "lv", "rv"])


def test_asof_partition_invariance(spark):
    rng = np.random.RandomState(3)
    left_pd = pd.DataFrame(
        {"k": rng.choice(["a", "b"], 30), "t": rng.randint(0, 30, 30).astype(float), "lv": range(30)}
    )
    right_pd = pd.DataFrame(
        {"k": rng.choice(["a", "b"], 20), "t": rng.uniform(0, 30, 20).round(1), "rv": range(20)}
    )
    l_df, r_df = _mk(spark, left_pd, right_pd)
    a = _sorted_records(asof_join(l_df, r_df, on="t", by="k").toPandas(), ["k", "t", "lv", "rv"])
    b = _sorted_records(
        asof_join(l_df.repartition(7), r_df.repartition(5), on="t", by="k").toPandas(),
        ["k", "t", "lv", "rv"],
    )
    assert a == b


def test_asof_multiple_by_columns(spark):
    """Composite equi-keys behave like pandas with by=[k1, k2]."""
    left_pd = pd.DataFrame(
        {
            "k1": ["a", "a", "b", "b"],
            "k2": [1, 2, 1, 2],
            "t": [10.0, 10.0, 10.0, 10.0],
            "lv": [0, 1, 2, 3],
        }
    )
    right_pd = pd.DataFrame(
        {
            "k1": ["a", "a", "b"],
            "k2": [1, 2, 1],
            "t": [5.0, 7.0, 9.0],
            "rv": [100, 200, 300],
        }
    )
    expect = pd.merge_asof(
        left_pd.sort_values("t"), right_pd.sort_values("t"), on="t", by=["k1", "k2"]
    )
    l_df, r_df = _mk(spark, left_pd, right_pd)
    got = asof_join(l_df, r_df, on="t", by=["k1", "k2"]).toPandas()
    cols = ["k1", "k2", "t", "lv", "rv"]
    assert _sorted_records(got, cols) == _sorted_records(expect, cols)


def test_asof_missing_right_column_raises(spark):
    l_df = spark.createDataFrame([(1, 1.0)], "k long, t double")
    r_df = spark.createDataFrame([(1, 1.0)], "k long, other double")
    with pytest.raises(ValueError, match="missing column"):
        asof_join(l_df, r_df, on="t", by="k")


def test_asof_nearest_tolerance_matches_pandas(spark):
    """direction='nearest' with a tolerance: both side matches must be
    tolerance-gated BEFORE picking the closer one (a backward match
    outside tolerance must not shadow a forward match inside it)."""
    rng = np.random.RandomState(424242)
    keys = ["a", "b"]
    left_pd = pd.DataFrame(
        {
            "k": rng.choice(keys, 50),
            "t": rng.randint(0, 80, 50).astype("float64"),
            "lv": np.arange(50),
        }
    ).sort_values("t", kind="stable").reset_index(drop=True)
    right_pd = pd.DataFrame(
        {
            "k": rng.choice(keys, 25),
            "t": rng.randint(0, 80, 25).astype("float64"),
            "rv": np.arange(25) * 10,
        }
    ).sort_values("t", kind="stable").reset_index(drop=True)

    expect = pd.merge_asof(
        left_pd, right_pd, on="t", by="k", direction="nearest", tolerance=4.0,
        suffixes=("", "_right"),
    )
    l_df, r_df = _mk(spark, left_pd, right_pd)
    got = asof_join(l_df, r_df, on="t", by="k", direction="nearest", tolerance=4.0).toPandas()
    cols = ["k", "t", "lv", "rv"]
    assert _sorted_records(got, cols) == _sorted_records(expect, cols)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("allow_exact", [True, False])
def test_asof_keyless_randomized_matches_pandas(spark, direction, allow_exact):
    """Key-less (by=None) parity on inputs big enough to spread over
    MANY range buckets — exercising the bucketed global scan with
    boundary carries (empty buckets, duplicate timestamps, exact ties
    included)."""
    rng = np.random.RandomState(hash(("keyless", direction, allow_exact)) % 2**31)
    left_pd = pd.DataFrame(
        {"t": np.sort(rng.randint(0, 500, 400)).astype(float), "lv": range(400)}
    )
    right_pd = pd.DataFrame(
        # half-range right keys leave the upper buckets right-free:
        # their matches must all come from boundary carries
        {"t": np.sort(rng.randint(0, 250, 150)).astype(float), "rv": range(150)}
    )
    expect = pd.merge_asof(
        left_pd, right_pd, on="t", direction=direction, allow_exact_matches=allow_exact
    )
    l_df, r_df = _mk(spark, left_pd, right_pd)
    # left may be arbitrarily partitioned; right keeps createDataFrame
    # order (pandas breaks duplicate-timestamp ties by input position,
    # which repartitioning would scramble for ANY implementation)
    got = asof_join(
        l_df.repartition(7), r_df, on="t",
        direction=direction, allow_exact_matches=allow_exact,
    ).toPandas()
    assert _sorted_records(got, ["t", "lv", "rv"]) == _sorted_records(expect, ["t", "lv", "rv"])


@pytest.mark.parametrize("direction", ["backward", "nearest"])
def test_asof_keyless_no_single_partition_exchange(spark, direction):
    """The key-less scan must NOT serialize into one task: no
    SinglePartition exchange anywhere in the physical plan (the old
    Window.partitionBy(lit(1)) produced one)."""
    left_pd = pd.DataFrame({"t": np.arange(200).astype(float), "lv": range(200)})
    right_pd = pd.DataFrame({"t": np.arange(0, 200, 3).astype(float), "rv": range(67)})
    l_df, r_df = _mk(spark, left_pd, right_pd)
    out = asof_join(l_df, r_df, on="t", direction=direction)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
