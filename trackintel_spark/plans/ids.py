"""Deterministic, scalable dense id assignment.

Every trackintel generate-operator assigns fresh int64 ids 0..n-1 in
(user_id, time) order (e.g. preprocessing/positionfixes.py:162-164).
A naive ``row_number() OVER (ORDER BY ...)`` funnels the whole table
through ONE task — unacceptable at 100 TB. Instead we use the classic
two-phase scheme:

1. per-user row_number (shuffle partitioned by user_id — parallel);
2. per-user base offset = exclusive running sum of user counts,
   computed on the tiny (n_users)-row aggregate and broadcast back.

The result is identical to the global row_number but scales linearly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dense_id_by_user(
    df: DataFrame,
    order_by: list[Column | str],
    id_col: str = "id",
    user_col: str = "user_id",
) -> DataFrame:
    """Add ``id_col`` = dense 0-based rank over (user_col, *order_by).

    Equivalent to ``row_number() over (order by user, *order_by) - 1``
    but without a single-partition global sort.
    """
    w_user = Window.partitionBy(user_col).orderBy(*order_by)
    with_rn = df.withColumn("__rn", F.row_number().over(w_user))

    counts = df.groupBy(user_col).agg(F.count(F.lit(1)).alias("__cnt"))
    # the per-user offset table has one row per user — a single-partition
    # window here is fine and the join back is a broadcast.
    w_off = Window.orderBy(user_col).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        user_col, F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off")
    )

    out = with_rn.join(F.broadcast(offsets), on=user_col, how="inner")
    return out.withColumn(id_col, (F.col("__off") + F.col("__rn") - 1).cast("long")).drop(
        "__rn", "__off"
    )


def dense_rank_ordered(df: DataFrame, order_col: str, out_col: str = "dense_id") -> DataFrame:
    """Global 0-based dense index over the DISTINCT values of ``order_col``
    without a single-task global window.

    Range-repartition the distinct values (disjoint, ordered ranges), rank
    within each partition, then add broadcast per-partition offsets. The
    sampled range boundaries only decide which partition a value lands in,
    never its global rank — results are deterministic. Use when the
    distinct-value count can grow with the data (e.g. cluster labels);
    for per-user ids use :func:`dense_id_by_user`.
    """
    d = df.select(order_col).distinct()
    p = d.sparkSession.sparkContext.defaultParallelism
    d = (
        d.repartitionByRange(p, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__p", F.spark_partition_id())
    )
    w_in = Window.partitionBy("__p").orderBy(order_col)
    d = d.withColumn("__rn", F.row_number().over(w_in))
    counts = d.groupBy("__p").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy("__p").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select("__p", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"))
    return (
        d.join(F.broadcast(offsets), on="__p")
        .withColumn(out_col, (F.col("__off") + F.col("__rn") - 1).cast("long"))
        .select(order_col, out_col)
    )
