"""Deterministic, scalable dense id assignment.

Every trackintel generate-operator assigns fresh int64 ids 0..n-1 in
(user_id, time) order (e.g. preprocessing/positionfixes.py:162-164).
A naive ``row_number() OVER (ORDER BY ...)`` funnels the whole table
through ONE task — unacceptable at 100 TB. Instead both helpers use
the ``zipWithIndex`` scheme: range-partition on the sort key,
row-number within partitions, and add per-PARTITION base offsets
(<= defaultParallelism longs) collected to the driver and folded back
as a literal map lookup on ``spark_partition_id()``.

The driver collect is bounded by cluster parallelism, never data, and
replaces joins/broadcasts of cardinality-growing offset tables — the
100 TB driver-OOM trap — AND keeps the input lineage in the output
plan exactly once: offset-table joins re-embed the input subtree, and
chained generate-operators then grow the logical plan exponentially (a
five-operator chain was literally un-plannable before this). Like
``zipWithIndex``, the helpers trigger one counting job at call time
and cache the shuffled input for the main query to reuse.

The cache is LOAD-BEARING: the collected bases describe the cached
partitioning, so the eager helpers must not unpersist under their own
output. Long sessions chaining many operators accumulate one cached
copy per call — call :func:`release_id_caches` after the consuming
action (write/collect) to free them all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_ID_CACHES: list[DataFrame] = []


def release_id_caches() -> int:
    """Unpersist every cache the eager id helpers created this session.

    Safe once the ids have been materialized (written/collected):
    recomputation after release would re-sample range boundaries, so
    only call between pipelines, not under a pending lazy plan. Returns
    the number of caches released.
    """
    n = 0
    while _ID_CACHES:
        try:
            _ID_CACHES.pop().unpersist()
            n += 1
        except Exception:  # session torn down — nothing to free
            pass
    return n


def exclusive_prefix_sum(
    df: DataFrame, order_col: str, val_col: str, out_col: str = "__off", lazy: bool = False
) -> DataFrame:
    """Add ``out_col`` = exclusive running sum of ``val_col`` in
    ``order_col`` order, without a single-task global window and
    without re-embedding ``df``'s lineage.

    Range-repartition by ``order_col`` (disjoint, ordered ranges),
    prefix-sum within each partition with a window, then add the
    per-partition base offsets — one long per PARTITION, bounded by
    ``defaultParallelism``, never data. Two delivery modes for the
    bases:

    * eager (default): collected to the driver and injected as a
      literal map lookup on ``spark_partition_id()`` — the
      ``zipWithIndex`` scheme. Triggers one aggregation job at call
      time (the repartitioned input is cached for reuse), and the
      output plan embeds ``df`` exactly once — use this inside
      chained operators, where a second embedding multiplies subtree
      copies multiplicatively down the chain.
    * ``lazy=True``: the bases join back via a broadcast of the
      p-row totals table (a justified broadcast: bounded by cluster
      parallelism). No job at call time, but the plan embeds the
      repartitioned input twice — use at pipeline tails.

    The sampled range boundaries only decide which partition a row
    lands in, never its global position — results are deterministic
    for distinct ``order_col`` values.
    """
    p = df.sparkSession.sparkContext.defaultParallelism
    d = (
        df.repartitionByRange(p, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__p", F.spark_partition_id())
    )
    w_in = (
        Window.partitionBy("__p").orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    )
    run = F.coalesce(F.sum(val_col).over(w_in), F.lit(0))
    if lazy:
        totals_df = d.groupBy("__p").agg(F.sum(val_col).alias("__tot"))
        w_base = Window.orderBy("__p").rowsBetween(Window.unboundedPreceding, -1)
        bases_df = totals_df.select(
            "__p", F.coalesce(F.sum("__tot").over(w_base), F.lit(0)).alias("__base")
        )
        return (
            d.join(F.broadcast(bases_df), on="__p")
            .withColumn(out_col, (F.col("__base") + run).cast("long"))
            .drop("__p", "__base")
        )
    d = d.persist()
    _ID_CACHES.append(d)
    totals = {
        r["__p"]: r["__t"]
        for r in d.groupBy("__p").agg(F.sum(val_col).alias("__t")).collect()
    }
    bases: list[str] = []
    acc = 0
    for pid in sorted(totals):
        bases.extend([str(pid), str(acc)])
        acc += int(totals[pid] or 0)
    # ONE SQL string instead of 2p F.lit py4j round trips (r12)
    base = (
        F.expr(f"coalesce(element_at(map({', '.join(bases)}), __p), 0)")
        if bases
        else F.lit(0)
    )
    return d.withColumn(out_col, (base + run).cast("long")).drop("__p")


def dense_id_by_user(
    df: DataFrame,
    order_by: list[Column | str],
    id_col: str = "id",
    user_col: str = "user_id",
) -> DataFrame:
    """Add ``id_col`` = dense 0-based rank over (user_col, *order_by).

    Equivalent to ``row_number() over (order by user, *order_by) - 1``
    but with the zipWithIndex scheme: ONE range shuffle on the sort
    key, per-partition row_number, driver-collected per-partition
    bases (<= defaultParallelism longs) added as a literal map lookup.
    No global sort task, no join, and the input lineage appears in the
    output plan exactly once — chains of generate-operators plan in
    linear, not exponential, tree size. Range partitioning keeps equal
    keys together, so ids are deterministic wherever the sort key is.
    """
    p = df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in [user_col, *order_by]]
    d = (
        df.repartitionByRange(p, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__p", F.spark_partition_id())
        .persist()
    )
    _ID_CACHES.append(d)
    counts = {r["__p"]: r["__n"] for r in d.groupBy("__p").agg(F.count(F.lit(1)).alias("__n")).collect()}
    bases: list[str] = []
    acc = 0
    for pid in sorted(counts):
        bases.extend([str(pid), str(acc)])
        acc += int(counts[pid])
    # ONE SQL string instead of 2p F.lit py4j round trips (r12): the
    # literal map is identical, building it is ~60 fewer JVM calls.
    base = f"coalesce(element_at(map({', '.join(bases)}), __p), 0)" if bases else "0"
    w = Window.partitionBy("__p").orderBy(*cols)
    return d.withColumn(id_col, (F.expr(base) + F.row_number().over(w) - 1).cast("long")).drop("__p")


def dense_rank_ordered(df: DataFrame, order_col: str, out_col: str = "dense_id") -> DataFrame:
    """Global 0-based dense index over the DISTINCT values of ``order_col``
    without a single-task global window.

    The exclusive prefix count of ones over the distinct values IS the
    dense rank. Use when the distinct-value count can grow with the
    data (e.g. cluster labels); for per-user ids use
    :func:`dense_id_by_user`. Runs in the lazy mode (broadcast of the
    bounded p-row bases): densification sits at pipeline tails, where
    the double lineage embedding doesn't compound and skipping the
    eager counting job saves an action.
    """
    d = df.select(order_col).distinct().withColumn("__one", F.lit(1))
    return (
        exclusive_prefix_sum(d, order_col, "__one", out_col=out_col, lazy=True)
        .select(order_col, out_col)
    )
