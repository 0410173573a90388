"""Deterministic, scalable dense id assignment.

Every trackintel generate-operator assigns fresh int64 ids 0..n-1 in
(user_id, time) order (e.g. preprocessing/positionfixes.py:162-164).
A naive ``row_number() OVER (ORDER BY ...)`` funnels the whole table
through ONE task — unacceptable at 100 TB.

:func:`dense_id_by_user` decomposes the global rank per guide §8
(decide with small rows, move big rows once): a per-user COUNTS table
(bounded by users, never data) is aggregated eagerly and checkpointed
to a leaf; its exclusive prefix sum in user order gives each user's
base offset; the row's id is base + row_number() within the user —
a window that reuses the operator's existing hash(user) clustering.
The payload crosses at most one hash exchange; the earlier
zipWithIndex shape range-shuffled the FULL payload (twice — key
sampling pass plus the shuffle), cached a copy, and collected
per-partition bases to the driver.

:func:`exclusive_prefix_sum` still offers that driver-collected
eager mode for callers that need an in-plan literal (bounded by
cluster parallelism, never data). Its cache is LOAD-BEARING: the
collected bases describe the cached partitioning, so it must not
unpersist under its own output. Long sessions accumulate one cached
copy per eager call — call :func:`release_id_caches` after the
consuming action (write/collect) to free them all.
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
    df: DataFrame,
    order_col: str,
    val_col: str,
    out_col: str = "__off",
    lazy: bool = False,
    hint: bool = True,
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
            d.join(F.broadcast(bases_df) if hint else bases_df, on="__p")
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

    Equivalent to ``row_number() over (order by user, *order_by) - 1``,
    decomposed per guide §8 (decide with small rows, move big rows
    once): global id = per-user base offset + in-user rank.

    * per-user counts: ONE eager aggregation over ``df`` (map-side
      partial; payload columns the count doesn't need are pruned),
      checkpointed to a leaf bounded by the USER count, never data;
    * bases: exclusive prefix sum of those counts in ``user_col``
      order — lazy mode over the tiny leaf, so no driver collect and
      no broadcast of anything data-sized;
    * rank: ``row_number()`` per user, which reuses ``df``'s existing
      hash(user) clustering when present. The payload crosses at most
      ONE hash exchange and is never range-sampled, range-shuffled or
      pinned in storage memory (the previous zipWithIndex shape did
      all three: the range exchange executed the input twice — key
      sampling pass, then the shuffle itself — and kept a full cached
      copy alive for the main query).

    The input lineage appears in the output plan exactly once (the
    counts branch ends at the checkpoint leaf), so chained
    generate-operators still plan in linear tree size. NULL users sort
    first in the prefix order and join-miss to a 0 base — exactly the
    rank the global row_number gives them. Ids are deterministic
    wherever (user_col, *order_by) is unique per row; when ``df`` is
    not persisted the counts pass and the main query each evaluate it,
    so ``df`` must be deterministic (all operator kernels are).
    """
    ocols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    counts = (
        df.groupBy(user_col)
        .agg(F.count(F.lit(1)).alias("__di_n"))
        .localCheckpoint(eager=True)
    )
    # hint=False: every join side here derives from the tiny counts
    # leaf — AQE broadcasts them at runtime from MEASURED sizes, and
    # skipping the static hint keeps operator plans hint-free (the
    # plan-quality suite treats ResolvedHint as a forced broadcast)
    bases = exclusive_prefix_sum(
        counts, user_col, "__di_n", out_col="__di_base", lazy=True, hint=False
    ).select(user_col, "__di_base")
    w = Window.partitionBy(user_col).orderBy(*ocols)
    return (
        df.withColumn("__di_rn", F.row_number().over(w))
        .join(bases, on=user_col, how="left")
        .withColumn(
            id_col,
            (F.coalesce(F.col("__di_base"), F.lit(0)) + F.col("__di_rn") - 1).cast("long"),
        )
        .drop("__di_rn", "__di_base")
    )


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
