"""Distributed connected components (min-label propagation).

The shared iterative core behind dataset-level DBSCAN
(operators/dbscan_distributed.py) and near-duplicate clustering
(scale/dedup.py): given an undirected edge list, every vertex converges
to the minimum vertex id of its component. Pointer jumping (path
halving) brings convergence from O(component diameter) joins to
~O(log diameter); each round ``localCheckpoint``s to truncate lineage —
the classic iterative-algorithm trap is per-round plan growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _union_find_components(pairs) -> list[tuple[int, int]]:
    """Driver-side union-find (path halving + union by root id) for the
    small-graph fast path. Returns (vertex, min-member-of-component)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            parent[r] = parent[parent[r]]
            r = parent[r]
        return r

    for a, b in pairs:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # union toward the smaller id: the root IS the component min
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return [(v, find(v)) for v in parent]


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iterations: int = 50,
    small_graph_edges: int = 200_000,
    edge_count: int | None = None,
) -> DataFrame:
    """Label vertices of the undirected graph given by ``edges``.

    Returns (vertex, component) where ``component`` is the minimum
    vertex id in the vertex's connected component. Isolated vertices
    (absent from edges) are simply absent from the result — union the
    full vertex set afterwards if needed.

    Two-level execution, like a broadcast join's size gate: callers
    here always hand in CONTRACTED graphs (DBSCAN's core-cell graph,
    dedup's candidate-pair graph) that are orders of magnitude smaller
    than the data, so when the deduplicated edge list fits the
    ``small_graph_edges`` budget it is solved on the driver with
    union-find — no per-round shuffle latency. Larger graphs run the
    distributed min-label + pointer-jumping loop unchanged; the size
    probe costs one aggregation over a cache both paths reuse.

    Driver memory: the fast path collects a 2-column projection of at
    most ``small_graph_edges`` rows — roughly 100 MB of Row objects at
    the default 200k budget, freed after the union-find. Raise
    ``small_graph_edges`` only with a matching driver-memory budget;
    the distributed path is always a safe fallback. (A
    ``toLocalIterator`` variant was tried and reverted: it launches
    one sequential job per partition, adding seconds of latency per
    component call.)
    """
    one = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))

    # fast path: distinct edges small enough for the driver (self-loops
    # kept so isolated-with-self-loop vertices stay labeled). A caller
    # who already knows the (upper bound on the) distinct edge count
    # passes ``edge_count`` and skips the size-probe job + persist
    # entirely; otherwise ONE count() action on the cached distinct
    # edges decides, and the same cache feeds the collect.
    if edge_count is not None and edge_count <= small_graph_edges:
        pairs = one.distinct().collect()
        spark = edges.sparkSession
        vtype = edges.schema[src].dataType.simpleString()
        labels = _union_find_components((r[0], r[1]) for r in pairs)
        if not labels:
            return spark.createDataFrame([], f"vertex {vtype}, component {vtype}")
        return spark.createDataFrame(labels, f"vertex {vtype}, component {vtype}")
    one_persisted = False
    if edge_count is None:
        # the edge lineage may be EXPENSIVE (an LSH dedup, a banded
        # similarity join): persist before the probe so the probe and the
        # symmetrizing explode read one materialization — unpersisted as
        # soon as sym is checkpointed (measured: without this,
        # dedup_clusters over a 1M-vector LSH pair graph re-ran the dedup
        # repeatedly and blew a 20-minute budget)
        one = one.persist()
        one_persisted = True
        # limit(n+1) short-circuits the probe: one job that stops as soon
        # as n+1 distinct edges exist, instead of a full distinct shuffle
        # + count whose result the distributed path never reuses. When the
        # graph IS small the collected rows feed union-find directly, so
        # the small path costs exactly one action.
        probe = one.distinct().limit(small_graph_edges + 1).collect()
        if len(probe) <= small_graph_edges:
            labels = _union_find_components((r[0], r[1]) for r in probe)
            one.unpersist()
            spark = edges.sparkSession
            vtype = edges.schema[src].dataType.simpleString()
            if not labels:
                return spark.createDataFrame([], f"vertex {vtype}, component {vtype}")
            return spark.createDataFrame(labels, f"vertex {vtype}, component {vtype}")
        del probe

    # symmetrize with ONE map-side explode, not a self-union: a union of
    # a cached frame with a projection of itself defeats Spark's cache
    # substitution (measured: each action on the union re-ran the full
    # expensive edge lineage — 64s a pop on a 200k-vector LSH pair graph
    # whose cached scan costs 0.2s), and even uncached the explode halves
    # the input scans. Duplicate edges are harmless for the min()
    # aggregation, so no distinct (that would be a shuffle).
    # localCheckpoint (not persist): the iteration references sym several
    # times per round (propagation join + the pointer-jump self-join), and
    # Spark's cache substitution does NOT reliably kick in for repeated
    # occurrences of one cached subplan inside a single query — measured
    # 60s/iteration re-running the dedup lineage vs 0.3s reading the same
    # data through a checkpoint. A checkpoint has no lineage to re-run.
    sym = (
        one.select(
            F.explode(
                F.array(
                    F.struct(F.col("a"), F.col("b")),
                    F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
                )
            ).alias("__e")
        )
        .select(F.col("__e.a").alias("a"), F.col("__e.b").alias("b"))
        .localCheckpoint()  # eager: ONE evaluation of the edge lineage
    )
    if one_persisted:
        one.unpersist()

    labels = sym.select(F.col("a").alias("vid")).distinct().withColumn("lbl", F.col("vid"))
    labels = labels.localCheckpoint()
    # labels only ever decrease under min-propagation, so the label sum
    # is strictly monotone: fixpoint iff the sum is unchanged. One agg
    # action per round instead of a join + count. decimal(38) dodges
    # overflow for any realistic (vid magnitude x vertex count).
    _sum = lambda df: df.agg(F.sum(F.col("lbl").cast("decimal(38,0)"))).collect()[0][0]  # noqa: E731
    prev_sum = _sum(labels)
    for _ in range(max_iterations):
        prop = (
            sym.join(labels.withColumnRenamed("vid", "b").withColumnRenamed("lbl", "lbl_b"), on="b")
            .groupBy("a")
            .agg(F.min("lbl_b").alias("nbr_min"))
        )
        updated = (
            labels.join(prop.withColumnRenamed("a", "vid"), on="vid", how="left")
            .select("vid", F.least(F.col("lbl"), F.coalesce("nbr_min", F.col("lbl"))).alias("lbl"))
        )
        # pointer jumping: adopt the label OF our label
        lbl_of_lbl = updated.select(F.col("vid").alias("lbl"), F.col("lbl").alias("lbl2"))
        updated = (
            updated.join(lbl_of_lbl, on="lbl", how="left")
            .select("vid", F.least(F.col("lbl"), F.coalesce("lbl2", F.col("lbl"))).alias("lbl"))
            .localCheckpoint()
        )
        new_sum = _sum(updated)
        labels = updated
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select(F.col("vid").alias("vertex"), F.col("lbl").alias("component"))
