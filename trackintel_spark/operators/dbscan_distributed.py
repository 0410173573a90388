"""Distributed dataset-level DBSCAN over point tables.

SURVEY.md §4 item 3: the reference's ``agg_level='dataset'`` runs one
global sklearn DBSCAN — centralized and O(n²). This is the scale path:

1. grid partition: each point hashes to an eps-sized cell; all
   eps-neighbors of a point lie in its 3x3 cell neighborhood, so
   neighbor search is an equi-join on cell ids (no cross join);
2. core points: neighbor count >= min_samples (great-circle metric);
3. cluster formation: connected components over the core-core
   eps-graph via iterative min-label propagation (converges in
   O(graph diameter) joins, each a shuffle on point id);
4. border points: attach to the minimum-label core neighbor.

Semantics match DBSCAN except cluster NUMBERING and the tie-break for
border points reachable from multiple clusters (sklearn uses scan
order; here the minimum label wins — deterministic, order-free).
Labels are re-densified to 0..k-1 by (min member id) for stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trackintel_spark.functions.spatial import haversine_m


def dbscan_distributed(
    points: DataFrame,
    epsilon_m: float = 100.0,
    min_samples: int = 1,
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    max_iterations: int = 50,
) -> DataFrame:
    """Cluster (id, lon, lat) rows; returns (id, location_id) with NULL
    for noise. Scales linearly with data volume for realistic densities
    (cell occupancy bounded)."""
    eps_lat_deg = epsilon_m / 111320.0

    pts = points.select(
        F.col(id_col).alias("pid"),
        F.col(lon_col).cast("double").alias("lon"),
        F.col(lat_col).cast("double").alias("lat"),
    )
    # eps-sized grid; lon cells scaled by cos(lat) so every eps-ball is
    # covered by the 3x3 neighborhood
    cell_lat = F.floor(F.col("lat") / eps_lat_deg)
    cell_lon = F.floor(F.col("lon") * F.cos(F.radians(F.col("lat"))) / eps_lat_deg)
    pts = pts.withColumn("cx", cell_lon.cast("long")).withColumn("cy", cell_lat.cast("long")).persist()

    # neighbor pairs: explode each point to its 9 candidate cells and
    # equi-join on the cell — each true eps-pair appears exactly once
    # per (probe cell == home cell of the other side)
    probe = pts.select(
        F.col("pid").alias("qid"),
        F.col("lon").alias("qlon"),
        F.col("lat").alias("qlat"),
        F.explode(
            F.array(*[F.struct((F.col("cx") + dx).alias("cx"), (F.col("cy") + dy).alias("cy"))
                      for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
        ).alias("__c"),
    ).select("qid", "qlon", "qlat", F.col("__c.cx").alias("cx"), F.col("__c.cy").alias("cy"))

    pairs = probe.join(pts, on=["cx", "cy"], how="inner").filter(
        haversine_m(F.col("qlon"), F.col("qlat"), F.col("lon"), F.col("lat")) <= epsilon_m
    ).select(F.col("qid").alias("a"), F.col("pid").alias("b"))
    pairs = pairs.persist()

    counts = pairs.groupBy("a").agg(F.count(F.lit(1)).alias("__n"))  # includes self
    core = counts.filter(F.col("__n") >= min_samples).select(F.col("a").alias("pid"))
    core = core.persist()

    # core-core edges (symmetric)
    core_edges = (
        pairs.join(core.withColumnRenamed("pid", "a"), on="a")
        .join(core.withColumnRenamed("pid", "b"), on="b")
        .select("a", "b")
    ).persist()

    # connected components over the core-core eps-graph (shared min-label
    # propagation, plans/graph.py); isolated cores keep their own label
    from trackintel_spark.plans.graph import connected_components

    cc = connected_components(core_edges, "a", "b", max_iterations=max_iterations)
    core_labels = (
        core.join(cc, core["pid"] == cc["vertex"], how="left")
        .select("pid", F.coalesce("component", F.col("pid")).alias("lbl"))
    )
    border = (
        pairs.join(core_labels.withColumnRenamed("pid", "b").withColumnRenamed("lbl", "lbl_b"), on="b")
        .join(core.withColumnRenamed("pid", "a"), on="a", how="left_anti")
        .groupBy("a")
        .agg(F.min("lbl_b").alias("lbl"))
        .withColumnRenamed("a", "pid")
    )
    all_labels = core_labels.unionByName(border)

    # densify labels 0..k-1 by min-member order; two-phase range-partitioned
    # rank so a huge cluster count never funnels through one task
    from trackintel_spark.plans.ids import dense_rank_ordered

    dense = dense_rank_ordered(all_labels.select("lbl"), "lbl", out_col="location_id")
    out = (
        pts.select("pid")
        .join(all_labels, on="pid", how="left")
        .join(dense, on="lbl", how="left")
        .select(F.col("pid").alias(id_col), "location_id")
    )
    return out
