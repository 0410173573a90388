"""Distributed dataset-level DBSCAN over point tables.

SURVEY.md §4 item 3: the reference's ``agg_level='dataset'`` runs one
global sklearn DBSCAN — centralized and O(n²). This is the scale path,
a grid-contraction DBSCAN (the GriDBSCAN / MR-DBSCAN family):

1. grid partition with cells of size **eps/2**: any two points in the
   same cell are within eps by construction (cell diagonal = eps/√2),
   so same-cell neighbor counts come from the CELL SIZE — a dense blob
   of n points in one cell costs n rows, never n² pairs;
2. cross-cell neighbor candidates: each point probes the half of its
   5×5 cell neighborhood that is lexicographically above its own cell
   (12 offsets, found pairs are symmetrized — half the shuffle volume),
   with a conservative per-axis distance prune before the shuffle;
   exact great-circle check after the equi-join. Probes whose target
   cell sits ENTIRELY inside the prober's eps-disk are handled by the
   fully-covered-cell rule (GriDBSCAN family): cell counts and
   per-cell aggregates replace the pair join in both directions, so
   two saturated adjacent cells — one dense blob straddling a cell
   boundary — never materialize n·m pair rows;
3. core points: same-cell count + checked cross-cell matches
   >= min_samples;
4. cluster formation: all core points of one cell are mutually within
   eps (a clique), so connectivity collapses to the **cell graph** —
   one node per core-bearing cell, one edge per cell pair with a
   core-core eps-match. Connected components (plans/graph.py, pointer
   jumping) run on this contracted graph, which is orders of magnitude
   smaller than the point eps-graph (a near-clique hotspot contributes
   ONE node instead of n² edges);
5. border points attach to the minimum-label core-bearing cell they
   can reach (own cell, or a matched cross-cell core neighbor).

Semantics match DBSCAN except cluster NUMBERING and the tie-break for
border points reachable from multiple clusters (sklearn uses scan
order; here the minimum label wins — deterministic, order-free).
Labels are re-densified to 0..k-1 ordered by (min core member id) for
stability. Cell indexing scales longitude by cos(lat); the factor-2
margin of eps/2 cells absorbs the planar-vs-spherical distortion for
any eps far below continental scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trackintel_spark.functions.spatial import haversine_m

# the half neighborhood: offsets strictly above (0,0) in (dy, dx) order.
# every unordered cross-cell pair within 2 cells is discovered exactly
# once (Δ or -Δ lies in this half-space), then symmetrized.
_HALF_OFFSETS = [
    (dx, dy)
    for dx in (-2, -1, 0, 1, 2)
    for dy in (-2, -1, 0, 1, 2)
    if (dy, dx) > (0, 0)
]


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
    for noise. Linear in data volume: no step materializes point-pair
    lists inside dense cells, and label propagation runs on the cell
    graph, not the point graph."""
    cell_deg = (epsilon_m / 2.0) / 111320.0  # eps/2 cells, see module doc

    pts = points.select(
        F.col(id_col).alias("pid"),
        F.col(lon_col).cast("double").alias("lon"),
        F.col(lat_col).cast("double").alias("lat"),
    )
    slon = F.col("lon") * F.cos(F.radians(F.col("lat")))  # scaled lon (degrees)
    pts = (
        pts.withColumn("__slon", slon)
        .withColumn("cx", F.floor(F.col("__slon") / cell_deg).cast("long"))
        .withColumn("cy", F.floor(F.col("lat") / cell_deg).cast("long"))
        .persist()
    )

    # per-cell size and minimum pid: one row per occupied cell
    cells = pts.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("__n"))

    # cross-cell candidates: probe the upper half neighborhood; prune a
    # probe when a single axis already puts the probed cell out of reach
    # (conservative: 1.05 margin over the planar axis distance, the
    # exact haversine check decides after the join). Probes whose target
    # cell lies ENTIRELY within eps of the probing point (farthest-corner
    # distance <= eps/1.05 — the margin errs toward exact checking) are
    # classified "full": every point of that cell is a neighbor by
    # construction, so the pair join is skipped and the CELL COUNT is
    # used instead. This is what keeps two saturated adjacent cells —
    # a railway-station blob straddling a boundary — from pair-listing
    # n*m rows: the GriDBSCAN fully-covered-cell rule.
    axis_m = 111320.0
    reach = epsilon_m * 1.05
    full_reach = epsilon_m / 1.05
    probes = []
    for dx, dy in _HALF_OFFSETS:
        tx, ty = F.col("cx") + dx, F.col("cy") + dy
        # distance from the point to the probed cell's bounding box, per axis
        ddx = F.greatest(tx * cell_deg - F.col("__slon"), F.col("__slon") - (tx + 1) * cell_deg, F.lit(0.0))
        ddy = F.greatest(ty * cell_deg - F.col("lat"), F.col("lat") - (ty + 1) * cell_deg, F.lit(0.0))
        keep = (ddx * axis_m <= reach) & (ddy * axis_m <= reach)
        # farthest corner of the probed box, per axis (always >= 0)
        fdx = F.greatest(F.col("__slon") - tx * cell_deg, (tx + 1) * cell_deg - F.col("__slon"))
        fdy = F.greatest(F.col("lat") - ty * cell_deg, (ty + 1) * cell_deg - F.col("lat"))
        dmax_m = F.sqrt(F.pow(fdx * axis_m, F.lit(2.0)) + F.pow(fdy * axis_m, F.lit(2.0)))
        probes.append(
            F.when(keep, F.struct(tx.alias("cx"), ty.alias("cy"), (dmax_m <= full_reach).alias("full")))
        )
    probe = pts.select(
        F.col("pid").alias("qid"),
        F.col("lon").alias("qlon"),
        F.col("lat").alias("qlat"),
        F.col("cx").alias("qcx"),
        F.col("cy").alias("qcy"),
        F.explode(F.filter(F.array(*probes), lambda c: c.isNotNull())).alias("__c"),
    ).select(
        "qid", "qlon", "qlat", "qcx", "qcy",
        F.col("__c.cx").alias("cx"), F.col("__c.cy").alias("cy"), F.col("__c.full").alias("full"),
    )
    # full probes: (prober, target cell) — no pair rows ever materialize.
    # probe is NOT persisted: both branches re-derive it with pure map
    # work from pts' cache, cheaper than materializing 12x N probe rows.
    pfull = probe.filter(F.col("full")).select("qid", "qcx", "qcy", "cx", "cy")

    half = probe.filter(~F.col("full")).join(pts.drop("__slon"), on=["cx", "cy"], how="inner").filter(
        haversine_m(F.col("qlon"), F.col("qlat"), F.col("lon"), F.col("lat")) <= epsilon_m
    )
    # symmetrize: (a, a_cell, b, b_cell) once per direction
    cross = half.select(
        F.col("qid").alias("a"), F.col("qcx").alias("acx"), F.col("qcy").alias("acy"),
        F.col("pid").alias("b"), F.col("cx").alias("bcx"), F.col("cy").alias("bcy"),
    ).unionByName(
        half.select(
            F.col("pid").alias("a"), F.col("cx").alias("acx"), F.col("cy").alias("acy"),
            F.col("qid").alias("b"), F.col("qcx").alias("bcx"), F.col("qcy").alias("bcy"),
        )
    ).persist()

    # neighbor count = own-cell size (incl. self) + checked cross
    # matches + full-cell contributions, both directions: a prober gains
    # the whole target cell's size; every target-cell member gains one
    # neighbor per full prober of its cell. Joins on cell keys carry no
    # broadcast hint: the cell table scales with the data, and AQE turns
    # the join into a broadcast at runtime whenever it actually is small.
    # one pid-keyed count (cross matches + full-cell sums unioned before
    # a single aggregation) and one cell-keyed count folded into the
    # cells table: the data-sized pts table is joined once per key type.
    per_pid = (
        cross.select(F.col("a").alias("pid"), F.lit(1).alias("__c"))
        .unionByName(
            pfull.join(cells, on=["cx", "cy"]).select(
                F.col("qid").alias("pid"), F.col("__n").alias("__c")
            )
        )
        .groupBy("pid")
        .agg(F.sum("__c").alias("__xn"))
    )
    full_in = pfull.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("__fi"))
    cells_n = cells.join(full_in, on=["cx", "cy"], how="left").select(
        "cx", "cy", (F.col("__n") + F.coalesce("__fi", F.lit(0))).alias("__cn")
    )
    flag = (
        pts.join(cells_n, on=["cx", "cy"])
        .join(per_pid, on="pid", how="left")
        .select(
            "pid", "cx", "cy",
            ((F.col("__cn") + F.coalesce("__xn", F.lit(0))) >= min_samples).alias("is_core"),
        )
        .persist()
    )
    core_pts = flag.filter(F.col("is_core"))

    # cell graph: node = core-bearing cell, labeled by its min core pid
    cell_node = core_pts.groupBy("cx", "cy").agg(F.min("pid").alias("node"))
    crossf = (
        cross.join(flag.select(F.col("pid").alias("a"), F.col("is_core").alias("a_core")), on="a")
        .join(flag.select(F.col("pid").alias("b"), F.col("is_core").alias("b_core")), on="b")
        .persist()
    )
    # full probes annotated with the prober's core flag; target cells
    # with a core resolve through cell_node joins below. A core prober
    # fully covering a core-bearing cell proves a core-core eps pair
    # without materializing it.
    pfullf = pfull.join(
        flag.select(F.col("pid").alias("qid"), F.col("is_core").alias("q_core")), on="qid"
    ).persist()
    edges_part = (
        crossf.filter(F.col("a_core") & F.col("b_core"))
        .groupBy("acx", "acy", "bcx", "bcy")
        .agg(F.count(F.lit(1)).alias("__e"))
        .select("acx", "acy", "bcx", "bcy")
    )
    edges_full = (
        pfullf.filter(F.col("q_core"))
        .select(
            F.col("qcx").alias("acx"), F.col("qcy").alias("acy"),
            F.col("cx").alias("bcx"), F.col("cy").alias("bcy"),
        )
        .distinct()
    )
    cc_edges = (
        edges_part.unionByName(edges_full)
        .join(
            cell_node.select(F.col("cx").alias("acx"), F.col("cy").alias("acy"), F.col("node").alias("na")),
            on=["acx", "acy"],
        )
        .join(
            cell_node.select(F.col("cx").alias("bcx"), F.col("cy").alias("bcy"), F.col("node").alias("nb")),
            on=["bcx", "bcy"],
        )
        .select("na", "nb")
    )

    from trackintel_spark.plans.graph import connected_components

    cc = connected_components(cc_edges, "na", "nb", max_iterations=max_iterations)
    # component label per cell = min core pid of the component (the CC
    # label already is the min node id = min per-cell min core pid)
    cell_lbl = (
        cell_node.join(cc, cell_node["node"] == cc["vertex"], how="left")
        .select("cx", "cy", F.coalesce("component", F.col("node")).alias("lbl"))
    )

    core_labeled = core_pts.join(cell_lbl, on=["cx", "cy"]).select("pid", "lbl")

    # border points: not core, but within eps of a core — via their own
    # cell (everything in a cell is within eps) or a matched cross pair
    own_cell = (
        flag.filter(~F.col("is_core"))
        .join(cell_lbl, on=["cx", "cy"])  # inner: only core-bearing cells
        .select("pid", "lbl")
    )
    via_cross = (
        crossf.filter(~F.col("a_core") & F.col("b_core"))
        .join(
            cell_lbl.select(F.col("cx").alias("bcx"), F.col("cy").alias("bcy"), "lbl"),
            on=["bcx", "bcy"],
        )
        .select(F.col("a").alias("pid"), "lbl")
    )
    # full probes, prober side: a non-core prober fully covering a
    # core-bearing cell is within eps of its cores
    via_full_out = (
        pfullf.filter(~F.col("q_core"))
        .join(cell_lbl, on=["cx", "cy"])  # inner: target must bear a core
        .select(F.col("qid").alias("pid"), "lbl")
    )
    # full probes, target side: members of a fully-covered cell are
    # within eps of every CORE prober — attach to the min prober-cell
    # label, resolved once per cell
    prober_lbl = (
        pfullf.filter(F.col("q_core"))
        .join(
            cell_lbl.select(F.col("cx").alias("qcx"), F.col("cy").alias("qcy"), "lbl"),
            on=["qcx", "qcy"],
        )
        .groupBy("cx", "cy")
        .agg(F.min("lbl").alias("lbl"))
    )
    via_full_in = (
        flag.filter(~F.col("is_core")).join(prober_lbl, on=["cx", "cy"]).select("pid", "lbl")
    )
    border = (
        own_cell.unionByName(via_cross)
        .unionByName(via_full_out)
        .unionByName(via_full_in)
        .groupBy("pid")
        .agg(F.min("lbl").alias("lbl"))
    )

    all_labels = core_labeled.unionByName(border)

    # densify labels 0..k-1 by min-core-member order; two-phase
    # range-partitioned rank so a huge cluster count never funnels
    # through one task
    from trackintel_spark.plans.ids import dense_rank_ordered

    dense = dense_rank_ordered(all_labels.select("lbl"), "lbl", out_col="location_id")
    out = (
        pts.select("pid")
        .join(all_labels, on="pid", how="left")
        .join(dense, on="lbl", how="left")
        .select(F.col("pid").alias(id_col), "location_id")
    )
    return out
