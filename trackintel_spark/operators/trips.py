"""generate_trips — aggregate staypoints + triplegs into trips.

Reference: trackintel ``generate_trips`` (preprocessing/triplegs.py:12-232)
with ``_concat_staypoints_triplegs`` (:235-291) and
``_get_activity_masks`` (:294-315). Fully vectorized in the reference
(shift/ffill over an interleaved frame); here it is pure DataFrame ops —
unionByName + per-user windows + running sums. No Python kernel.

Semantics reproduced:
* sp_tpls = staypoints ∪ triplegs per user ordered by started_at
  (:73, :290); staypoints must carry ``is_activity`` (:256-257);
* a new trip starts at: user change, the LAST activity of a consecutive
  activity block (:80, :294-315), or the row after a recording gap
  (started_at(next) - finished_at > gap_threshold, :84-85);
* trips aggregate the non-activity rows of each segment (:97-103);
  trips with no triplegs are dropped (:119) and ids re-counted densely
  (:122-123) in (user, time) order;
* origin/destination staypoint ids come from lag/lead over the
  interleaved sequence of trips + activity staypoints + synthetic gap
  buffer rows (:126-151). The reference also inserts user-change
  buffers; per-user windows make those redundant (lag/lead are NULL at
  partition boundaries by construction);
* trips that start/end at a gap get NULL origin/destination and, when
  ``add_geometry``, their endpoint imputed from the first/last
  coordinate of their first/last tripleg (:196-208); trip geometry is
  the (origin, destination) point pair (:210-212);
* staypoints receive ``trip_id``/``prev_trip_id``/``next_trip_id``,
  triplegs receive ``trip_id`` (:179-191).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trackintel_spark.model.schemas import validate
from trackintel_spark.plans.ids import dense_id_by_user


def generate_trips(
    staypoints: DataFrame,
    triplegs: DataFrame,
    gap_threshold: float = 15.0,
    add_geometry: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Generate trips; returns (sp+trip ids, tpls+trip_id, trips)."""
    validate(staypoints, "staypoints")
    validate(triplegs, "triplegs")
    if "is_activity" not in staypoints.columns:
        raise AttributeError("staypoints need the column 'is_activity' to be able to generate trips")

    gap_s = gap_threshold * 60.0

    # size-aware lineage boundary: this operator embeds each input in
    # several branches, so a chained upstream plan multiplies through —
    # truncate exactly when the duplicated re-scans outweigh one
    # materialization (plans/checkpoint.py; conf-tunable, no-op at
    # bench scale, pays off at probe/cluster scale like dbscan's flip).
    from trackintel_spark.plans.checkpoint import truncate_if_rescan_heavy

    staypoints = truncate_if_rescan_heavy(staypoints)
    triplegs = truncate_if_rescan_heavy(triplegs)

    sp_base = staypoints.drop(*[c for c in ("trip_id", "prev_trip_id", "next_trip_id") if c in staypoints.columns])
    tpls_base = triplegs.drop(*[c for c in ("trip_id",) if c in triplegs.columns])

    sp_part = sp_base.select(
        "user_id",
        "started_at",
        "finished_at",
        F.lit("staypoint").alias("type"),
        F.coalesce(F.col("is_activity"), F.lit(False)).alias("is_activity"),
        F.col("id").alias("sp_tpls_id"),
        F.col("geom").alias("pt") if add_geometry else F.lit(None).cast("struct<lon:double,lat:double>").alias("pt"),
    )
    tpls_part = tpls_base.select(
        "user_id",
        "started_at",
        "finished_at",
        F.lit("tripleg").alias("type"),
        F.lit(False).alias("is_activity"),
        F.col("id").alias("sp_tpls_id"),
        F.lit(None).cast("struct<lon:double,lat:double>").alias("pt"),
    )
    sp_tpls = sp_part.unionByName(tpls_part)

    w = Window.partitionBy("user_id").orderBy("started_at", "type", "sp_tpls_id")

    staged = (
        sp_tpls.withColumn("__first", F.row_number().over(w) == 1)
        .withColumn("__next_act", F.lead("is_activity").over(w))
        .withColumn(
            "__gap",
            (F.lead("started_at").over(w).cast("double") - F.col("finished_at").cast("double")) > gap_s,
        )
        .withColumn("__pos", F.row_number().over(w))
    )
    staged = staged.withColumn("__gap", F.coalesce(F.col("__gap"), F.lit(False))).withColumn(
        "__prev_gap", F.coalesce(F.lag("__gap").over(w), F.lit(False))
    )
    # new-trip trigger (reference :77-87): user change | last activity of
    # a block | first row after a gap.
    new_trip = (
        F.col("__first")
        | (F.col("is_activity") & ~F.coalesce(F.col("__next_act"), F.lit(False)))
        | F.col("__prev_gap")
    )
    staged = staged.withColumn("__new_trip", new_trip)
    staged = staged.withColumn("__temp_trip", F.sum(F.col("__new_trip").cast("long")).over(w))

    # aggregate non-activity members per temp trip (:97-116)
    members = staged.filter(~F.col("is_activity"))
    trips_raw = members.groupBy("user_id", "__temp_trip").agg(
        F.min("started_at").alias("started_at"),
        F.max("finished_at").alias("finished_at"),
        F.array_sort(
            F.collect_list(
                F.when(F.col("type") == "staypoint", F.struct(F.col("__pos").alias("o"), F.col("sp_tpls_id").alias("i")))
            )
        ).alias("__sps"),
        F.array_sort(
            F.collect_list(
                F.when(F.col("type") == "tripleg", F.struct(F.col("__pos").alias("o"), F.col("sp_tpls_id").alias("i")))
            )
        ).alias("__tpls"),
    )
    trips_raw = trips_raw.withColumn("sps", F.transform("__sps", lambda s: s["i"])).withColumn(
        "tpls", F.transform("__tpls", lambda s: s["i"])
    )
    # drop trips without triplegs (:119) and assign dense ids (:122-123)
    trips_raw = trips_raw.filter(F.size("tpls") > 0)
    trips_raw = dense_id_by_user(trips_raw, order_by=["__temp_trip"], id_col="id").drop("__sps", "__tpls")
    # trips_raw feeds the interleave, endpoint-geometry joins, and both
    # link-backs — persist so its (window-heavy) lineage runs once.
    trips_raw = trips_raw.persist()

    # interleave trips + activity staypoints + gap buffers (:126-146)
    trip_rows = trips_raw.select(
        "user_id",
        "started_at",
        F.lit("trip").alias("type"),
        F.lit(None).cast("long").alias("sp_tpls_id"),
        F.col("id").alias("trip_id"),
        F.lit(False).alias("is_activity"),
        F.lit(None).cast("struct<lon:double,lat:double>").alias("pt"),
    )
    act_rows = staged.filter(F.col("is_activity") & (F.col("type") == "staypoint")).select(
        "user_id",
        "started_at",
        F.lit("staypoint").alias("type"),
        "sp_tpls_id",
        F.lit(None).cast("long").alias("trip_id"),
        F.lit(True).alias("is_activity"),
        "pt",
    )
    gap_rows = staged.filter(F.col("__gap")).select(
        "user_id",
        F.timestamp_seconds(F.col("finished_at").cast("double") + gap_s / 2.0).alias("started_at"),
        F.lit("gap").alias("type"),
        F.lit(None).cast("long").alias("sp_tpls_id"),
        F.lit(None).cast("long").alias("trip_id"),
        F.lit(True).alias("is_activity"),
        F.lit(None).cast("struct<lon:double,lat:double>").alias("pt"),
    )
    inter = trip_rows.unionByName(act_rows).unionByName(gap_rows)

    wi = Window.partitionBy("user_id").orderBy("started_at", "type", "sp_tpls_id")
    inter = inter.persist()
    inter = (
        inter.withColumn("origin_staypoint_id", F.lag("sp_tpls_id").over(wi))
        .withColumn("destination_staypoint_id", F.lead("sp_tpls_id").over(wi))
        .withColumn("origin_pt", F.lag("pt").over(wi))
        .withColumn("destination_pt", F.lead("pt").over(wi))
        .withColumn("prev_trip_id", F.lag("trip_id").over(wi))
        .withColumn("next_trip_id", F.lead("trip_id").over(wi))
    )

    trips = (
        inter.filter(F.col("type") == "trip")
        .select(
            F.col("trip_id").alias("id"),
            "user_id",
            "origin_staypoint_id",
            "destination_staypoint_id",
            "origin_pt",
            "destination_pt",
        )
        .join(
            trips_raw.select("id", "started_at", "finished_at", "sps", "tpls"),
            on="id",
            how="inner",
        )
    )

    if add_geometry:
        # impute missing endpoints from the first/last tripleg coordinate
        # (:196-208): join the tripleg geometry for first/last member legs.
        first_last = trips.select(
            F.col("id").alias("__tid"),
            F.element_at("tpls", 1).alias("__first_tpl"),
            F.element_at("tpls", -1).alias("__last_tpl"),
        )
        tg = tpls_base.select(F.col("id").alias("__gid"), F.col("geom").alias("__tgeom"))
        fg = first_last.join(tg, first_last["__first_tpl"] == tg["__gid"], "left").select(
            "__tid", F.element_at("__tgeom", 1).alias("__first_pt")
        )
        lg = first_last.join(tg, first_last["__last_tpl"] == tg["__gid"], "left").select(
            F.col("__tid").alias("__tid2"), F.element_at("__tgeom", -1).alias("__last_pt")
        )
        trips = (
            trips.join(fg, trips["id"] == fg["__tid"], "left")
            .join(lg, trips["id"] == lg["__tid2"], "left")
            .withColumn("origin_pt", F.coalesce("origin_pt", "__first_pt"))
            .withColumn("destination_pt", F.coalesce("destination_pt", "__last_pt"))
            .withColumn(
                "geom",
                F.struct(F.col("origin_pt").alias("origin"), F.col("destination_pt").alias("dest")),
            )
            .drop("__tid", "__tid2", "__first_pt", "__last_pt")
        )

    # trips feeds the final projection plus the tpls/sp link-backs —
    # persist the finished (small) trips table once.
    trips = trips.persist()

    trips_out_cols = ["id", "user_id", "started_at", "finished_at", "origin_staypoint_id", "destination_staypoint_id"]
    if add_geometry:
        trips_out_cols.append("geom")
    trips_out = trips.select(*trips_out_cols)

    # link back: tpls.trip_id (:181), sp.trip_id + prev/next (:183-191)
    tpl_links = trips.select(F.col("id").alias("trip_id"), F.explode("tpls").alias("id"))
    tpls_out = tpls_base.join(tpl_links, on="id", how="left")

    sp_links = trips.select(F.col("id").alias("trip_id"), F.explode("sps").alias("id"))
    act_links = inter.filter(F.col("type") == "staypoint").select(
        F.col("sp_tpls_id").alias("id"), "prev_trip_id", "next_trip_id"
    )
    sp_out = sp_base.join(sp_links, on="id", how="left").join(act_links, on="id", how="left")

    return sp_out, tpls_out, trips_out
