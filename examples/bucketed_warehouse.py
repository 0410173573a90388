"""Bucketed-warehouse workflow: shuffle-free per-user pipelines.

Every per-user operator in the engine (the generate_* family, speeds,
metrics, tracking quality) shuffles on user_id. Persisting the entity
tables ONCE through ``write_bucketed_by_user`` makes Spark recognize
the stored bucketing and elide that exchange from every downstream
window / groupBy / co-located join — at cluster scale this removes the
dominant shuffle of the whole mobility chain (pinned in
tests/test_plan_quality.py::test_bucketed_table_elides_user_exchange).

This example runs the full chain TWICE over the driver's synthetic
events parquet — once from the raw frame, once from bucketed tables —
and prints, for each stage, whether the physical plan contains a
user_id hash exchange:

    python examples/bucketed_warehouse.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from trackintel_spark import get_spark
from trackintel_spark.analysis import radius_gyration, temporal_tracking_quality
from trackintel_spark.operators import generate_staypoints, generate_triplegs
from trackintel_spark.plans.partitioning import write_bucketed_by_user
from trackintel_spark.sources import load_table


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning(user_id")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    warehouse = tempfile.mkdtemp(prefix="ti_warehouse_")
    spark = get_spark(
        app_name="bucketed_warehouse",
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, sf_dir, "events")
    pfs = ev.select(
        F.col("event_id").alias("id"), "user_id", F.col("ts").alias("tracked_at"),
        F.struct(
            (8.5 + (F.col("value") % 3).cast("int") * 0.05).alias("lon"),
            (47.4 + (F.col("value") % 2).cast("int") * 0.05).alias("lat"),
        ).alias("geom"),
    )

    # ---- stage 1: ingest once, persist the warehouse bucketed by user
    for name in ("w_positionfixes",):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    write_bucketed_by_user(pfs, "w_positionfixes", num_buckets=16,
                           sort_cols=("tracked_at",))
    pfs_b = spark.table("w_positionfixes")

    pfs_sp, sp = generate_staypoints(pfs_b, dist_threshold=200, time_threshold=5)
    for name in ("w_staypoints", "w_pfs_sp"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    write_bucketed_by_user(sp, "w_staypoints", num_buckets=16,
                           sort_cols=("started_at",))
    write_bucketed_by_user(pfs_sp, "w_pfs_sp", num_buckets=16,
                           sort_cols=("tracked_at",))
    sp_b = spark.table("w_staypoints")

    # ---- stage 2: per-user operators read the bucketed tables
    w = Window.partitionBy("user_id").orderBy("tracked_at")
    stages = {
        "lag window over bucketed pfs": pfs_b.withColumn(
            "prev", F.lag("tracked_at").over(w)
        ),
        "groupBy count over bucketed pfs": pfs_b.groupBy("user_id").count(),
        "radius_gyration over bucketed staypoints": radius_gyration(sp_b),
        "tracking_quality over bucketed staypoints": temporal_tracking_quality(sp_b),
        "triplegs from bucketed pfs_sp": generate_triplegs(
            spark.table("w_pfs_sp")
        )[1],
    }
    raw_contrast = pfs.withColumn("prev", F.lag("tracked_at").over(w))

    print(f"user_id exchanges, raw lag window: {_exchanges(raw_contrast)}")
    clean = 0
    for name, df in stages.items():
        n = _exchanges(df)
        rows = df.count()
        clean += n == 0
        print(f"user_id exchanges, {name}: {n} ({rows} rows)")
    print(f"exchange-free bucketed stages: {clean}/{len(stages)}")

    # ---- stage 3: date-partition + bucket for incremental daily jobs
    # Bucketing removes the SHUFFLE; at 100 TB the other half is
    # removing the SCAN. partitionBy(event_date) composes with
    # bucketBy(user_id) in one saveAsTable: a nightly job filtering one
    # event_date prunes every other day's files at plan time
    # (PartitionFilters) and still runs its per-user windows with zero
    # user_id exchange inside the day it reads. An unpartitioned
    # warehouse re-reads the full history every night instead.
    from trackintel_spark.plans.partitioning import with_event_date

    spark.sql("DROP TABLE IF EXISTS w_pfs_daily")
    write_bucketed_by_user(
        with_event_date(pfs), "w_pfs_daily", num_buckets=16,
        sort_cols=("tracked_at",), partition_cols=("event_date",),
    )
    t = spark.table("w_pfs_daily")
    one_day = t.select(F.min("event_date")).first()[0]
    daily = t.filter(F.col("event_date") == F.lit(one_day)).withColumn(
        "prev", F.lag("tracked_at").over(w)
    )
    plan = daily._jdf.queryExecution().executedPlan().toString()
    pruned = "event_date" in plan.split("PartitionFilters:")[1].splitlines()[0]
    print(
        f"incremental day {one_day}: partition-pruned scan: {pruned}, "
        f"user_id exchanges: {_exchanges(daily)} ({daily.count()} rows read "
        f"of {t.count()} total)"
    )


if __name__ == "__main__":
    main()
