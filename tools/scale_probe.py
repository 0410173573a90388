#!/usr/bin/env python
"""Kernel-family scale probe: wall-clock at multiple synthetic sizes.

Generates inputs with ``spark.range`` (pure compute, no IO) and times

* the full mobility chain: generate_staypoints -> generate_triplegs ->
  generate_trips -> generate_tours;
* distributed dataset DBSCAN on a 2000-hotspot point cloud.

Usage::

    python tools/scale_probe.py [chain_rows ...] [--dbscan rows ...]

Defaults: chain at 1M and 10M positionfixes, DBSCAN at 1M and 4M
points. Results go to SCALE.md's measured-scaling rows.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F


def mobility_input(spark, n: int, pfs_per_user: int = 2000):
    """Dwelling-and-commuting users: 6 spots ~1.1 km apart. Each
    40-pfs block (30 s cadence) is a 17-minute dwell followed by 6
    travel pfs interpolating toward the next spot (~6 m/s), so every
    threshold family — staypoint, tripleg, trip, AND closed tour (the
    cycle returns to spot 0) — gets real work. Without the travel
    points consecutive dwells touch, each user degenerates to one
    tripleg/trip, and generate_tours has nothing to close."""
    ids = spark.range(n)
    u = (F.col("id") / pfs_per_user).cast("long")
    i = F.col("id") % pfs_per_user
    phase = (i / 40).cast("long") % 6
    nxt = (phase + 1) % 6
    k = i % 40
    frac = F.when(k < 34, F.lit(0.0)).otherwise((k - 33).cast("double") / 7.0)

    def spot_lon(p):
        return p * 0.01

    def spot_lat(p):
        return (p % 2) * 0.01

    lon = spot_lon(phase) + (spot_lon(nxt) - spot_lon(phase)) * frac
    lat = spot_lat(phase) + (spot_lat(nxt) - spot_lat(phase)) * frac
    return ids.select(
        F.col("id"),
        u.alias("user_id"),
        F.timestamp_seconds(F.lit(1700000000) + i * 30).alias("tracked_at"),
        F.struct(
            (8.0 + (u % 100) * 0.2 + lon + F.sin(F.col("id")) * 1e-5).alias("lon"),
            (47.0 + (u % 7) * 0.2 + lat + F.cos(F.col("id")) * 1e-5).alias("lat"),
        ).alias("geom"),
    )


def dbscan_input(spark, n: int, hotspots: int = 2000):
    """2000 hotspot blobs (~20 m jitter) on a 50-wide grid + 1% noise."""
    ids = spark.range(n)
    h = F.col("id") % hotspots
    noise = (F.col("id") % 100) == 0
    lon = (h % 50) * 0.01 + F.sin(F.col("id")) * 2e-4
    lat = (h / 50).cast("long") * 0.01 + F.cos(F.col("id")) * 2e-4
    return ids.select(
        "id",
        F.when(noise, (F.col("id") % 997) * 0.004 + 3.0).otherwise(8.0 + lon).alias("lon"),
        F.when(noise, (F.col("id") % 991) * 0.003 + 20.0).otherwise(40.0 + lat).alias("lat"),
    )


def run_chain(spark, n: int) -> dict:
    """pfs -> staypoints -> triplegs -> trips -> tours, MATERIALIZING
    each entity table between stages (localCheckpoint) — the pipeline
    pattern the repo documents (examples/bucketed_warehouse.py persists
    every entity; the reference materializes implicitly in pandas).
    Measured r7: the fully-lazy fused chain re-executes the shared
    staypoint kernel once per downstream entity branch (69.5 s at 10M
    vs 41 s staged), so lazy chaining UNDERSTATES the engine; staging
    is both the recommended usage and what a warehouse run does.
    Per-stage walls are reported so a kernel regression names its
    stage."""
    from trackintel_spark.operators import generate_staypoints, generate_triplegs
    from trackintel_spark.operators.tours import generate_tours
    from trackintel_spark.operators.trips import generate_trips

    pfs = mobility_input(spark, n).persist()
    pfs.count()
    t0 = time.time()
    pfs_sp, sp = generate_staypoints(
        pfs, dist_threshold=100, time_threshold=5, gap_threshold=120
    )
    pfs_sp, sp = pfs_sp.localCheckpoint(), sp.localCheckpoint()
    t1 = time.time()
    dur = F.col("finished_at").cast("double") - F.col("started_at").cast("double")
    sp = sp.withColumn("is_activity", dur >= 15 * 60)
    pfs_t, tpls = generate_triplegs(pfs_sp, sp)
    tpls = tpls.localCheckpoint()
    t2 = time.time()
    sp2, tpls2, trips = generate_trips(sp, tpls, gap_threshold=60)
    sp2, trips = sp2.localCheckpoint(), trips.localCheckpoint()
    t3 = time.time()
    # location = 100 m grid cell of the staypoint: users cycle through 6
    # spots, so every cycle closes tours (id%k never revisits -> 0 tours)
    loc = F.hash(
        F.round(F.col("geom.lon") * 1000).cast("long"),
        F.round(F.col("geom.lat") * 1000).cast("long"),
    ).cast("long")
    _, tours = generate_tours(trips, sp2.withColumn("location_id", loc))
    n_tours = tours.count()
    t4 = time.time()
    wall = t4 - t0
    out = {
        "rows": n, "wall_s": round(wall, 1), "rows_per_s": int(n / wall),
        "tours": n_tours,
        "staypoints_s": round(t1 - t0, 1), "triplegs_s": round(t2 - t1, 1),
        "trips_s": round(t3 - t2, 1), "tours_s": round(t4 - t3, 1),
    }
    pfs.unpersist()
    return out


def run_dbscan(spark, n: int) -> dict:
    from trackintel_spark.operators.dbscan_distributed import dbscan_distributed

    pts = dbscan_input(spark, n).persist()
    pts.count()
    t0 = time.time()
    out = dbscan_distributed(pts, epsilon_m=100, min_samples=5)
    n_clusters = out.filter(F.col("location_id").isNotNull()).select("location_id").distinct().count()
    wall = time.time() - t0
    res = {"rows": n, "wall_s": round(wall, 1), "rows_per_s": int(n / wall), "clusters": n_clusters}
    pts.unpersist()
    return res


def run_streaming_staypoints(spark, n: int, n_batches: int = 10) -> dict:
    """Stateful streaming throughput: ``staypoints_stream_exact`` over
    ``n`` mobility positionfixes delivered as ``n_batches`` time-ordered
    parquet micro-batches (maxFilesPerTrigger=1, availableNow) — the
    nightly-catchup / replay regime. Every user advances together in
    each micro-batch (all devices upload continuously), so candidate
    windows genuinely span trigger boundaries and the state store holds
    one open window per user the whole run.

    Reports input rows/s plus the state-store footprint from the last
    StreamingQueryProgress (numRowsTotal / memoryUsedBytes) — the
    numbers that bound executor memory at cluster scale.
    """
    from trackintel_spark.streaming import staypoints_stream_exact

    return _run_streaming_mobility(
        spark, n, n_batches, "sp_stream_probe",
        lambda st: staypoints_stream_exact(
            st, dist_threshold=100, time_threshold=5, gap_threshold=120
        ),
        out_key="staypoints",
    )


def run_streaming_trips(spark, n: int, n_batches: int = 10) -> dict:
    """Sibling probe for the END-TO-END stateful operator: raw
    positionfixes -> trips in ONE applyInPandasWithState pass
    (streaming/trips_state.py carries candidate window + travel buffer
    + open-trip units per user). The heaviest per-row streaming state
    in the library — its rows/s and state size bound the online
    mobility pipeline."""
    from trackintel_spark.streaming import trips_stream_exact

    return _run_streaming_mobility(
        spark, n, n_batches, "trips_stream_probe",
        lambda st: trips_stream_exact(
            st, dist_threshold=100, time_threshold=5, gap_threshold=120,
            activity_threshold=15,
        ),
        out_key="trips",
    )


def run_streaming_tours(spark, n: int, n_batches: int = 10) -> dict:
    """Stateful streaming throughput for ``tours_stream_exact`` over
    ``n`` synthetic trips (locations mode) in ``n_batches`` time-ordered
    micro-batches — the last stateful stage without a scale measurement
    (r11 verdict #4). Three of four users run 5-location loops (a tour
    closes every 5 trips, candidate stack ~5 rows); every FOURTH user
    wanders to ever-new locations and never closes, so their stack is
    bounded only by the max_time pruning window (1440 min / 20-min trip
    cadence = 72 candidates) — the least-bounded-by-construction regime
    the verdict flagged. state_rows_max / state_mb_max report what that
    pruning actually holds."""
    from trackintel_spark.streaming import tours_stream_exact

    per_user = 2000
    flat = tours_trip_input(spark, n, trips_per_user=per_user)
    schema = (
        "id long, user_id long, started_at timestamp, finished_at timestamp, "
        "origin_staypoint_id long, destination_staypoint_id long, "
        "origin_loc long, dest_loc long"
    )
    return _run_streaming_probe(
        spark, flat, per_user, n_batches, schema, "tours_stream_probe",
        lambda st: tours_stream_exact(st, max_time=1440),
        out_key="tours", n=n,
    )


def tours_trip_input(spark, n: int, trips_per_user: int = 2000):
    """Synthetic per-user trip chains in locations mode, one trip every
    20 minutes (10-min travel + 10-min activity gap). Loop users run
    6-trip cycles: a gap-free 5-location loop (ONE tour closes at trip
    5) then a discontinuous jump trip that breaks the chain — a
    realistic ~17% tours-per-trip ratio instead of the
    every-trip-closes pathology a pure cycle produces. Wander users
    visit location ``100 + i`` forever (chains never close), so their
    candidate stack is bounded only by max_time pruning."""
    ids = spark.range(n)
    u = (F.col("id") / trips_per_user).cast("long")
    i = F.col("id") % trips_per_user
    wander = u % 4 == 3
    k = i % 6
    cyc = (i / 6).cast("long")
    loop_o = F.when(k < 5, k).otherwise(50 + cyc % 7)
    loop_d = F.when(k < 4, k + 1).when(k == 4, F.lit(0)).otherwise(60 + cyc % 9)
    o_loc = F.when(wander, 100 + i).otherwise(loop_o)
    d_loc = F.when(wander, 101 + i).otherwise(loop_d)
    start = F.lit(1700000000) + (u % 997) + i * 1200
    return ids.select(
        F.col("id"),
        u.alias("user_id"),
        F.timestamp_seconds(start).alias("started_at"),
        F.timestamp_seconds(start + 600).alias("finished_at"),
        (u * 100000 + o_loc).alias("origin_staypoint_id"),
        (u * 100000 + d_loc).alias("destination_staypoint_id"),
        o_loc.alias("origin_loc"),
        d_loc.alias("dest_loc"),
    )


def _run_streaming_mobility(spark, n, n_batches, qname, op, out_key):
    per_user = 2000
    flat = mobility_input(spark, n, pfs_per_user=per_user).select(
        "id", "user_id", "tracked_at",
        F.col("geom.lon").alias("lon"), F.col("geom.lat").alias("lat"),
    )
    schema = "id long, user_id long, tracked_at timestamp, lon double, lat double"
    return _run_streaming_probe(
        spark, flat, per_user, n_batches, schema, qname, op, out_key, n
    )


def _run_streaming_probe(spark, flat, per_user, n_batches, schema, qname, op, out_key, n):
    import os
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="sp_stream_probe_")
    src, ckpt = os.path.join(base, "src"), os.path.join(base, "ckpt")
    os.makedirs(src)
    step = (per_user + n_batches - 1) // n_batches
    pos = F.col("id") % per_user
    for k in range(n_batches):
        d = os.path.join(src, f"b{k:03d}")
        # one file per chunk: maxFilesPerTrigger=1 should see exactly
        # n_batches micro-batches, not one per shuffle partition
        flat.filter((pos >= k * step) & (pos < (k + 1) * step)).coalesce(1).write.parquet(d)
        now = time.time() + k  # file-source order follows modification time
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (now, now))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = op(stream)
    # State-partition right-sizing (r13, guide §2.2 applied to state
    # stores): the stateful stage's partition count is fixed at query
    # start from spark.sql.shuffle.partitions. At the session default
    # (CPU-count-sized) each state partition here holds ~KBs of state
    # and a few thousand rows per trigger, but pays a FIXED per-commit
    # cost (delta file create + fsync) every micro-batch — measured on
    # this host, 32 concurrent per-partition commits convoy on the
    # ext4 journal (state commit sum 500 s/run at 32 partitions vs
    # 3.5 s at 8), while TOO FEW partitions serialize the per-group
    # applyInPandasWithState protocol cost (~13 ms/group/trigger,
    # engine-fixed — measured identical with a no-op kernel). A 3x3
    # interleaved calm A/B put the optimum at ~6.25k rows/task for all
    # three probes (sp 9.5 / trips 11.7 / tours 12.3 s at 16 parts vs
    # 12.1-12.3 at 8 and 15.6+ at 32). Derived from per-trigger row
    # volume, clamped to the session default so a cluster-sized config
    # still rules. Override: SPARK_GRAFT_STREAM_SHUFFLE.
    sess_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    rows_per_trigger = max(1, n // n_batches)
    # session default is the hard ceiling (a smaller cluster/test config
    # always rules); the floor of 4 only applies below it
    derived = min(sess_parts, max(4, -(-rows_per_trigger // 6_250)))
    stream_parts = int(os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "0") or 0) or derived
    spark.conf.set("spark.sql.shuffle.partitions", str(stream_parts))
    try:
        t0 = time.time()
        q = (
            out.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.time() - t0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(sess_parts))
    n_out = spark.sql(f"SELECT count(*) FROM {qname}").first()[0]
    state_rows = state_mb = batches = 0
    for p in q.recentProgress:
        batches += 1
        for so in p.get("stateOperators", []):
            state_rows = max(state_rows, so.get("numRowsTotal", 0))
            state_mb = max(state_mb, so.get("memoryUsedBytes", 0) / 2**20)
    spark.catalog.dropTempView(qname)
    shutil.rmtree(base, ignore_errors=True)
    return {
        "rows": n,
        "wall_s": round(wall, 1),
        "rows_per_s": int(n / wall),
        out_key: n_out,
        "micro_batches": batches,
        "state_rows_max": state_rows,
        "state_mb_max": round(state_mb, 1),
    }


def main():
    from trackintel_spark import get_spark

    args = sys.argv[1:]
    if "--dbscan" in args:
        k = args.index("--dbscan")
        chain_ns = [int(x) for x in args[:k]] or [1_000_000, 10_000_000]
        db_ns = [int(x) for x in args[k + 1 :]] or [1_000_000, 4_000_000]
    else:
        chain_ns = [int(x) for x in args] or [1_000_000, 10_000_000]
        db_ns = [1_000_000, 4_000_000]

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for n in chain_ns:
        print("chain", run_chain(spark, n), flush=True)
    for n in db_ns:
        print("dbscan", run_dbscan(spark, n), flush=True)


def run_trajectory_join(spark, n: int, leg_len: int = 2, n_sites: int = 20000) -> dict:
    """Similarity self-join at probe scale: ``n`` trajectories of
    ``leg_len``..``leg_len``+5 vertices around ``n_sites`` anchor sites
    (so qualifying pairs exist but stay bounded), tau=150 m discrete
    Frechet. ``leg_len`` ~2 exercises the candidate/LB machinery;
    ``leg_len`` ~50 (real GPS legs) makes the O(len²) DP refine the
    dominant stage — the regime the anti-diagonal-vectorized kernels
    exist for."""
    import time

    from pyspark.sql import functions as F

    from trackintel_spark.geogr import trajectory_similarity_join

    base = spark.range(n).select(F.col("id"), (F.col("id") % n_sites).alias("site"))
    traj = base.select(
        "id",
        F.transform(
            F.sequence(F.lit(0), (F.col("id") % 5) + F.lit(leg_len - 1)),
            lambda k: F.struct(
                (8.0 + (F.col("site") % 200) * 0.01 + k.cast("double") * 1e-4 / leg_len
                 + (F.xxhash64("id", k) % 1000).cast("double") * 1e-7).alias("lon"),
                (46.0 + F.floor(F.col("site") / 200).cast("double") * 0.01
                 + (F.xxhash64(k, "id") % 1000).cast("double") * 1e-7).alias("lat"),
            ),
        ).alias("geom"),
    ).persist()
    traj.count()
    t0 = time.time()
    pairs = trajectory_similarity_join(traj, 150.0, metric="frechet").count()
    w = time.time() - t0
    traj.unpersist()
    return {"op": "trajectory_join", "rows": n, "wall_s": round(w, 1),
            "pairs": int(pairs), "rows_per_s": int(n / w)}



if __name__ == "__main__":
    main()
