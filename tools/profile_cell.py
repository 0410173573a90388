#!/usr/bin/env python
"""Profile one headline bench cell: split DataFrame BUILD time (py4j +
analysis, driver-side) from EXECUTE time (count()), and report the
Spark job count + per-job wall time for the warm run via the status
tracker. Usage: python tools/profile_cell.py <query> [reps]"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as em
    from trackintel_spark import get_spark

    spark = get_spark(app_name="profile_cell", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    # bench-equivalent warm-up
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as F
    _w = spark.range(32 * 10).withColumn("g", F.col("id") % 32)
    _w.groupBy("g").applyInPandas(lambda p: p, schema=_w.schema).count()
    from trackintel_spark.sources import load_table
    for t in ("events", "documents", "embeddings", "lineitem", "orders", "customer"):
        load_table(spark, sf_dir, t).count()

    if name == "mobility_pipeline":
        def fn():
            from trackintel_spark.analysis import create_activity_flag
            from trackintel_spark.operators import (
                generate_staypoints, generate_triplegs, generate_trips)
            pfs = em._pfs(spark, sf_dir)
            pfs_sp, sp = generate_staypoints(
                pfs, dist_threshold=200, time_threshold=5, gap_threshold=1440)
            _, tpls = generate_triplegs(pfs_sp, gap_threshold=1440)
            sp = create_activity_flag(sp, time_threshold=20)
            _, _, trips = generate_trips(sp, tpls, gap_threshold=1440)
            return trips
    else:
        fn = lambda: em.queries()[name](spark, sf_dir)  # noqa: E731

    st = spark.sparkContext.statusTracker()
    for i in range(reps):
        j0 = st.getJobIdsForGroup(None)
        t0 = time.time()
        df = fn()
        t1 = time.time()
        n = df.count()
        t2 = time.time()
        jobs_build = len(set(st.getJobIdsForGroup(None)) - set(j0))
        print(
            f"rep{i}: build={t1 - t0:.3f}s exec={t2 - t1:.3f}s total={t2 - t0:.3f}s "
            f"rows={n} jobs_this_rep={jobs_build}",
            flush=True,
        )
    # per-job breakdown of the LAST rep via REST
    try:
        import json
        import urllib.request
        ui = spark.sparkContext.uiWebUrl
        apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
        app_id = apps[0]["id"]
        jobs = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded")
        )
        jobs = sorted(jobs, key=lambda j: j["jobId"])[-40:]
        stages = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
        )
        sname = {s["stageId"]: s["name"][:80] for s in stages}
        from datetime import datetime
        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        prev_end = None
        for j in jobs:
            sub = datetime.strptime(j["submissionTime"], fmt)
            com = datetime.strptime(j["completionTime"], fmt)
            gap = f" gap={(sub - prev_end).total_seconds():.3f}s" if prev_end else ""
            prev_end = com
            names = "; ".join(sname.get(s, "?") for s in sorted(j["stageIds"]))
            print(
                f"job {j['jobId']}: {(com - sub).total_seconds():.3f}s "
                f"stages={len(j['stageIds'])} tasks={j['numTasks']}{gap} [{names[:150]}]",
                flush=True,
            )
    except Exception as e:  # pragma: no cover
        print(f"REST breakdown unavailable: {e}")


if __name__ == "__main__":
    main()
