#!/usr/bin/env python
"""Physical-plan audit over the headline queries.

Prints, per query: scan pushdown + schema pruning, join strategies,
exchange count, and any cartesian products — the quick way to verify
the plans stay 100 TB-shaped after a change. Complements
tests/test_plan_quality.py (hard assertions on a subset).

    python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

MARKERS = {
    "BroadcastHashJoin": "broadcast-hash join",
    "SortMergeJoin": "sort-merge join",
    "ShuffledHashJoin": "shuffled-hash join",
    "BroadcastNestedLoopJoin": "broadcast nested-loop join",
    "CartesianProduct": "CARTESIAN PRODUCT",
    "Exchange hashpartitioning": "hash exchange",
    "Exchange rangepartitioning": "range exchange",
    "Exchange SinglePartition": "single-partition exchange",
    "ArrowEvalPython": "arrow python eval",
    "FlatMapGroupsInPandas": "applyInPandas kernel",
    "MapInPandas": "mapInPandas kernel",
}

AUDIT = [
    "pfs_ingest", "generate_staypoints", "generate_triplegs", "generate_trips",
    "generate_locations", "generate_tours", "dbscan_distributed", "merge_staypoints",
    "tpch_q1", "tpch_q3ish", "minhash_lsh_pairs", "embedding_topk", "lsh_topk",
    "spatial_filter", "trajectory_distances", "asof_join", "top_tokens",
    "line_dedup", "substring_dedup", "decontaminate", "chunk_dedup",
    "dedup_incremental", "gopher_quality", "trajectory_join", "trajectory_match",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or AUDIT

    import __spark_entry__ as entrymod
    from trackintel_spark import get_spark

    spark = get_spark(app_name="plan_audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    for name in only:
        fn = queries.get(name)
        if fn is None:
            print(f"## {name}: not registered")
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"## {name}: PLAN ERROR {e}")
            continue
        counts = {label: plan.count(marker) for marker, label in MARKERS.items()}
        counts = {k: v for k, v in counts.items() if v}
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        pushed_n = sum(1 for p in pushed if p.strip())
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        cols = sorted({c.split(":")[0] for s in schemas for c in s.split(",") if c})
        print(f"## {name}")
        print(f"   joins/exchanges: {counts or 'none'}")
        print(f"   scans: {len(schemas)}, pushed-filter scans: {pushed_n}, read columns: {cols[:10]}")
        if counts.get("CARTESIAN PRODUCT"):
            print("   !! cartesian product present — verify it is an intended bounded pair-enumeration")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
