#!/usr/bin/env python
"""Capture ``.explain("formatted")`` for declared queries.

Usage:
    python tools/capture_plans.py <out_dir> [suffix] [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` (suffix defaults to "before")
for every ``queries()`` entry (or the subset named on the CLI). Explain
only plans — nothing executes — so this is cheap and safe to run next
to other jobs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entrymod
    from trackintel_spark import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    master = f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8"))
    spark = get_spark(app_name="capture_plans", master=master, shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")

    n_ok = n_err = 0
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(path, "w") as fh:
                fh.write(plan)
            n_ok += 1
        except Exception as exc:  # noqa: BLE001 - record and continue
            with open(path, "w") as fh:
                fh.write(f"ERROR building plan: {exc}\n")
            n_err += 1
            print(f"ERR {name}: {exc}", file=sys.stderr)
    print(f"captured {n_ok} plans, {n_err} errors -> {out_dir}/*_{suffix}.txt")
    return 1 if n_err else 0


if __name__ == "__main__":
    raise SystemExit(main())
