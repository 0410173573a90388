#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and (when present) its
``oracle_sql()`` on DuckDB against the same parquet tables, then
compares row count, sorted column names, and an order-insensitive
value hash. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]

Set ``SPARK_GRAFT_REPEAT=n`` to run each Spark query n times and
compare EVERY run — a single pass can miss nondeterminism (the
round-8 bm25 rank flake only surfaced on repeated sweeps: two
mathematically-tied scores summed in different orders across runs).
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from datetime import date, datetime

import duckdb

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def value_hash(rows: list[dict], cols: list[str]) -> str:
    lines = sorted("|".join(_norm(r[c]) for c in cols) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


# DuckDB types that survive a pandas/Arrow round-trip on the driver with the
# same Python value that ``fetchall()`` yields. Anything outside this set —
# HUGEINT (an uncast integer SUM widens to int128 → float64/decimal128 through
# a dataframe), DECIMAL, INTERVAL, nested types — can hash differently on the
# driver even when fetchall() compares equal locally (the rounds-5..7 red-row
# class).
DRIVER_SAFE_TYPES = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT",
    "DOUBLE", "FLOAT", "BOOLEAN", "VARCHAR", "DATE",
}


def oracle_type_violations(con, sql: str) -> list[tuple[str, str]]:
    """Columns of ``DESCRIBE sql`` whose DuckDB type is not driver-hash-safe.

    Run against every ``oracle_sql()`` entry before trusting a local
    fetchall()-based green: a column listed here may still hash red on any
    harness that normalizes DuckDB output through pandas or Arrow.
    """
    out = []
    for col, typ, *_ in con.execute(f"DESCRIBE {sql}").fetchall():
        base = typ.split("(")[0].strip()
        if base in DRIVER_SAFE_TYPES or base.startswith("TIMESTAMP"):
            continue
        out.append((col, typ))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from trackintel_spark import get_spark

    # defaults favor fast local iteration; export SPARK_GRAFT_CPUS /
    # SPARK_GRAFT_SHUFFLE to reproduce the driver's regime (local[32]/200)
    import os
    master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]" if "SPARK_GRAFT_CPUS" in os.environ else "local[8]"
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8"))
    spark = get_spark(app_name="check_correctness", master=master, shuffle_partitions=shuffle)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = []
    fail = 0
    repeat = max(1, int(os.environ.get("SPARK_GRAFT_REPEAT", "1")))
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            cols = sorted(sdf.columns)
            srows = [r.asDict(recursive=True) for r in sdf.collect()]
            shash = value_hash(srows, cols)
            for rerun in range(1, repeat):
                rrows = [r.asDict(recursive=True) for r in fn(spark, sf_dir).collect()]
                if value_hash(rrows, cols) != shash:
                    raise AssertionError(
                        f"nondeterministic Spark result: run {rerun + 1} hashed differently"
                    )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            results.append((name, "rows-only"))
            continue
        try:
            unsafe = oracle_type_violations(con, oracles[name])
            if unsafe:
                fail += 1
                print(f"FAIL  {name}: driver-unsafe oracle types {unsafe}")
                continue
            rel = con.execute(oracles[name])
            ocols = [d[0] for d in rel.description]
            orows = [dict(zip(ocols, row)) for row in rel.fetchall()]
            ohash = value_hash(orows, sorted(ocols))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            fail += 1
            continue
        ok_cols = sorted(ocols) == cols
        ok_count = len(orows) == len(srows)
        ok_hash = ohash == shash
        if ok_cols and ok_count and ok_hash:
            print(f"OK    {name}: {len(srows)} rows match [{time.time()-t0:.1f}s]")
        else:
            fail += 1
            print(
                f"FAIL  {name}: cols={ok_cols} ({cols} vs {sorted(ocols)}) "
                f"count={ok_count} ({len(srows)} vs {len(orows)}) hash={ok_hash}"
            )
            if ok_cols and not ok_hash:
                s_set = {"|".join(_norm(r[c]) for c in cols) for r in srows}
                o_set = {"|".join(_norm(r[c]) for c in cols) for r in orows}
                for line in sorted(s_set - o_set)[:3]:
                    print(f"        spark-only: {line}")
                for line in sorted(o_set - s_set)[:3]:
                    print(f"        duck-only:  {line}")
    print(f"\n{fail} failures")
    return 1 if fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
