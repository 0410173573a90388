"""Loaders for the driver's synthetic parquet tables.

The driver's parquet has shipped two timestamp encodings across
rounds, and the ambient SparkSession may be a bare one built by the
correctness driver (no session confs). ``load_table`` must produce
the SAME schema (`timestamp`, i.e. TIMESTAMP_LTZ, rendered in UTC)
regardless of either:

* nanosecond timestamps (``TIMESTAMP(NANOS)``) — unreadable by Spark
  unless ``spark.sql.legacy.parquet.nanosAsLong=true``, which
  surfaces them as int64 nanos-since-epoch. We convert with INTEGER
  division (ns > 2^53; double math would lose precision), matching
  DuckDB's ns->us truncation so oracle hashes line up.
* microsecond timestamps without timezone — Spark 4 reads these as
  ``TIMESTAMP_NTZ`` by default (``spark.sql.parquet.inferTimestampNTZ
  .enabled=true``), a type that refuses numeric casts our operators
  use. We disable NTZ inference (plain `timestamp` instead) and, in
  case the conf is locked down, also cast any NTZ survivor — under a
  UTC session both render identically, so oracle hashes agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TS_COLS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def _ensure_session_confs(spark: SparkSession) -> None:
    """Make the ambient session able to read the driver parquet.

    Callers (the correctness driver in particular) may hand us a bare
    SparkSession without these confs. All three are runtime-settable.
    UTC matters because oracle hashes compare *rendered* timestamps.
    """
    for key, val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(key, val)
        except Exception:
            pass  # conf locked down: fall through to the dtype fixups


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for c in _TS_COLS.get(name, ()):
        if c not in dtypes:
            continue
        if dtypes[c] == "bigint":  # nanos-era files under nanosAsLong
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtypes[c] == "timestamp_ntz":  # NTZ inference locked on
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df
