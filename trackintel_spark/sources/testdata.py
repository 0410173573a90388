"""Loaders for the driver's synthetic parquet tables.

The driver parquet stores nanosecond timestamps (TIMESTAMP(NANOS)),
which Spark's parquet reader cannot represent; with
``spark.sql.legacy.parquet.nanosAsLong=true`` they surface as int64
nanos-since-epoch. We convert to microsecond TimestampType with
INTEGER division (ns > 2^53, double math would lose precision) —
matching DuckDB's ns->us truncation so oracle hashes line up.
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
    SparkSession without the nanos conf — the read would then die with
    PARQUET_TYPE_ILLEGAL. Both confs are runtime-settable.
    UTC matters because oracle hashes compare *rendered* timestamps.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # conf locked down: fall through and let the read speak


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _TS_COLS.get(name, ()):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df
