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


def _unit_to_micros_expr(col: str, unit: str):
    """Micros expression for an int64 epoch column of a KNOWN unit.
    ns uses INTEGER division (ns > 2^53: double math loses precision),
    truncating like DuckDB's ns->us so oracle hashes line up."""
    if unit == "ns":
        return F.expr(f"`{col}` div 1000")
    if unit == "us":
        return F.col(col)
    if unit == "ms":
        return F.col(col) * F.lit(1000)
    return F.col(col) * F.lit(1_000_000)  # seconds


def _parquet_ts_unit(path: str, col: str) -> str | None:
    """Read the column's timestamp unit from the parquet footer (one
    local metadata read, no Spark job). The int64 surface is an
    artifact of ``nanosAsLong`` — the footer still records the true
    logical type, so historic data (pre-1973 epochs whose magnitude
    overlaps a coarser unit) can't be mis-classified. Returns None for
    non-local/unreadable paths or non-timestamp columns."""
    try:
        import glob
        import os

        import pyarrow.parquet as pq

        p = path
        if os.path.isdir(p):
            parts = sorted(glob.glob(os.path.join(p, "*.parquet"))) or sorted(
                glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True)
            )
            if not parts:
                return None
            p = parts[0]
        sch = pq.read_schema(p)
        if col not in sch.names:
            return None
        t = sch.field(col).type
        return getattr(t, "unit", None)
    except Exception:
        return None


def _epoch_to_micros_expr(col: str, sample: int):
    """Magnitude-based fallback when no parquet footer is reachable
    (remote filesystem). Only valid for the modern era: a 2001-2200
    timestamp is ~1e9 s, ~1e12 ms, ~1e15 us, ~1e18 ns — three orders
    apart each, so one sampled value suffices. Pre-1973 epochs are
    ambiguous under this rule; those need the footer path."""
    v = abs(sample)
    if v >= 10**17:
        return _unit_to_micros_expr(col, "ns")
    if v >= 10**14:
        return _unit_to_micros_expr(col, "us")
    if v >= 10**11:
        return _unit_to_micros_expr(col, "ms")
    return _unit_to_micros_expr(col, "s")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for c in _TS_COLS.get(name, ()):
        if c not in dtypes:
            continue
        if dtypes[c] == "bigint":  # integer epoch (nanos-era under nanosAsLong)
            unit = _parquet_ts_unit(f"{sf_dir}/{name}.parquet", c)
            if unit in ("s", "ms", "us", "ns"):
                micros = _unit_to_micros_expr(c, unit)
            else:  # no footer reachable: modern-era magnitude sniff
                probe = df.select(c).filter(F.col(c).isNotNull()).limit(1).collect()
                micros = (
                    _epoch_to_micros_expr(c, int(probe[0][0]))
                    if probe
                    else F.expr(f"`{c}` div 1000")
                )
            df = df.withColumn(c, F.timestamp_micros(micros))
        elif dtypes[c] == "timestamp_ntz":  # NTZ inference locked on
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df
