"""Driver-hash type conformance for every query/oracle pair.

The driver compares Spark results against DuckDB oracles after normalizing
both through a dataframe. DuckDB types outside a small safe set (notably
HUGEINT, the silent widening of any uncast integer ``SUM``) survive
``fetchall()`` as lossless Python ints but degrade to float64/decimal128
through pandas/Arrow — so a query can be green on every local fetchall-based
check and red on the driver, deterministically (the rounds-5..7
``line_dedup``/``substring_dedup`` failure class). These tests close that
class: every oracle must DESCRIBE to driver-safe types, every Spark query
must carry no DecimalType, and the detector itself must catch an injected
uncast SUM.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.check_correctness import oracle_type_violations

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"driver testdata absent: {SF_DIR}"
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield c
    c.close()


def test_detector_flags_injected_uncast_sum(con):
    # an uncast integer SUM is HUGEINT in DuckDB — the exact bug class
    bad = oracle_type_violations(con, "SELECT SUM(x) AS s FROM (SELECT 1 AS x)")
    assert bad == [("s", "HUGEINT")]
    # the prescribed fix passes
    assert oracle_type_violations(con, "SELECT SUM(x)::BIGINT AS s FROM (SELECT 1 AS x)") == []
    # DECIMAL is also unsafe (decimal128 through Arrow vs Spark double/long)
    assert oracle_type_violations(con, "SELECT 1.5::DECIMAL(10,2) AS d") == [("d", "DECIMAL(10,2)")]


def test_every_oracle_describes_to_driver_safe_types(con):
    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        bad = oracle_type_violations(con, sql)
        if bad:
            offenders[name] = bad
    assert not offenders, f"driver-unsafe oracle column types: {offenders}"


@pytest.mark.slow
def test_every_spark_query_schema_is_driver_safe(spark):
    """No DecimalType (hashes as Decimal vs the oracle's float/int) and no
    nested/binary output columns — the driver hashes flat scalar rows."""
    from pyspark.sql import types as T

    unsafe = (T.DecimalType,)
    offenders = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_DIR)
        bad = [
            (f.name, f.dataType.simpleString())
            for f in df.schema.fields
            if isinstance(f.dataType, unsafe)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"driver-unsafe Spark output types: {offenders}"
