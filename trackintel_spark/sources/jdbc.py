"""JDBC readers/writers for every entity (the PostGIS analog).

Reference: io/postgis.py:47-733 (``read_*_postgis`` / ``write_*_postgis``
via GeoAlchemy). There is no PostGIS server in this environment, so the
contract is expressed over plain JDBC with geometries as WKT text —
against PostGIS use ``ST_AsText(geom) AS geom`` in the read query and a
``ST_GeomFromText`` view / generated column on the write table, exactly
the WKB<->WKT hop the reference performs inside GeoAlchemy.

* reads are single ``spark.read.jdbc`` scans; pass ``partition_column``
  + bounds to split the table into parallel range queries (the knob
  that matters at scale — one unpartitioned JDBC read is one executor
  task);
* writes serialize geometry columns to WKT and ``df.write.jdbc`` with
  executor-parallel inserts;
* round-trip is tested against embedded Apache Derby (shipped with
  Spark) in tests/test_jdbc.py — engine-agnostic plans, nothing Derby-
  specific in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trackintel_spark.model.schemas import validate
from trackintel_spark.sources import wkt

# entity -> {column: kind}; kind decides the WKT codec
_GEOM_COLS: dict[str, dict[str, str]] = {
    "positionfixes": {"geom": "point"},
    "staypoints": {"geom": "point"},
    "triplegs": {"geom": "linestring"},
    "trips": {"geom": "multipoint_od"},
    "locations": {"center": "point", "extent": "polygon"},
    "tours": {},
}

_TS_COLS: dict[str, tuple[str, ...]] = {
    "positionfixes": ("tracked_at",),
    "staypoints": ("started_at", "finished_at"),
    "triplegs": ("started_at", "finished_at"),
    "trips": ("started_at", "finished_at"),
    "locations": (),
    "tours": ("started_at", "finished_at"),
}

_FORMAT = {
    "point": wkt.format_wkt_point,
    "linestring": wkt.format_wkt_linestring,
    "polygon": wkt.format_wkt_polygon,
    "multipoint_od": wkt.format_wkt_multipoint_od,
}
_PARSE = {
    "point": wkt.parse_wkt_point,
    "linestring": wkt.parse_wkt_linestring,
    "polygon": wkt.parse_wkt_polygon,
    "multipoint_od": wkt.parse_wkt_multipoint_od,
}


def _check_entity(entity: str) -> None:
    if entity not in _GEOM_COLS:
        raise ValueError(f"entity must be one of {sorted(_GEOM_COLS)}, got {entity!r}")


def write_entity_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    entity: str,
    mode: str = "error",
    properties: dict[str, str] | None = None,
) -> None:
    """Write an entity table over JDBC (reference write_*_postgis,
    io/postgis.py:416-733): geometries go out as WKT text, the tours
    member list as a JSON array string."""
    _check_entity(entity)
    out = df
    for col, kind in _GEOM_COLS[entity].items():
        if col in out.columns:
            out = out.withColumn(col, _FORMAT[kind](F.col(col)))
    if entity == "tours" and "trips" in out.columns:
        out = out.withColumn("trips", F.to_json(F.col("trips")))
    writer = out.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def read_entity_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    entity: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Read an entity table over JDBC (reference read_*_postgis,
    io/postgis.py:47-408): WKT text columns are parsed back into the
    engine's geometry structs, timestamps normalized, schema validated.

    ``table`` may be a table name or a parenthesized subquery — filters
    written into the subquery run inside the database. With
    ``partition_column`` (+ bounds) the scan splits into
    ``num_partitions`` parallel range queries.
    """
    _check_entity(entity)
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    df = reader.load()
    for col, kind in _GEOM_COLS[entity].items():
        if col in df.columns:
            df = df.withColumn(col, _PARSE[kind](F.col(col).cast("string")))
    for c in _TS_COLS[entity]:
        if c in df.columns and dict(df.dtypes)[c] in ("string", "timestamp_ntz"):
            df = df.withColumn(c, F.to_timestamp(c))
    if entity == "tours" and "trips" in df.columns and dict(df.dtypes)["trips"] == "string":
        df = df.withColumn("trips", F.from_json(F.col("trips"), "array<bigint>"))
    return validate(df, entity)
