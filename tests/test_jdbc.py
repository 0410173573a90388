"""JDBC entity round-trips against embedded Apache Derby.

Derby ships with Spark (used by the Hive metastore), so the write/read
contract of sources.jdbc — the engine's PostGIS analog (reference
io/postgis.py) — is exercised against a real database: WKT geometry
serialization both ways, timestamp fidelity, and the tours list column.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trackintel_spark.sources import read_entity_jdbc, write_entity_jdbc

DERBY = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    return f"jdbc:derby:{tmp_path_factory.mktemp('derby')}/db;create=true"


def test_staypoints_jdbc_roundtrip(spark, derby_url):
    sp = spark.createDataFrame(
        [
            (0, 1, "2024-01-01 08:00:00", "2024-01-01 09:00:00", 8.5, 47.4),
            (1, 1, "2024-01-01 10:00:00", "2024-01-01 11:30:00", 8.55, 47.45),
            (2, 2, "2024-01-02 07:15:00", "2024-01-02 07:45:00", 9.0, 46.9),
        ],
        "id long, user_id long, started_at string, finished_at string, lon double, lat double",
    ).select(
        "id", "user_id",
        F.to_timestamp("started_at").alias("started_at"),
        F.to_timestamp("finished_at").alias("finished_at"),
        F.struct("lon", "lat").alias("geom"),
    )
    write_entity_jdbc(sp, derby_url, "sp_rt", "staypoints", mode="overwrite", properties=DERBY)
    back = read_entity_jdbc(spark, derby_url, "sp_rt", "staypoints", properties=DERBY)
    a = sorted((r.asDict(recursive=True) for r in sp.collect()), key=lambda d: d["id"])
    b = sorted((r.asDict(recursive=True) for r in back.collect()), key=lambda d: d["id"])
    assert a == b


def test_triplegs_jdbc_roundtrip_and_subquery_pushdown(spark, derby_url):
    tpls = spark.createDataFrame(
        [(0, 1, [(8.5, 47.4), (8.6, 47.5)]), (1, 2, [(9.0, 46.9), (9.1, 46.95), (9.2, 47.0)])],
        "id long, user_id long, geom array<struct<lon double, lat double>>",
    ).select(
        "id", "user_id",
        F.lit("2024-01-01 08:00:00").cast("timestamp").alias("started_at"),
        F.lit("2024-01-01 09:00:00").cast("timestamp").alias("finished_at"),
        "geom",
    )
    write_entity_jdbc(tpls, derby_url, "tpls_rt", "triplegs", mode="overwrite", properties=DERBY)
    back = read_entity_jdbc(spark, derby_url, "tpls_rt", "triplegs", properties=DERBY)
    assert back.count() == 2
    g = {r.id: [(p.lon, p.lat) for p in r.geom] for r in back.collect()}
    assert g[1] == [(9.0, 46.9), (9.1, 46.95), (9.2, 47.0)]

    # filters written into the dbtable subquery execute inside the DB
    one = read_entity_jdbc(
        spark, derby_url, '(SELECT * FROM tpls_rt WHERE "user_id" = 2) t', "triplegs", properties=DERBY
    )
    assert [r.id for r in one.collect()] == [1]


def test_locations_and_tours_jdbc_roundtrip(spark, derby_url):
    locs = spark.createDataFrame(
        [(0, 1, 8.5, 47.4), (1, 2, 9.0, 46.9)], "id long, user_id long, lon double, lat double"
    ).select("id", "user_id", F.struct("lon", "lat").alias("center"))
    write_entity_jdbc(locs, derby_url, "locs_rt", "locations", mode="overwrite", properties=DERBY)
    back = read_entity_jdbc(spark, derby_url, "locs_rt", "locations", properties=DERBY)
    assert {(r.id, r.center.lon) for r in back.collect()} == {(0, 8.5), (1, 9.0)}

    tours = spark.createDataFrame([(0, 1, [3, 4, 5])], "id long, user_id long, trips array<bigint>").select(
        "id", "user_id",
        F.lit("2024-01-01 08:00:00").cast("timestamp").alias("started_at"),
        F.lit("2024-01-01 12:00:00").cast("timestamp").alias("finished_at"),
        "trips",
    )
    write_entity_jdbc(tours, derby_url, "tours_rt", "tours", mode="overwrite", properties=DERBY)
    back = read_entity_jdbc(spark, derby_url, "tours_rt", "tours", properties=DERBY)
    assert [r.trips for r in back.collect()] == [[3, 4, 5]]


def test_partitioned_jdbc_read(spark, derby_url):
    pfs = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("user_id"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("tracked_at"),
        F.struct((F.lit(8.0) + F.col("id") / 100.0).alias("lon"), F.lit(47.0).alias("lat")).alias("geom"),
    )
    write_entity_jdbc(pfs, derby_url, "pfs_rt", "positionfixes", mode="overwrite", properties=DERBY)
    back = read_entity_jdbc(
        spark, derby_url, "pfs_rt", "positionfixes", properties=DERBY,
        partition_column="id", lower_bound=0, upper_bound=100, num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100


def test_per_entity_postgis_names_roundtrip(spark, derby_url):
    """The reference's per-entity read/write_*_postgis names must bind
    to the same JDBC+WKT machinery."""
    from trackintel_spark.sources.postgis import (
        read_positionfixes_postgis,
        write_positionfixes_postgis,
    )

    pfs = spark.createDataFrame(
        [(0, 1, "2024-01-01 08:00:00", 8.5, 47.4), (1, 2, "2024-01-01 09:00:00", 8.6, 47.5)],
        "id long, user_id long, tracked_at string, lon double, lat double",
    ).select(
        "id", "user_id",
        F.to_timestamp("tracked_at").alias("tracked_at"),
        F.struct("lon", "lat").alias("geom"),
    )
    write_positionfixes_postgis(pfs, derby_url, "pfs_names", mode="overwrite", properties=DERBY)
    back = read_positionfixes_postgis(spark, derby_url, "pfs_names", properties=DERBY)
    a = sorted((r.asDict(recursive=True) for r in pfs.collect()), key=lambda d: d["id"])
    b = sorted((r.asDict(recursive=True) for r in back.collect()), key=lambda d: d["id"])
    assert a == b


def test_read_gpd_from_pandas_lonlat_and_wkt(spark):
    """read_*_gpd analogs: entity frames from driver pandas, geometry as
    lon/lat columns (points) or WKT strings (linestrings), with the
    reference's rename-keyword convention."""
    import pandas as pd

    from trackintel_spark.sources.postgis import read_positionfixes_gpd, read_triplegs_gpd

    pdf = pd.DataFrame(
        {
            "id": [0, 1],
            "user_id": [1, 1],
            "ts": pd.to_datetime(["2024-01-01 08:00:00", "2024-01-01 08:05:00"]),
            "lon": [8.5, 8.6],
            "lat": [47.4, 47.5],
        }
    )
    pfs = read_positionfixes_gpd(spark, pdf, tracked_at="ts")
    assert dict(pfs.dtypes)["tracked_at"] == "timestamp"
    assert pfs.select("geom.lon").rdd.map(lambda r: r[0]).collect() == [8.5, 8.6]

    tdf = pd.DataFrame(
        {
            "id": [0],
            "user_id": [1],
            "started_at": pd.to_datetime(["2024-01-01 08:00:00"]),
            "finished_at": pd.to_datetime(["2024-01-01 08:30:00"]),
            "geom": ["LINESTRING (8.5 47.4, 8.6 47.5)"],
        }
    )
    tpls = read_triplegs_gpd(spark, tdf)
    row = tpls.select("geom").first()
    assert [(p["lon"], p["lat"]) for p in row["geom"]] == [(8.5, 47.4), (8.6, 47.5)]
