"""Per-entity PostGIS-style readers/writers + in-memory constructors.

Reference surface: io/postgis.py:47-733 exports ``read_<entity>_postgis``
/ ``write_<entity>_postgis`` and io/from_geopandas.py exports
``read_<entity>_gpd``. The engine's generic machinery lives in
sources/jdbc.py (WKT-over-JDBC, parallel range reads); this module
binds it to the reference's per-entity names, and provides the
``*_gpd`` analogs as constructors from driver-side pandas frames
(geometry as WKT strings or lon/lat columns) — the migration path for
users whose data starts as GeoDataFrames.
"""

from __future__ import annotations

from functools import partial

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trackintel_spark.model.schemas import validate
from trackintel_spark.sources import wkt
from trackintel_spark.sources.jdbc import _GEOM_COLS, read_entity_jdbc, write_entity_jdbc

_ENTITIES = ("positionfixes", "staypoints", "triplegs", "trips", "locations", "tours")

_WKT_PARSE = {
    "point": wkt.parse_wkt_point,
    "linestring": wkt.parse_wkt_linestring,
    "polygon": wkt.parse_wkt_polygon,
    "multipoint_od": wkt.parse_wkt_multipoint_od,
}


def _read_postgis(entity: str, spark: SparkSession, url: str, table: str, **kw) -> DataFrame:
    return read_entity_jdbc(spark, url, table, entity, **kw)


def _write_postgis(entity: str, df: DataFrame, url: str, table: str, **kw) -> None:
    write_entity_jdbc(df, url, table, entity, **kw)


def _read_gpd(entity: str, spark: SparkSession, pdf: pd.DataFrame, **rename) -> DataFrame:
    """Entity DataFrame from a driver-side pandas frame (the
    ``read_*_gpd`` analog, io/from_geopandas.py:12-230).

    ``rename`` maps entity column -> source column (reference keyword
    convention, e.g. ``tracked_at="timestamp"``). Geometry columns may
    arrive as WKT strings, or — for point geometries — as ``lon``/
    ``lat`` columns in the frame.
    """
    pdf = pdf.rename(columns={v: k for k, v in rename.items()})
    df = spark.createDataFrame(pdf)
    for col, kind in _GEOM_COLS[entity].items():
        if col in df.columns:
            if dict(df.dtypes)[col] == "string":
                df = df.withColumn(col, _WKT_PARSE[kind](F.col(col)))
        elif kind == "point" and {"lon", "lat"} <= set(df.columns):
            df = df.withColumn(col, F.struct(F.col("lon"), F.col("lat"))).drop("lon", "lat")
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return validate(df, entity)


def _bind(template, doc: str) -> dict:
    out = {}
    for e in _ENTITIES:
        fn = partial(template, e)
        fn.__doc__ = doc.format(entity=e)
        out[e] = fn
    return out


_READERS = _bind(_read_postgis, "read_{entity}_postgis analog (io/postgis.py) over JDBC+WKT.")
_WRITERS = _bind(_write_postgis, "write_{entity}_postgis analog (io/postgis.py) over JDBC+WKT.")
_GPD = _bind(_read_gpd, "read_{entity}_gpd analog (io/from_geopandas.py) from a pandas frame.")

read_positionfixes_postgis = _READERS["positionfixes"]
read_staypoints_postgis = _READERS["staypoints"]
read_triplegs_postgis = _READERS["triplegs"]
read_trips_postgis = _READERS["trips"]
read_locations_postgis = _READERS["locations"]
read_tours_postgis = _READERS["tours"]
write_positionfixes_postgis = _WRITERS["positionfixes"]
write_staypoints_postgis = _WRITERS["staypoints"]
write_triplegs_postgis = _WRITERS["triplegs"]
write_trips_postgis = _WRITERS["trips"]
write_locations_postgis = _WRITERS["locations"]
write_tours_postgis = _WRITERS["tours"]
read_positionfixes_gpd = _GPD["positionfixes"]
read_staypoints_gpd = _GPD["staypoints"]
read_triplegs_gpd = _GPD["triplegs"]
read_trips_gpd = _GPD["trips"]
read_locations_gpd = _GPD["locations"]
read_tours_gpd = _GPD["tours"]

__all__ = [f"read_{e}_postgis" for e in _ENTITIES] + [
    f"write_{e}_postgis" for e in _ENTITIES
] + [f"read_{e}_gpd" for e in _ENTITIES]
