"""CSV readers/writers for every entity.

Reference: io/file.py. Readers take a ``columns`` rename mapping like
the reference (io/file.py:60-63), parse timestamps to UTC, build
geometry from lon/lat columns (positionfixes, io/file.py:83) or WKT
(everything else), and validate. Writers are the inverse: pfs export
longitude/latitude columns (io/file.py:118-123), other entities WKT.

All lazy ``spark.read.csv`` plans — schema projection and filters push
into the scan; nothing materializes in the driver (the reference's
``pd.read_csv`` is a full driver-memory load, io/file.py:79).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trackintel_spark.model.schemas import validate
from trackintel_spark.sources import wkt


def _rename(df: DataFrame, columns: dict[str, str] | None) -> DataFrame:
    for old, new in (columns or {}).items():
        df = df.withColumnRenamed(old, new)
    return df


_ID_COLS = ("id", "user_id", "staypoint_id", "tripleg_id", "trip_id", "location_id",
            "prev_trip_id", "next_trip_id")


def _read(spark: SparkSession, path: str, sep: str) -> DataFrame:
    df = spark.read.csv(path, header=True, sep=sep, inferSchema=True)
    # pandas-written CSVs render nullable int ids as floats ("0.0") — the
    # reference readers tolerate that, so coerce numeric id columns back
    for c in _ID_COLS:
        if c in df.columns and dict(df.dtypes)[c] == "double":
            df = df.withColumn(c, F.col(c).cast("long"))
    return df


def _ts(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    for c in cols:
        if c in df.columns and dict(df.dtypes)[c] in ("string", "timestamp_ntz"):
            df = df.withColumn(c, F.to_timestamp(c))
    return df


def read_positionfixes_csv(
    spark: SparkSession, path: str, sep: str = ";", columns: dict[str, str] | None = None
) -> DataFrame:
    """CSV -> positionfixes (io/file.py:19-85): lon/lat columns become
    the Point geometry; tracked_at parsed to UTC timestamp."""
    df = _ts(_rename(_read(spark, path, sep), columns), ("tracked_at",))
    df = df.withColumn(
        "geom", F.struct(F.col("longitude").cast("double").alias("lon"), F.col("latitude").cast("double").alias("lat"))
    ).drop("longitude", "latitude")
    return validate(df, "positionfixes")


def write_positionfixes_csv(pfs: DataFrame, path: str, sep: str = ";") -> None:
    """positionfixes -> CSV with longitude/latitude columns (io/file.py:118-123)."""
    out = pfs.withColumn("longitude", F.col("geom.lon")).withColumn("latitude", F.col("geom.lat")).drop("geom")
    out.write.mode("overwrite").csv(path, header=True, sep=sep)


def read_staypoints_csv(
    spark: SparkSession, path: str, sep: str = ";", columns: dict[str, str] | None = None, geom_col: str = "geom"
) -> DataFrame:
    df = _ts(_rename(_read(spark, path, sep), columns), ("started_at", "finished_at"))
    df = df.withColumn("geom", wkt.parse_wkt_point(F.col(geom_col).cast("string")))
    return validate(df, "staypoints")


def write_staypoints_csv(sp: DataFrame, path: str, sep: str = ";") -> None:
    out = sp.withColumn("geom", wkt.format_wkt_point(F.col("geom")))
    out.write.mode("overwrite").csv(path, header=True, sep=sep)


def read_triplegs_csv(
    spark: SparkSession, path: str, sep: str = ";", columns: dict[str, str] | None = None, geom_col: str = "geom"
) -> DataFrame:
    df = _ts(_rename(_read(spark, path, sep), columns), ("started_at", "finished_at"))
    df = df.withColumn("geom", wkt.parse_wkt_linestring(F.col(geom_col).cast("string")))
    return validate(df, "triplegs")


def write_triplegs_csv(tpls: DataFrame, path: str, sep: str = ";") -> None:
    out = tpls.withColumn("geom", wkt.format_wkt_linestring(F.col("geom")))
    out.write.mode("overwrite").csv(path, header=True, sep=sep)


def read_trips_csv(
    spark: SparkSession, path: str, sep: str = ";", columns: dict[str, str] | None = None
) -> DataFrame:
    df = _ts(_rename(_read(spark, path, sep), columns), ("started_at", "finished_at"))
    if "geom" in df.columns:
        df = df.withColumn("geom", wkt.parse_wkt_multipoint_od(F.col("geom").cast("string")))
    return validate(df, "trips")


def write_trips_csv(trips: DataFrame, path: str, sep: str = ";") -> None:
    out = trips
    if "geom" in trips.columns:
        out = out.withColumn("geom", wkt.format_wkt_multipoint_od(F.col("geom")))
    out.write.mode("overwrite").csv(path, header=True, sep=sep)


def read_locations_csv(
    spark: SparkSession, path: str, sep: str = ";", columns: dict[str, str] | None = None
) -> DataFrame:
    df = _rename(_read(spark, path, sep), columns)
    df = df.withColumn("center", wkt.parse_wkt_point(F.col("center").cast("string")))
    if "extent" in df.columns:
        df = df.withColumn("extent", wkt.parse_wkt_polygon(F.col("extent").cast("string")))
    return validate(df, "locations")


def write_locations_csv(locs: DataFrame, path: str, sep: str = ";") -> None:
    out = locs.withColumn("center", wkt.format_wkt_point(F.col("center")))
    if "extent" in locs.columns:
        out = out.withColumn("extent", wkt.format_wkt_polygon(F.col("extent")))
    out.write.mode("overwrite").csv(path, header=True, sep=sep)


def read_tours_csv(
    spark: SparkSession, path: str, sep: str = ";", columns: dict[str, str] | None = None
) -> DataFrame:
    """Tours CSV; the ``trips`` member-id list is serialized as a python
    list literal (reference parses with ast.literal_eval, io/file.py:439)
    — '[1, 2, 3]' is valid JSON, so from_json covers it."""
    df = _ts(_rename(_read(spark, path, sep), columns), ("started_at", "finished_at"))
    if "trips" in df.columns:
        df = df.withColumn("trips", F.from_json(F.col("trips").cast("string"), "array<bigint>"))
    return validate(df, "tours")


def write_tours_csv(tours: DataFrame, path: str, sep: str = ";") -> None:
    out = tours
    if "trips" in tours.columns:
        out = out.withColumn("trips", F.to_json(F.col("trips")))
    out.write.mode("overwrite").csv(path, header=True, sep=sep)


# JDBC (PostGIS-analog) entity IO lives in trackintel_spark.sources.jdbc.
