"""GPX track reader.

Reference: ``read_gpx`` (io/dataset_reader.py:689-736) reads each
file's track points via fiona, assigns everything to ``user_id = 0``
(:735), and numbers tracks across files in sorted-filename order
(:708-713). Without an XML dependency, track points are extracted from
whole-file text with regexps — `<trkpt lat=".." lon="..">` attributes
plus nested `<time>`/`<ele>` elements. Covers the GPX 1.1 track-point
layout the reference consumes.

The scan stays distributed: one wholetext row per file, exploded into
points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trackintel_spark.model.schemas import validate
from trackintel_spark.plans.ids import dense_id_by_user

_TRKPT = r'(?s)<trkpt[^>]*lat="([^"]+)"[^>]*lon="([^"]+)"[^>]*>(.*?)</trkpt>'


def read_gpx(spark: SparkSession, path: str) -> DataFrame:
    """Read ``<path>/*.gpx`` into positionfixes of a single user
    (user_id 0, as in the reference); ``track_fid`` numbers tracks in
    sorted-filename order."""
    raw = spark.read.text(f"{path}/*.gpx", wholetext=True).withColumn("__file", F.input_file_name())
    # file count is tiny — a filename-ordered dense rank is fine here
    raw = raw.withColumn("track_fid", F.dense_rank().over(Window.orderBy("__file")) - 1)
    pts = raw.select(
        "track_fid",
        F.explode(F.regexp_extract_all(F.col("value"), F.lit(_TRKPT), F.lit(0))).alias("__pt"),
    )
    lat = F.regexp_extract(F.col("__pt"), r'lat="([^"]+)"', 1).try_cast("double")
    lon = F.regexp_extract(F.col("__pt"), r'lon="([^"]+)"', 1).try_cast("double")
    time = F.regexp_extract(F.col("__pt"), r"<time>([^<]+)</time>", 1)
    ele = F.regexp_extract(F.col("__pt"), r"<ele>([^<]+)</ele>", 1).try_cast("double")
    df = pts.select(
        F.lit(0).cast("long").alias("user_id"),
        "track_fid",
        F.to_timestamp(F.regexp_replace(time, r"Z$", "+00:00")).alias("tracked_at"),
        ele.alias("elevation"),
        F.struct(lon.alias("lon"), lat.alias("lat")).alias("geom"),
    ).filter(F.col("tracked_at").isNotNull() & F.col("geom.lat").isNotNull())
    df = dense_id_by_user(df, order_by=["track_fid", "tracked_at", F.col("geom.lon")], id_col="id")
    return validate(df, "positionfixes")
