"""Geolife raw-corpus reader.

Reference: ``read_geolife`` (io/dataset_reader.py:24-121, parser
:160-194): walk ``<root>/<user_id>/Trajectory/*.plt``; each .plt has 6
header lines then rows ``latitude, longitude, 0, elevation_feet,
serial_date, date, time``; elevation converts feet -> meters; user id
comes from the folder name.

Spark-first: ONE distributed csv scan over the glob (no per-file driver
loop); the user id is regex-extracted from ``input_file_name()`` and
header lines drop out via a null-filter after typed casting — this
keeps the whole read parallel and pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trackintel_spark.model.schemas import validate
from trackintel_spark.plans.ids import dense_id_by_user

_FEET_TO_M = 0.3048


def read_geolife(spark: SparkSession, path: str) -> DataFrame:
    """Read a Geolife directory tree into positionfixes."""
    # explicit 7-string-column schema: the 6 header lines would otherwise
    # drive schema inference to a single column
    schema = ", ".join(f"_c{i} string" for i in range(7))
    raw = (
        spark.read.csv(f"{path}/*/Trajectory/*.plt", header=False, schema=schema, mode="PERMISSIVE")
        .withColumn("__file", F.input_file_name())
    )
    # try_cast/try_to_timestamp: under ANSI mode plain casts would error
    # on the header lines instead of yielding NULLs to filter out
    df = raw.select(
        F.regexp_extract(F.col("__file"), r"/(\d+)/Trajectory/", 1).try_cast("long").alias("user_id"),
        F.col("_c0").try_cast("double").alias("latitude"),
        F.col("_c1").try_cast("double").alias("longitude"),
        (F.col("_c3").try_cast("double") * _FEET_TO_M).alias("elevation"),
        F.try_to_timestamp(F.concat_ws(" ", F.col("_c5"), F.col("_c6")), F.lit("yyyy-MM-dd HH:mm:ss")).alias(
            "tracked_at"
        ),
    )
    # the 6 header lines fail the double/timestamp casts -> NULL -> drop
    df = df.filter(F.col("latitude").isNotNull() & F.col("longitude").isNotNull() & F.col("tracked_at").isNotNull())
    df = df.select(
        "user_id",
        "tracked_at",
        "elevation",
        F.struct(F.col("longitude").alias("lon"), F.col("latitude").alias("lat")).alias("geom"),
    )
    df = dense_id_by_user(df, order_by=["tracked_at", F.col("geom.lon")], id_col="id")
    return validate(df, "positionfixes")


def geolife_add_modes_to_triplegs(
    tpls: DataFrame,
    labels: DataFrame,
    ratio_threshold: float = 0.5,
    max_duration_tripleg_s: float = 7 * 24 * 3600,
) -> DataFrame:
    """Match transport-mode label intervals onto triplegs by temporal
    overlap ratio.

    Reference: io/dataset_reader.py:197-300: the reference prefilters
    candidate (tripleg, label) pairs with a chebyshev NN tree on epoch
    seconds (:264-268) then keeps the label with the highest
    overlap/duration ratio >= threshold (:286-288). Here the prefilter
    is a banded interval join: both sides bucket to coarse time bins so
    the join is an equi-join on (user_id, bin) plus residual range
    predicates — the scalable range-join plan.

    ``labels`` columns: user_id, started_at, finished_at, mode.
    """
    bucket_s = max_duration_tripleg_s
    b = lambda c: F.floor(c.cast("double") / bucket_s).cast("long")  # noqa: E731

    lab = labels.select(
        F.col("user_id").alias("__lu"),
        F.col("started_at").alias("__ls"),
        F.col("finished_at").alias("__lf"),
        F.col("mode").alias("__mode"),
    )
    lab = lab.withColumn(
        "__bin", F.explode(F.sequence(b(F.col("__ls")) - 1, b(F.col("__lf")) + 1))
    )
    t = tpls.withColumn("__bin", b(F.col("started_at")))
    # no broadcast hint: label intervals grow with the tracking data
    # (one row per labeled segment, exploded per time bin) — AQE still
    # broadcasts when the corpus is actually small
    joined = t.join(
        lab,
        on=(
            (t["user_id"] == lab["__lu"])
            & (t["__bin"] == lab["__bin"])
            & (lab["__ls"] < t["finished_at"])
            & (lab["__lf"] > t["started_at"])
        ),
        how="left",
    )
    dur = F.col("finished_at").cast("double") - F.col("started_at").cast("double")
    overlap = F.least(F.col("__lf").cast("double"), F.col("finished_at").cast("double")) - F.greatest(
        F.col("__ls").cast("double"), F.col("started_at").cast("double")
    )
    joined = joined.withColumn("__ratio", F.when(dur > 0, overlap / dur))
    from pyspark.sql import Window

    # rounded-rank convention (same as the bm25/top-k surfaces): the
    # argmax orders by the ratio ROUNDED to 1e-9 then (label start,
    # mode), so sub-ulp float noise can't flip which label wins between
    # engines, and any residual full tie carries the same mode — the
    # only label column that survives into the output.
    w = Window.partitionBy("id").orderBy(
        F.round(F.col("__ratio"), 9).desc_nulls_last(), F.col("__ls"), F.col("__mode")
    )
    best = joined.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    best = best.withColumn(
        "mode", F.when(F.col("__ratio") >= ratio_threshold, F.col("__mode"))
    )
    return best.select(*tpls.columns, "mode").drop("__bin")


def read_geolife_labels(spark: SparkSession, path: str) -> DataFrame:
    """Read every ``<root>/<user>/labels.txt`` into one labels table.

    Reference ``_get_labels`` (io/dataset_reader.py:124-158) loops the
    user folders into a ``{user_id: DataFrame}`` dict; Spark-first this
    is ONE distributed tab-CSV scan over the glob with the user id
    regex-extracted from the file path — the natural join input for
    :func:`geolife_add_modes_to_triplegs`. Users without a labels.txt
    simply contribute no rows.

    Output columns: user_id, started_at, finished_at, mode (timestamps
    parsed as the reference does, ``%Y/%m/%d %H:%M:%S`` assumed UTC).
    """
    out_schema = "user_id long, started_at timestamp, finished_at timestamp, mode string"
    # an empty glob would raise PATH_NOT_FOUND instead of yielding zero
    # rows. For plain local paths one driver-side glob decides (like the
    # reference's os.listdir walk); for remote schemes (hdfs://, s3a://,
    # where glob.glob can't list) let Spark resolve and map the
    # no-files error to the documented empty frame.
    import glob as _glob

    scheme_local = "://" not in path or path.startswith("file:")
    if scheme_local and not _glob.glob(f"{path.removeprefix('file:')}/*/labels.txt"):
        return spark.createDataFrame([], out_schema)
    try:
        raw = (
            spark.read.csv(
                f"{path}/*/labels.txt",
                sep="\t",
                header=True,
                schema="`Start Time` string, `End Time` string, `Transportation Mode` string",
            )
            .withColumn("__file", F.input_file_name())
        )
    except Exception as e:  # AnalysisException PATH_NOT_FOUND on remote FS
        if "PATH_NOT_FOUND" in str(e):
            return spark.createDataFrame([], out_schema)
        raise
    fmt = "yyyy/MM/dd HH:mm:ss"
    out = raw.select(
        F.regexp_extract(F.col("__file"), r"/(\d+)/labels\.txt", 1).try_cast("long").alias("user_id"),
        F.to_timestamp(F.col("Start Time"), fmt).alias("started_at"),
        F.to_timestamp(F.col("End Time"), fmt).alias("finished_at"),
        F.col("Transportation Mode").alias("mode"),
    )
    # non-numeric user folder names regex-extract to NULL — drop them
    # (the reference's int(folder) would have crashed instead)
    return out.filter(F.col("user_id").isNotNull())
