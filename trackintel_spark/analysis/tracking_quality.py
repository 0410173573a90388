"""temporal_tracking_quality — per-user temporal coverage ratios.

Reference: analysis/tracking_quality.py:6-224. Records spanning
day/hour borders are split first (``_split_overlaps`` :171-196, a
per-row date_range + explode); here the split is a pure
``sequence`` + ``explode`` expression — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GRANULARITIES = ("all", "day", "week", "weekday", "hour")


def split_overlaps(df: DataFrame, granularity: str = "day") -> DataFrame:
    """Split [started_at, finished_at) records at day/hour borders.

    Reference: _split_overlaps (analysis/tracking_quality.py:171-196).
    Cut points = {started_at} ∪ {borders in (started_at, finished_at]}
    ∪ {finished_at}, deduplicated; adjacent pairs become rows.
    """
    unit = "hour" if granularity == "hour" else "day"
    step = F.expr("INTERVAL 1 HOUR") if granularity == "hour" else F.expr("INTERVAL 1 DAY")

    ceil_start = F.when(
        F.date_trunc(unit, F.col("started_at")) == F.col("started_at"), F.col("started_at")
    ).otherwise(F.date_trunc(unit, F.col("started_at")) + step)

    borders = F.when(
        ceil_start <= F.col("finished_at"), F.sequence(ceil_start, F.col("finished_at"), step)
    ).otherwise(F.array().cast("array<timestamp>"))

    cuts = F.array_distinct(
        F.concat(F.array(F.col("started_at")), borders, F.array(F.col("finished_at")))
    )
    pieces = F.zip_with(
        F.slice(cuts, 1, F.size(cuts) - 1),
        F.slice(cuts, 2, F.size(cuts) - 1),
        lambda s, e: F.struct(s.alias("s"), e.alias("e")),
    )
    other = [c for c in df.columns if c not in ("started_at", "finished_at")]
    return (
        df.withColumn("__piece", F.explode(pieces))
        .select(*other, F.col("__piece.s").alias("started_at"), F.col("__piece.e").alias("finished_at"))
    )


def temporal_tracking_quality(source: DataFrame, granularity: str = "all") -> DataFrame:
    """Tracked-seconds / extent per user (and per granularity bucket)."""
    required = ("user_id", "started_at", "finished_at")
    missing = [c for c in required if c not in source.columns]
    if missing:
        raise KeyError(f"the source dataframe must have the columns {list(required)}, missing {missing}")
    if granularity not in _GRANULARITIES:
        raise ValueError(f"granularity unknown. We only support {list(_GRANULARITIES)}. You passed {granularity}")

    dur = F.col("finished_at").cast("double") - F.col("started_at").cast("double")
    df = source.select("user_id", "started_at", "finished_at").filter(dur > 0)

    if granularity == "all":
        return df.groupBy("user_id").agg(
            (
                F.sum(dur)
                / (F.max(F.col("finished_at").cast("double")) - F.min(F.col("started_at").cast("double")))
            ).alias("quality")
        )

    df = split_overlaps(df, granularity="hour" if granularity == "hour" else "day")

    if granularity == "day":
        bucket, col_name = F.date_trunc("day", F.col("started_at")), "day"
    elif granularity == "week":
        # pandas Grouper(freq='W') labels the Sunday ending the week
        bucket, col_name = (
            F.to_timestamp(F.next_day(F.date_sub(F.to_date("started_at"), 1), "Sun")),
            "week_monday",
        )
    elif granularity == "weekday":
        # pandas weekday: Monday=0..Sunday=6
        bucket, col_name = (F.dayofweek("started_at") + 5) % 7, "weekday"
    else:  # hour
        bucket, col_name = F.hour("started_at"), "hour"

    df = df.withColumn("__bucket", bucket)

    if granularity in ("day", "week"):
        extent = F.lit(86400.0 if granularity == "day" else 604800.0)
        grouped = df.groupBy("user_id", "__bucket").agg((F.sum(dur) / extent).alias("quality"))
    else:
        # extent scales with the number of tracked weeks/days relative to
        # the GLOBAL measurement start (:108, :151-163)
        start = df.agg(F.date_trunc("day", F.min("started_at")).alias("__start"))
        df = df.crossJoin(F.broadcast(start))
        # exact integer-microsecond difference: double subtraction of
        # ~1.7e9-second timestamps can flip floor() at day boundaries
        span_days = F.floor(
            (F.unix_micros(F.col("started_at")) - F.unix_micros(F.col("__start"))) / 86400e6
        ).cast("long")
        span = span_days / 7 if granularity == "weekday" else span_days
        unit_s = 86400.0 if granularity == "weekday" else 3600.0
        df = df.withColumn("__span", F.floor(span).cast("long"))
        grouped = df.groupBy("user_id", "__bucket").agg(
            (F.sum(dur) / (F.lit(unit_s) * (F.max("__span") - F.min("__span") + 1))).alias("quality")
        )

    return grouped.withColumnRenamed("__bucket", col_name)
