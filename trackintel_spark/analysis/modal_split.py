"""calculate_modal_split — pivot of transport modes over users / time.

Reference: analysis/modal_split.py:6-89.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trackintel_spark.functions.spatial import linestring_length_m
from trackintel_spark.model.schemas import validate


def time_bucket(col: Column, freq: str) -> Column:
    """pandas-Grouper-compatible time bucketing.

    'D' / 'h' floor; 'W' == 'W-SUN' and 'W-MON' label with the
    period-END day (pandas weekly bins label the right edge): the
    Sunday (resp. Monday) on-or-after the timestamp's date.
    """
    if freq in ("D", "d"):
        return F.date_trunc("day", col)
    if freq in ("h", "H"):
        return F.date_trunc("hour", col)
    if freq in ("MS", "M", "ME"):
        return F.date_trunc("month", col)
    if freq in ("W", "W-SUN", "W-MON"):
        day = {"W": "Sun", "W-SUN": "Sun", "W-MON": "Mon"}[freq]
        return F.to_timestamp(F.next_day(F.date_sub(F.to_date(col), 1), day))
    raise ValueError(f"unsupported freq {freq!r}; one of D, h, M, W, W-SUN, W-MON")


def calculate_modal_split(
    tpls: DataFrame,
    freq: str | None = None,
    metric: str = "count",
    per_user: bool = False,
    norm: bool = False,
    modes: list[str] | None = None,
) -> DataFrame:
    """Modal split; requires column ``mode``.

    ``modes`` optionally pins the pivot columns (avoids a distinct-value
    collection job and keeps output schemas stable at scale).
    """
    validate(tpls, "triplegs")
    if "mode" not in tpls.columns:
        raise ValueError("triplegs require the column 'mode'")

    if metric == "count":
        value, agg = F.lit(1.0), F.sum
    elif metric == "distance":
        value, agg = linestring_length_m(F.col("geom")), F.sum
    elif metric == "duration":
        value, agg = F.col("finished_at").cast("double") - F.col("started_at").cast("double"), F.sum
    else:
        raise ValueError(f"Metric {metric} unknown, only metrics {{'count', 'distance', 'duration'}} are supported.")

    group: list[str] = []
    df = tpls.withColumn("__val", value)
    if per_user:
        group.append("user_id")
    if freq is not None:
        df = df.withColumn("timestamp", time_bucket(F.col("started_at"), freq))
        group.append("timestamp")

    grouped = df.groupBy(*group) if group else df.groupBy()
    pivot = grouped.pivot("mode", values=modes) if modes else grouped.pivot("mode")
    out = pivot.agg(F.coalesce(agg("__val"), F.lit(0.0))).na.fill(0.0)

    if norm:
        mode_cols = [c for c in out.columns if c not in group]
        total = sum((F.col(c) for c in mode_cols[1:]), F.col(mode_cols[0]))
        # materialize the row total first — updating columns one by one
        # against a lazy total would normalize later columns with
        # already-normalized earlier ones
        out = out.withColumn("__total", total)
        out = out.select(*group, *[F.try_divide(F.col(c), F.col("__total")).alias(c) for c in mode_cols])
    return out
