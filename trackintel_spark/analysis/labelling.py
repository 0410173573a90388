"""Activity flag + transport-mode labelling.

Reference: analysis/labelling.py.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trackintel_spark.geogr.distances import get_speed_triplegs
from trackintel_spark.model.schemas import validate


def create_activity_flag(
    sp: DataFrame,
    method: str = "time_threshold",
    time_threshold: float = 15.0,
    activity_column_name: str = "is_activity",
) -> DataFrame:
    """is_activity = duration > time_threshold minutes
    (analysis/labelling.py:9-43)."""
    if method != "time_threshold":
        raise ValueError(f"Method {method} not known for creating activity flag.")
    validate(sp, "staypoints")
    dur = F.col("finished_at").cast("double") - F.col("started_at").cast("double")
    return sp.withColumn(activity_column_name, dur > time_threshold * 60.0)


DEFAULT_CATEGORIES: dict[float, str] = {
    15 / 3.6: "slow_mobility",
    100 / 3.6: "motorized_mobility",
    math.inf: "fast_mobility",
}


def predict_transport_mode(
    tpls: DataFrame,
    method: str = "simple-coarse",
    categories: dict[float, str] | None = None,
) -> DataFrame:
    """Speed-bucket transport-mode heuristic (analysis/labelling.py:46-120).

    ``categories``: {upper_bound_m_per_s: label}, sorted by bound; default
    slow (<15 km/h) / motorized (<100 km/h) / fast.
    """
    if method != "simple-coarse":
        raise ValueError(f"Method {method} not known for predicting tripleg transport modes.")
    categories = dict(sorted((categories or DEFAULT_CATEGORIES).items()))
    tpls = get_speed_triplegs(tpls)
    chain: Column | None = None
    for bound, label in categories.items():
        cond = F.lit(True) if math.isinf(bound) else (F.col("speed") < F.lit(bound))
        chain = F.when(cond, F.lit(label)) if chain is None else chain.when(cond, F.lit(label))
    return tpls.withColumn("mode", chain.otherwise(F.lit(None)))
