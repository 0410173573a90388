"""Next-location prediction — the first-order Markov model over
location-visit sequences.

The standard companion to the Song et al. predictability analysis
(:mod:`trackintel_spark.analysis.entropy` estimates HOW predictable a
user is; this model IS the baseline predictor the bound is compared
against, e.g. Lu et al. 2013 "Approaching the Limit of Predictability
in Human Mobility"). The reference library stops at location
generation; this is extension surface.

Scale shape: one window (lead over each user's visit sequence — the
same per-user ordering every segmentation operator shuffles by, so a
bucketed-by-user layout makes it exchange-free) and one aggregation;
transition probabilities divide exact counts, and the per-(user, from)
normalization windows run over the AGGREGATED matrix rows, never the
visits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["location_transition_matrix", "predict_next_location"]


def location_transition_matrix(
    sp: DataFrame,
    user_col: str = "user_id",
    location_col: str = "location_id",
    order_col: str = "started_at",
    drop_self_loops: bool = False,
) -> DataFrame:
    """Per-user first-order transition counts and probabilities over
    the location-visit sequence: one row per observed (user, from_loc,
    to_loc) with ``n_trans`` and ``prob`` (row-normalized per (user,
    from_loc)). NULL locations (noise staypoints) are dropped BEFORE
    sequencing, so a visit chain a -> noise -> b contributes the
    transition a -> b — consistent with how the entropy estimators
    read the sequence."""
    base = sp.filter(F.col(location_col).isNotNull()).select(
        F.col(user_col).alias("user_id"),
        F.col(location_col).alias("from_loc"),
        F.col(order_col).alias("__ord"),
    )
    w = Window.partitionBy("user_id").orderBy("__ord")
    pairs = base.withColumn("to_loc", F.lead("from_loc").over(w)).filter(
        F.col("to_loc").isNotNull()
    )
    if drop_self_loops:
        pairs = pairs.filter(F.col("from_loc") != F.col("to_loc"))
    counts = pairs.groupBy("user_id", "from_loc", "to_loc").agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    wn = Window.partitionBy("user_id", "from_loc")
    return counts.withColumn(
        "prob", F.col("n_trans") / F.sum("n_trans").over(wn)
    )


def predict_next_location(
    transitions: DataFrame,
) -> DataFrame:
    """Collapse a :func:`location_transition_matrix` to the argmax
    predictor: one row per (user, from_loc) with the most-likely
    ``predicted_loc``, its ``prob``, and ``n_obs`` (observations the
    estimate rests on). Ties break to the smaller location id —
    deterministic and order-free."""
    w = Window.partitionBy("user_id", "from_loc").orderBy(
        F.desc("n_trans"), F.asc("to_loc")
    )
    wn = Window.partitionBy("user_id", "from_loc")
    return (
        transitions.withColumn("__r", F.row_number().over(w))
        .withColumn("n_obs", F.sum("n_trans").over(wn))
        .filter(F.col("__r") == 1)
        .select(
            "user_id",
            "from_loc",
            F.col("to_loc").alias("predicted_loc"),
            "prob",
            "n_obs",
        )
    )
