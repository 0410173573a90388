"""merge_staypoints — merge consecutive same-location staypoints.

Reference: preprocessing/staypoints.py:242-362. The reference converges
an iterated label-propagation loop (:328-344); the fixpoint is simply
maximal runs of pairwise-mergeable neighbors, so one running-sum window
segmentation computes it in a single pass — chained merges fall out of
the cumulative sum.

Merge condition between a staypoint and its successor (:333-338):
same user AND next.started_at - finished_at <= max_time_gap AND same
location_id AND no tripleg between them (next row in the interleaved
sp ∪ tpls time order is not a tripleg, :297-312).

Aggregation (:347-358): id/user_id/started_at/location_id = first,
finished_at = last, plus user-supplied per-column aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trackintel_spark.model.schemas import validate

_AGGS = {
    "first": lambda c: F.first(c),
    "last": lambda c: F.last(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "mean": lambda c: F.avg(c),
    "sum": lambda c: F.sum(c),
}


def merge_staypoints(
    sp: DataFrame,
    tpls: DataFrame,
    max_time_gap: float = 10.0,
    agg: dict[str, str] | None = None,
) -> DataFrame:
    """Merge staypoints; ``max_time_gap`` in minutes. ``agg`` maps extra
    column names to one of first/last/min/max/mean/sum."""
    validate(sp, "staypoints")
    if "location_id" not in sp.columns:
        raise ValueError("Staypoints must contain column location_id")
    gap_s = max_time_gap * 60.0

    # single-pass interleave: tripleg rows ride along as NULL-padded
    # staypoint-shaped rows, so what-follows-each-staypoint is one lead
    # over the SAME user_id exchange the merge windows below reuse. An
    # earlier shape computed next_type on a narrow timeline frame and
    # joined it back on id — two more exchanges and a hash join that
    # profiling (r8→r9) showed were ~40% of the operator's wall.
    # Ordering mirrors the old (started_at, type, __sid): staypoints
    # sort before triplegs at equal timestamps (False < True), tripleg
    # ids are nulled out of the tie-break.
    passthru = [c for c in sp.columns if c not in ("user_id", "started_at")]
    tpl_rows = tpls.select(
        "user_id",
        "started_at",
        *[F.lit(None).cast(sp.schema[c].dataType).alias(c) for c in passthru],
        F.lit(True).alias("__is_tpl"),
    )
    tl = sp.select(
        "user_id", "started_at", *passthru, F.lit(False).alias("__is_tpl")
    ).unionByName(tpl_rows)
    w_t = Window.partitionBy("user_id").orderBy("started_at", "__is_tpl", "id")
    spx = tl.withColumn(
        "__next_is_tpl", F.coalesce(F.lead("__is_tpl").over(w_t), F.lit(False))
    ).filter(~F.col("__is_tpl"))

    w = Window.partitionBy("user_id").orderBy("started_at", "id")
    # merge-with-next flag on each row, then break = NOT lag(flag)
    merge_next = (
        (F.lead("started_at").over(w).cast("double") - F.col("finished_at").cast("double") <= gap_s)
        & F.col("location_id").eqNullSafe(F.lead("location_id").over(w))
        & F.col("location_id").isNotNull()
        & ~F.col("__next_is_tpl")
    )
    spx = spx.withColumn("__merge_next", F.coalesce(merge_next, F.lit(False)))
    spx = spx.withColumn("__break", ~F.coalesce(F.lag("__merge_next").over(w), F.lit(False)))
    spx = spx.withColumn("__grp", F.sum(F.col("__break").cast("long")).over(w))

    agg = agg or {}
    base_aggs = [
        F.min_by(F.col("id"), F.struct("started_at", "id")).alias("id"),
        F.min("started_at").alias("started_at"),
        F.max("finished_at").alias("finished_at"),
        F.min_by(F.col("location_id"), F.struct("started_at", "id")).alias("location_id"),
    ]
    extra = []
    for col, how in agg.items():
        if how not in _AGGS:
            raise ValueError(f"unsupported agg {how!r} for column {col!r}; one of {sorted(_AGGS)}")
        if how == "first":
            extra.append(F.min_by(F.col(col), F.struct("started_at", "id")).alias(col))
        elif how == "last":
            extra.append(F.max_by(F.col(col), F.struct("started_at", "id")).alias(col))
        else:
            extra.append(_AGGS[how](F.col(col)).alias(col))

    out = spx.groupBy("user_id", "__grp").agg(*base_aggs, *extra)
    return out.select("id", "user_id", "started_at", "finished_at", "location_id", *agg.keys())
