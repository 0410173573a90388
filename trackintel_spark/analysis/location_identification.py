"""Home/work location identification (FREQ + OSNA methods).

Reference: analysis/location_identification.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trackintel_spark.model.schemas import validate

def _DUR():
    return F.col("finished_at").cast("double") - F.col("started_at").cast("double")


def location_identifier(
    sp: DataFrame,
    method: str = "FREQ",
    pre_filter: bool = True,
    **pre_filter_kwargs,
) -> DataFrame:
    """Assign ``purpose`` in {home, work, NULL} per staypoint.

    Reference: location_identifier (analysis/location_identification.py:6-71):
    optional pre_filter_locations, then FREQ or OSNA labelling; staypoints
    filtered out keep NULL purpose.
    """
    validate(sp, "staypoints")
    if "location_id" not in sp.columns:
        raise AssertionError("staypoints must contain column 'location_id'")
    # ONE user_id exchange feeds the whole operator (r12, guide §2.4):
    # every aggregation/window/join inside pre_filter + FREQ/OSNA is
    # keyed by user_id or (user_id, location_id), so hash(user_id)
    # satisfies all of them; id-keyed joins carry user_id as an extra
    # key (a staypoint's id determines its user — match set unchanged).
    # The explicit repartition has no pinned partition count, so AQE
    # still sizes it from the data. The final purpose join's left side
    # is the SAME repartitioned frame (r13, VERDICT r12 #3): joining the
    # raw `sp` there re-shuffled the full staypoint table a second time
    # — the identical exchange subtree now gets planned once and reused.
    base = sp.drop(*[c for c in ("purpose",) if c in sp.columns]).repartition(
        F.col("user_id")
    )
    work = base
    if pre_filter:
        mask = pre_filter_locations(work, **pre_filter_kwargs)
        work = work.join(
            mask.filter(F.col("total_filter")).select("user_id", "id"),
            on=["user_id", "id"],
            how="inner",
        )
    if method == "FREQ":
        labeled = freq_method(work)
    elif method == "OSNA":
        labeled = osna_method(work)
    else:
        raise ValueError(f"Method {method} not known (one of FREQ, OSNA).")
    purpose = labeled.select("user_id", "id", "purpose")
    return base.join(purpose, on=["user_id", "id"], how="left")


def pre_filter_locations(
    sp: DataFrame,
    agg_level: str = "user",
    thresh_sp: int = 10,
    thresh_loc: int = 10,
    thresh_sp_at_loc: int = 10,
    thresh_loc_time: float = 60.0,
    thresh_loc_period: float = 300.0,
) -> DataFrame:
    """Boolean mask per staypoint: user AND location have enough data.

    Reference: pre_filter_locations (analysis/location_identification.py:
    74-162). Time thresholds in minutes (reference '1h' / '5h').
    Returns ``(user_id, id, total_filter)``.

    .. versionchanged:: r12
       The output gained a leading ``user_id`` column (so a caller
       holding a user_id-partitioned frame can join the mask back
       without re-shuffling by id). Select columns by name, not
       position, when consuming this exported API.
    """
    validate(sp, "staypoints")
    if agg_level not in ("user", "dataset"):
        raise ValueError(f"Unknown agg_level '{agg_level}' use instead {{'user', 'dataset'}}.")

    users = sp.groupBy("user_id").agg(
        (
            (F.countDistinct("started_at") >= thresh_sp)
            & (F.countDistinct("location_id") >= thresh_loc)
        ).alias("user_filter")
    )

    loc_keys = ["user_id", "location_id"] if agg_level == "user" else ["location_id"]
    locs = (
        sp.filter(F.col("location_id").isNotNull())
        .groupBy(*loc_keys)
        .agg(
            (
                (F.count("started_at") >= thresh_sp_at_loc)
                & (F.sum(_DUR()) >= thresh_loc_time * 60.0)
                & (
                    (F.max(F.col("finished_at").cast("double")) - F.min(F.col("started_at").cast("double")))
                    >= thresh_loc_period * 60.0
                )
            ).alias("loc_filter")
        )
    )

    out = (
        sp.join(users, on="user_id", how="left")
        .join(locs, on=loc_keys, how="left")
        .withColumn("total_filter", F.col("user_filter") & F.coalesce(F.col("loc_filter"), F.lit(False)))
    )
    # user_id rides along so a caller holding a user_id-partitioned
    # frame can join the mask back without re-shuffling by id (r12)
    return out.select("user_id", "id", "total_filter")


def freq_method(sp: DataFrame, *labels: str) -> DataFrame:
    """Label each user's longest-duration locations (home, work, ...).

    Reference: freq_method (analysis/location_identification.py:165-243):
    rank locations by summed duration per user; k-th longest gets
    labels[k]; ties break on first occurrence (location_id order).
    """
    validate(sp, "staypoints")
    if not labels:
        labels = ("home", "work")

    dur_col = F.col("duration") if "duration" in sp.columns else _DUR()
    per_loc = (
        sp.filter(F.col("location_id").isNotNull())
        .groupBy("user_id", "location_id")
        .agg(F.sum(dur_col).alias("__dur"))
    )
    w = Window.partitionBy("user_id").orderBy(F.col("__dur").desc(), F.col("location_id").asc())
    ranked = per_loc.withColumn("__rank", F.row_number().over(w))
    mapping = F.create_map(*[x for i, lab in enumerate(labels) for x in (F.lit(i + 1), F.lit(lab))])
    ranked = ranked.withColumn("purpose", mapping[F.col("__rank")]).filter(F.col("purpose").isNotNull())
    return sp.drop(*[c for c in ("purpose",) if c in sp.columns]).join(
        ranked.select("user_id", "location_id", "purpose"), on=["user_id", "location_id"], how="left"
    )


def osna_method(sp: DataFrame) -> DataFrame:
    """OSNA home/work labelling (Efstathiades et al. 2015).

    Reference: osna_method (analysis/location_identification.py:246-344)
    + _osna_label_timeframes (:347-355): bucket each staypoint by the
    hour of its midpoint into rest [2,8) / work [8,19) / leisure (else);
    weekends excluded; rest weighted 0.739, leisure 0.358; rest+leisure
    sum to the "home" score, work to the "work" score per (user,
    location). Per user: argmax home -> 'home', argmax work -> 'work';
    if the same location wins both, home wins and work re-argmaxes over
    the remaining locations.
    """
    validate(sp, "staypoints")
    mean_time = F.timestamp_seconds((F.col("started_at").cast("double") + F.col("finished_at").cast("double")) / 2.0)
    hour = F.hour(mean_time)
    weekday = (F.dayofweek(mean_time) + 5) % 7  # Monday=0 .. Sunday=6
    label = (
        F.when(weekday.isin(5, 6), F.lit("weekend"))
        .when((hour >= 2) & (hour < 8), F.lit("rest"))
        .when((hour >= 8) & (hour < 19), F.lit("work"))
        .otherwise(F.lit("leisure"))
    )
    weight = F.when(label == "rest", 0.739).when(label == "leisure", 0.358).otherwise(F.lit(1.0))
    group = F.when(label.isin("rest", "leisure"), F.lit("home")).when(label == "work", F.lit("work"))

    scored = (
        sp.filter(F.col("location_id").isNotNull())
        .withColumn("__grp", group)
        .filter(F.col("__grp").isNotNull())
        .withColumn("__wdur", _DUR() * weight)
    )
    pivot = scored.groupBy("user_id", "location_id").agg(
        F.sum(F.when(F.col("__grp") == "home", F.col("__wdur"))).alias("__home"),
        F.sum(F.when(F.col("__grp") == "work", F.col("__wdur"))).alias("__work"),
    )
    # pandas idxmax on fillna(0), first occurrence in location_id order
    w_home = Window.partitionBy("user_id").orderBy(F.coalesce("__home", F.lit(0.0)).desc(), F.col("location_id").asc())
    w_work = Window.partitionBy("user_id").orderBy(F.coalesce("__work", F.lit(0.0)).desc(), F.col("location_id").asc())
    ranked = pivot.withColumn("__hr", F.row_number().over(w_home)).withColumn("__wr", F.row_number().over(w_work))
    ranked = ranked.withColumn("__home_win", (F.col("__hr") == 1) & F.col("__home").isNotNull()).withColumn(
        "__overlap", (F.col("__hr") == 1) & (F.col("__wr") == 1) & F.col("__home").isNotNull() & F.col("__work").isNotNull()
    )
    # re-argmax work when home overrode the work winner (:327-334)
    work_eff = F.when(F.col("__overlap"), F.lit(None)).otherwise(F.col("__work"))
    ranked = ranked.withColumn("__work_eff", work_eff)
    w_work2 = Window.partitionBy("user_id").orderBy(
        F.coalesce("__work_eff", F.lit(0.0)).desc(), F.col("location_id").asc()
    )
    ranked = ranked.withColumn("__wr2", F.row_number().over(w_work2))
    purpose = (
        F.when(F.col("__home_win"), F.lit("home"))
        .when((F.col("__wr2") == 1) & F.col("__work_eff").isNotNull(), F.lit("work"))
        .otherwise(F.lit(None))
    )
    labels = ranked.withColumn("purpose", purpose).select("user_id", "location_id", "purpose")
    return sp.drop(*[c for c in ("purpose",) if c in sp.columns]).join(
        labels, on=["user_id", "location_id"], how="left"
    )
