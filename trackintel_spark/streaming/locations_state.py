"""ONLINE location assignment for streamed staypoints — the last
mobility entity with no streaming path (reference
preprocessing/staypoints.py ``generate_locations`` is batch DBSCAN).

Two cooperating pieces, composable with the rest of the online chain
(pfs -> staypoints -> THIS -> location_identifier-style labelling):

1. a STREAM-STATIC candidate join against a batch-trained locations
   table (the ``generate_locations`` output): each staypoint meets
   every trained center within ``epsilon_m`` via a latitude-banded
   grid-cell equi-join (the dbscan_distributed band scheme — cell
   height = eps in latitude degrees, per-band cell width covering eps
   in longitude at the band's pole-near edge, centers exploded to
   their 3x3 cell neighborhood). The stream side never shuffles more
   than its groupBy key; the static side is a small broadcast-able
   table of 9 rows per center.
2. a STATEFUL fallback (``applyInPandasWithState`` keyed on user_id):
   staypoints with no trained center within eps are leader-clustered
   online — assigned to the nearest previously OPENED center within
   eps, else they open a new location at their own coordinates.
   Opened locations get NEGATIVE ids (-1, -2, ... per user) so they
   never collide with trained ids; state is the per-user list of
   opened centers — bounded by the number of genuinely new places a
   user visits, not by stream length.

Batch parity: on a non-streaming input the same kernel runs through
``applyInPandas`` (the tours_state.py convention), and
tests/test_streaming_locations.py pins stream == batch across
arbitrary micro-batch splits.

Ordering contract: within a user, micro-batches are processed in
arrival order and each batch is sorted by (started_at, id); the
opened-center ids therefore depend on arrival order, exactly like any
online clusterer. Assignment against TRAINED centers is
order-independent.
"""

from __future__ import annotations

import math
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState

from trackintel_spark.functions.spatial import EARTH_RADIUS_M
from trackintel_spark.operators.dbscan_distributed import _band_cos, _DEG2M
from trackintel_spark.streaming.reorder import apply_with_reorder

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("location_id", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("o_id", T.ArrayType(T.LongType())),
        T.StructField("o_lon", T.ArrayType(T.DoubleType())),
        T.StructField("o_lat", T.ArrayType(T.DoubleType())),
        T.StructField("n_opened", T.LongType()),
    ]
)


def _haversine_scalar(lon1: float, lat1: float, lon2: float, lat2: float) -> float:
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = p2 - p1, math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * EARTH_RADIUS_M * math.asin(min(1.0, math.sqrt(a)))


def _with_cells(df: DataFrame, lon: Column, lat: Column, cell_deg: float):
    """(cy, cx) banded grid cell — identical math on both join sides.
    Cell height = eps in latitude degrees; cell WIDTH in a band covers
    eps of longitude at the band's pole-near edge (smallest cos), so
    two points within eps always differ by <= 1 cell on each axis."""
    cy = F.floor(lat / cell_deg).cast("long")
    _, cos_pole = _band_cos(cy, cell_deg)
    w = F.lit(cell_deg) / cos_pole
    return df.withColumn("__cy", cy).withColumn(
        "__cx", F.floor(lon / w).cast("long")
    )


def _explode_center_cells(locations: DataFrame, cell_deg: float) -> DataFrame:
    """Static side: each trained center replicated into its 3x3 cell
    neighborhood. The lon-cell index is recomputed PER TARGET BAND
    (bands have different widths).

    Antimeridian wraparound: ``floor(lon / w)`` puts +179.99° and
    −179.99° in numerically distant cells even though they are within
    eps on the sphere, so a staypoint near the dateline would miss its
    trained center and open a spurious negative-id location. Centers
    are therefore ALSO replicated at lon ± 360° — the wrapped copy
    lands in cells numerically adjacent to the opposite edge — with
    copies kept only inside a 3-cell-width dateline margin, so the
    static side only grows where the wrap can matter. The exact
    distance check downstream is haversine, which is periodicity-safe
    as is."""
    base = locations.select(
        F.col("user_id"),
        F.col("id").alias("__cand_id"),
        F.col("center.lon").alias("__cand_lon"),
        F.col("center.lat").alias("__cand_lat"),
    )
    base = base.withColumn(
        "__shift", F.explode(F.array(F.lit(-360.0), F.lit(0.0), F.lit(360.0)))
    )
    own_cy = F.floor(F.col("__cand_lat") / cell_deg).cast("long")
    out = base.withColumn("__cy0", own_cy).withColumn(
        "__dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    )
    cy = (F.col("__cy0") + F.col("__dy")).alias("__cy")
    _, cos_pole = _band_cos(F.col("__cy0") + F.col("__dy"), cell_deg)
    w = F.lit(cell_deg) / cos_pole
    slon = F.col("__cand_lon") + F.col("__shift")
    cx0 = F.floor(slon / w).cast("long")
    out = (
        out.withColumn("__cy", cy)
        .withColumn("__w", w)
        .withColumn("__cx0", cx0)
        .filter(
            (F.col("__shift") == 0.0)
            | (F.abs(F.col("__cand_lon") + F.col("__shift")) <= 180.0 + 3.0 * F.col("__w"))
        )
        .withColumn("__dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
    )
    return out.select(
        "user_id",
        "__cy",
        (F.col("__cx0") + F.col("__dx")).alias("__cx"),
        "__cand_id",
        "__cand_lon",
        "__cand_lat",
    )


def locations_stream_exact(
    sp: DataFrame,
    locations: DataFrame | None = None,
    epsilon_m: float = 100.0,
    max_disorder: float = 0.0,
    late: str = "raise",
    max_open_locations: int | None = None,
) -> DataFrame:
    """Assign a ``location_id`` to every (streamed) staypoint.

    ``locations``: a STATIC batch-trained table with (id, user_id,
    center struct<lon,lat>) — the :func:`generate_locations` output.
    Staypoints within ``epsilon_m`` of a trained center take the
    nearest one (ties to the smallest id). Everything else falls back
    to the stateful online leader clusterer (negative ids; see module
    doc). Pass ``locations=None`` for the pure online clusterer.

    Works on a streaming OR batch ``sp`` (unified API). Returns
    (id, user_id, location_id).

    ``max_disorder`` (minutes, default 0) opts into the bounded-
    disorder hold-and-sort buffer
    (:mod:`trackintel_spark.streaming.reorder`). The online clusterer
    is arrival-order dependent (module doc) — with the buffer, any
    within-bound jitter yields the SAME opened-center ids as the
    in-order run; ``late`` picks raise vs drop beyond the bound.

    ``max_open_locations`` (r12, default None = unbounded) caps the
    per-user opened-center list with LRU eviction: state grows with
    the number of NEW places a user visits, so a user endlessly
    visiting fresh places (or a bot feed) grows state linearly without
    a cap. With the cap, the least-recently-ASSIGNED opened center is
    evicted when a fresh place would exceed it; a staypoint returning
    to an evicted place opens a NEW negative id (exactly how any
    bounded online clusterer forgets). Trained-center assignment is
    unaffected — at scale, run generate_locations nightly and let the
    stream-static join absorb the stable places, keeping the online
    tail small.
    """
    if max_open_locations is not None and max_open_locations < 1:
        raise ValueError(f"max_open_locations must be >= 1, got {max_open_locations}")
    if epsilon_m <= 0:
        raise ValueError(f"epsilon_m must be positive, got {epsilon_m}")
    cell_deg = epsilon_m / _DEG2M
    kin = sp.select(
        "id", "user_id", "started_at",
        F.col("geom.lon").alias("__lon"), F.col("geom.lat").alias("__lat"),
    )
    # NULL-geometry staypoints can't be clustered; emit them with a NULL
    # location_id through a stateless branch instead of letting the
    # kernel's pandas groupby silently drop NaN keys — every input row
    # must appear in the output
    nullg = kin.filter(F.col("__lon").isNull() | F.col("__lat").isNull()).select(
        "id", "user_id", F.lit(None).cast("long").alias("location_id")
    )
    kin = kin.filter(F.col("__lon").isNotNull() & F.col("__lat").isNotNull())
    if locations is not None:
        cands = _explode_center_cells(locations, cell_deg)
        kin = _with_cells(kin, F.col("__lon"), F.col("__lat"), cell_deg)
        # stream-static LEFT join: stateless, so it composes with the
        # downstream stateful operator; a staypoint with no nearby
        # trained center keeps one row with NULL candidate columns
        kin = kin.join(cands, on=["user_id", "__cy", "__cx"], how="left").drop(
            "__cy", "__cx"
        )
    else:
        kin = (
            kin.withColumn("__cand_id", F.lit(None).cast("long"))
            .withColumn("__cand_lon", F.lit(None).cast("double"))
            .withColumn("__cand_lat", F.lit(None).cast("double"))
        )

    eps = float(epsilon_m)

    def fn(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            o_id, o_lon, o_lat, n_opened = state.get
            o_id, o_lon, o_lat = list(o_id), list(o_lon), list(o_lat)
        else:
            o_id, o_lon, o_lat, n_opened = [], [], [], 0

        pdf = pd.concat(list(batches), ignore_index=True)
        pdf = pdf.sort_values(["started_at", "id"], kind="stable")
        rows = []
        for (sp_id, s_lon, s_lat), grp in pdf.groupby(
            ["id", "__lon", "__lat"], sort=False
        ):
            # nearest trained center within eps (tie -> smallest id)
            best_key, assigned = (float("inf"), float("inf")), None
            for cid, clon, clat in zip(
                grp["__cand_id"], grp["__cand_lon"], grp["__cand_lat"]
            ):
                if pd.isna(cid):
                    continue
                d = _haversine_scalar(s_lon, s_lat, clon, clat)
                if d <= eps and (d, cid) < best_key:
                    best_key, assigned = (d, int(cid)), int(cid)
            if assigned is None:
                # nearest OPENED center within eps (tie -> first-opened,
                # i.e. the LARGEST negative id: -1 before -2)
                hit = None
                for j in range(len(o_id)):
                    d = _haversine_scalar(s_lon, s_lat, o_lon[j], o_lat[j])
                    if d <= eps and (d, -o_id[j]) < best_key:
                        best_key, assigned, hit = (d, -o_id[j]), o_id[j], j
                if hit is not None and max_open_locations is not None:
                    # LRU touch: the lists are kept in recency order
                    # (state schema unchanged — order is ours)
                    o_id.append(o_id.pop(hit))
                    o_lon.append(o_lon.pop(hit))
                    o_lat.append(o_lat.pop(hit))
            if assigned is None:
                n_opened += 1
                assigned = -n_opened
                o_id.append(assigned)
                o_lon.append(float(s_lon))
                o_lat.append(float(s_lat))
                if max_open_locations is not None and len(o_id) > max_open_locations:
                    o_id.pop(0)  # evict least-recently-assigned
                    o_lon.pop(0)
                    o_lat.pop(0)
            rows.append((int(sp_id), int(user_id), int(assigned)))

        state.update((o_id, o_lon, o_lat, int(n_opened)))
        if rows:
            yield pd.DataFrame(rows, columns=["id", "user_id", "location_id"])

    out = apply_with_reorder(
        kin, ("user_id",), fn, _OUT_SCHEMA, _STATE_SCHEMA,
        time_col="started_at", max_disorder_s=max_disorder * 60.0, late=late,
    )
    return out.unionByName(nullg)
