"""Per-user mobility entropy — the Song et al. 2010 ("Limits of
Predictability in Human Mobility", Science 327) measures over the
location-visit sequence; the standard companion analysis to
location_identifier / radius_gyration that the reference stops short
of.

Three estimators, in bits:

* ``random``:        log2(N) over the N distinct visited locations —
                     upper bound, ignores frequencies;
* ``uncorrelated``:  −Σ p log2 p of the visit histogram — Shannon
                     entropy of frequencies, ignores order;
* ``actual``:        the Lempel–Ziv estimator
                     S ≈ (n · log2 n) / Σ Λ_i, where Λ_i is the length
                     of the shortest substring starting at i not seen
                     earlier — captures temporal order/routine, the
                     quantity the predictability bound Π^max derives
                     from.

Scale shape: ``random``/``uncorrelated`` are pure two-level
aggregations (groupBy user+location, then user — map-side combined, no
window, no collect). ``actual`` is an inherently sequential per-user
scan → Arrow-batched ``applyInPandas`` over visit sequences, the same
kernel pattern as generate_staypoints; state is one user's sequence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _lz_entropy_bits(seq: np.ndarray) -> float | None:
    """Lempel–Ziv entropy estimate in bits/symbol (Kontoyiannis et al.
    1998 matching-length estimator, the form used by Song et al.)."""
    n = len(seq)
    if n < 2:
        return None
    lambdas = np.empty(n, dtype=np.float64)
    for i in range(n):
        # shortest substring seq[i:i+l] NOT appearing in seq[:i]
        max_l = n - i
        l = 1
        while l <= max_l:
            sub = seq[i : i + l]
            found = False
            # scan history for sub
            for j in range(i - l + 1):
                if np.array_equal(seq[j : j + l], sub):
                    found = True
                    break
            if not found:
                break
            l += 1
        lambdas[i] = min(l, max_l) if l <= max_l else max_l + 1
    # Λ at the very start (empty history) is 1 by definition
    s = lambdas.sum()
    if s <= 0:
        return None
    return float(n * np.log2(n) / s)


def location_entropy(
    sp: DataFrame,
    method: str = "uncorrelated",
    user_col: str = "user_id",
    location_col: str = "location_id",
    order_col: str = "started_at",
) -> DataFrame:
    """Per-user entropy of the location-visit sequence: one row per
    user, (user_col, entropy [bits], n_visits, n_locations). Rows with
    a NULL location (noise staypoints) are excluded first.
    """
    base = sp.filter(F.col(location_col).isNotNull()).select(
        F.col(user_col).alias("user_id"),
        F.col(location_col).alias("loc"),
        F.col(order_col).alias("ord"),
    )
    if method in ("random", "uncorrelated"):
        per_loc = base.groupBy("user_id", "loc").agg(F.count(F.lit(1)).alias("c"))
        per_user = per_loc.groupBy("user_id").agg(
            F.sum("c").alias("n_visits"),
            F.count(F.lit(1)).alias("n_locations"),
            F.sum(F.col("c") * F.log2("c")).alias("__clogc"),
        )
        if method == "random":
            ent = F.log2("n_locations")
        else:
            # −Σ (c/n) log2 (c/n) = log2 n − (Σ c·log2 c)/n
            ent = F.log2("n_visits") - F.col("__clogc") / F.col("n_visits")
        return per_user.select(
            F.col("user_id").alias(user_col),
            ent.cast("double").alias("entropy"),
            "n_visits",
            "n_locations",
        )
    if method != "actual":
        raise ValueError(
            f"method must be 'random', 'uncorrelated' or 'actual', got {method!r}"
        )

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("entropy", T.DoubleType()),
            T.StructField("n_visits", T.LongType()),
            T.StructField("n_locations", T.LongType()),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ord"], kind="stable")
        seq = pdf["loc"].to_numpy()
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "entropy": [_lz_entropy_bits(seq)],
                "n_visits": [len(seq)],
                "n_locations": [int(pd.unique(seq).size)],
            }
        )

    from trackintel_spark.plans.partitioning import kernel_partitions

    out = (
        base.repartition(kernel_partitions(base), "user_id")
        .groupBy("user_id")
        .applyInPandas(kernel, schema=schema)
    )
    return out.withColumnRenamed("user_id", user_col)
