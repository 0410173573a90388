"""Shared tau-sized latitude-banded grid for trajectory pruning.

One implementation of the cell geometry used by BOTH sides of the
trajectory similarity operators (`trajectory_similarity_join`,
`streaming.trajmatch`), so the subtle parts — the haversine-consistent
degree constant, per-band cosine scaling, the 1.05 longitude slack,
antimeridian aliasing — can never diverge between the build and probe
sides again (a 111,320 vs 111,194.93 m/deg divergence between the grid
and the metric it bounds was a real review-caught exactness bug; see
tests/test_trajectory_join.py::test_band_boundary_near_threshold_pair_not_dropped).

Geometry: bands of height ``cell_deg`` = tau in latitude degrees under
the haversine sphere (meridian arc is exact: two points within tau
differ by <= cell_deg of latitude, i.e. at most one band). Within a
band, the circle is split into ``n = max(1, floor(360 / w_ideal))``
EQUAL cells of width ``360 / n`` degrees, where ``w_ideal = cell_deg /
cos(equator-near edge)``; flooring keeps every cell's physical width
>= tau, and an integer cell count makes longitude indices EXACTLY
periodic — ``cx`` is taken modulo ``n``, so cells alias across the
antimeridian and a pair straddling ±180° joins like any other
(pinned by tests/test_trajectory_join.py::test_antimeridian_*). The
probe side enumerates dy in {-1, 0, 1} and, per target band, the
longitude cell range an (1.05 x tau)-disk can touch, scaled by the
band's SMALLEST cosine so a true neighbor is never dropped; when that
range covers the whole band (near a pole) it collapses to each cell
exactly once.

``dbscan_distributed`` keeps its own scheme (eps/2 cells, half
neighborhood, fully-covered-cell rule) — different contract.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# meters per degree of latitude under the haversine sphere
# (R = 6,371,000 — functions/spatial.py and _pair_cost use the same R)
DEG2M = math.pi / 180.0 * 6_371_000.0


def cell_size_deg(tau_m: float) -> float:
    """Band height in latitude degrees for radius ``tau_m``."""
    if tau_m < 0:
        raise ValueError(f"tau_m must be >= 0, got {tau_m}")
    return max(tau_m, 1.0) / DEG2M


def _band_geometry(cy: Column, cell_deg: float) -> tuple[Column, Column]:
    """(cos of the band's equator-near edge, cos of its pole-near edge),
    both clamped away from 0 so polar bands divide cleanly."""
    eq_edge = F.greatest(cy, -cy - 1).cast("double") * cell_deg
    pole_edge = F.least(eq_edge + cell_deg, F.lit(90.0))
    cos_eq = F.greatest(F.cos(F.radians(eq_edge)), F.lit(1e-9))
    cos_pole = F.greatest(F.cos(F.radians(pole_edge)), F.lit(1e-9))
    return cos_eq, cos_pole


def _band_cells(cy: Column, cell_deg: float) -> tuple[Column, Column]:
    """(cell width in lon degrees, cell count) of a band — the count is
    integral so the band tiles the circle exactly and indices alias
    modulo the count across ±180°."""
    cos_eq, _ = _band_geometry(cy, cell_deg)
    w_ideal = F.lit(cell_deg) / cos_eq
    n = F.greatest(F.floor(F.lit(360.0) / w_ideal), F.lit(1)).cast("long")
    return F.lit(360.0) / n.cast("double"), n


def own_cell(lon: Column, lat: Column, cell_deg: float) -> tuple[Column, Column]:
    """The (cy, cx) cell of a point — the lean, non-exploded side."""
    cy = F.floor(lat / cell_deg).cast("long")
    w_t, n_t = _band_cells(cy, cell_deg)
    cx = F.pmod(F.floor((lon + F.lit(180.0)) / w_t).cast("long"), n_t)
    return cy, cx


def probe_cells(lon: Column, lat: Column, cell_deg: float) -> Column:
    """Every cell the tau-disk around the point can touch, as one
    ``array<struct<cy, cx>>`` — the exploded side of the equi-join.
    Indices are wrapped modulo the band's cell count, so probes near
    ±180° alias onto the cells of points on the other side."""
    cy = F.floor(lat / cell_deg).cast("long")

    def _band(dy: int) -> Column:
        t_cy = cy + F.lit(dy)
        _, t_cos_pole = _band_geometry(t_cy, cell_deg)
        w_t, n_t = _band_cells(t_cy, cell_deg)
        r_deg = F.lit(cell_deg * 1.05) / t_cos_pole
        lo = F.floor((lon + F.lit(180.0) - r_deg) / w_t).cast("long")
        hi = F.floor((lon + F.lit(180.0) + r_deg) / w_t).cast("long")
        # full-circle cap: when the disk spans the whole band, emit each
        # cell exactly once; otherwise the consecutive range stays
        # injective under pmod (range length < modulus), no dedup needed
        rng = F.when(hi - lo + 1 >= n_t, F.sequence(F.lit(0).cast("long"), n_t - 1)).otherwise(
            F.transform(F.sequence(lo, hi), lambda tx: F.pmod(tx, n_t))
        )
        return F.transform(rng, lambda tx: F.struct(t_cy.alias("cy"), tx.alias("cx")))

    return F.concat(_band(-1), _band(0), _band(1))
