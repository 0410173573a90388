"""CRS handling: planar checks + reprojection as pure Spark expressions.

Reference: ``check_gdf_planar`` (geogr/distances.py:213-250) delegates
reprojection to geopandas/pyproj. Neither is available here, so the
common projections are implemented as closed-form column expressions
(whole-stage codegen, no UDF in the data path):

* EPSG:4326 (WGS84 lon/lat) — the engine's native geometry;
* EPSG:3857 (Web Mercator) — exact spherical formulas;
* EPSG:326xx / 327xx (WGS84 UTM north/south) — transverse Mercator via
  the USGS/Snyder series (Map Projections: A Working Manual, 1987,
  pp. 60-64; public knowledge), centimeter-level accuracy;
* EPSG:21781 (Swiss CH1903/LV03) and EPSG:2056 (CH1903+/LV95, the
  same projection with the false origin moved by +2'000'000/+1'000'000
  — the current official Swiss frame) — the swisstopo approximate
  formulas
  (public), meter-level accuracy (matches the published accuracy of the
  approximation itself);
* generic parameterized grid FAMILIES, each a registry + dataclass +
  Snyder-series Column expressions with an optional 7-parameter Helmert
  datum bridge: transverse Mercator (``TM_GRIDS`` — BNG 27700,
  Gauss-Krüger, ...), Lambert Conformal Conic 2SP (``LCC_GRIDS`` —
  Lambert-93 2154, Belgian 31370, ...), Albers Equal-Area 2SP
  (``AEA_GRIDS`` — Conus Albers 5070, California 3310, Australian
  3577), polar stereographic variants A/B (``PS_GRIDS`` — NSIDC
  3413/3031, UPS 32661/32761), oblique Lambert Azimuthal Equal-Area
  (``LAEA_GRIDS`` — ETRS89-LAEA Europe 3035, US National Atlas sphere
  2163/9311), oblique stereographic / EPSG 9809 (``OST_GRIDS`` —
  Dutch RD New 28992, staged iterative inverse), Mollweide
  (``MOLL_GRIDS`` — World Mollweide 54009, staged Newton forward with
  a cube-root pole seed), and Krovak / EPSG 9819+1041
  (``KROVAK_GRIDS`` — Czech/Slovak S-JTSK 5514/5513, oblique
  conformal conic, staged iterative inverse). Extend via
  ``register_*_grid``.

Anything else (Robinson-class compromise projections, ...)
dispatches to a pyproj-backed Arrow UDF IF pyproj is importable
(feature-flagged; not present in this container), else raises with a
clear message.

FROZEN (round 7): the nine families above cover essentially every
national grid and world equal-area CRS a mobility dataset carries;
the residual population (Robinson, Winkel Tripel, van der Grinten —
world thematic cartography, not trackintel workloads) stays on the
pyproj hook by design. New grids of an EXISTING family belong in the
``register_*_grid`` registries; new projection FAMILIES should not be
added here without a concrete mobility dataset that needs one.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WGS84 = 4326
WEB_MERCATOR = 3857
CH1903 = 21781
CH1903_PLUS = 2056  # LV95: LV03 false origin shifted to (2_600_000, 1_200_000)

# WGS84 ellipsoid
_A = 6378137.0
_F = 1 / 298.257223563
_E2 = _F * (2 - _F)
_EP2 = _E2 / (1 - _E2)
_K0 = 0.9996  # UTM scale factor


def is_geographic(epsg: int) -> bool:
    """True when coordinates are lon/lat degrees (the engine's native
    form); False for projected (planar, meters) systems. 4258 (ETRS89)
    and 4269 (NAD83) differ from WGS84 by well under the GPS noise
    floor at this library's scales, so they pass through."""
    return epsg in (WGS84, 4979, 4258, 4269)


def check_planar(df: DataFrame, epsg: int | None) -> bool:
    """check_gdf_planar analog: True when the declared CRS is planar.
    A None CRS counts as geographic (like the reference, with a warning
    left to the caller)."""
    return epsg is not None and not is_geographic(epsg)


def _utm_zone(epsg: int) -> tuple[int, bool] | None:
    if 32601 <= epsg <= 32660:
        return epsg - 32600, True
    if 32701 <= epsg <= 32760:
        return epsg - 32700, False
    return None


# -- Web Mercator (exact, spherical) ----------------------------------------

def wgs84_to_web_mercator(lon: Column, lat: Column) -> tuple[Column, Column]:
    x = F.radians(lon) * _A
    y = F.log(F.tan(F.lit(math.pi / 4.0) + F.radians(lat) / 2.0)) * _A
    return x, y


def web_mercator_to_wgs84(x: Column, y: Column) -> tuple[Column, Column]:
    lon = F.degrees(x / _A)
    lat = F.degrees(F.atan(F.sinh(y / _A)))
    return lon, lat


# -- UTM (transverse Mercator, Snyder series) --------------------------------

def _meridian_arc(phi: Column) -> Column:
    e2, e4, e6 = _E2, _E2**2, _E2**3
    return _A * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * F.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * F.sin(4 * phi)
        - (35 * e6 / 3072) * F.sin(6 * phi)
    )


def wgs84_to_utm(lon: Column, lat: Column, zone: int) -> tuple[Column, Column]:
    """Forward transverse Mercator (Snyder 8-9..8-13). Returns (easting,
    northing-without-false-northing); southern-hemisphere callers add
    10 000 000 (handled by :func:`transform_points`)."""
    lam0 = math.radians(zone * 6 - 183)
    phi = F.radians(lat)
    lam = F.radians(lon)
    sin_p, cos_p, tan_p = F.sin(phi), F.cos(phi), F.tan(phi)
    n = _A / F.sqrt(1 - _E2 * sin_p * sin_p)
    t = tan_p * tan_p
    c = _EP2 * cos_p * cos_p
    a = (lam - lam0) * cos_p
    a2 = a * a
    a3, a4 = a2 * a, a2 * a2
    a5, a6 = a4 * a, a4 * a2
    x = _K0 * n * (a + (1 - t + c) * a3 / 6 + (5 - 18 * t + t * t + 72 * c - 58 * _EP2) * a5 / 120)
    y = _K0 * (
        _meridian_arc(phi)
        + n * tan_p * (a2 / 2 + (5 - t + 9 * c + 4 * c * c) * a4 / 24
                       + (61 - 58 * t + t * t + 600 * c - 330 * _EP2) * a6 / 720)
    )
    return x + 500000.0, y


def utm_to_wgs84(x: Column, y: Column, zone: int) -> tuple[Column, Column]:
    """Inverse transverse Mercator (Snyder 8-17..8-25, footpoint
    latitude). ``y`` must already have any false northing removed."""
    lam0 = math.radians(zone * 6 - 183)
    e1 = (1 - math.sqrt(1 - _E2)) / (1 + math.sqrt(1 - _E2))
    m = y / _K0
    mu = m / (_A * (1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * F.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * F.sin(4 * mu)
        + (151 * e1**3 / 96) * F.sin(6 * mu)
        + (1097 * e1**4 / 512) * F.sin(8 * mu)
    )
    sin1, cos1, tan1 = F.sin(phi1), F.cos(phi1), F.tan(phi1)
    c1 = _EP2 * cos1 * cos1
    t1 = tan1 * tan1
    n1 = _A / F.sqrt(1 - _E2 * sin1 * sin1)
    r1 = _A * (1 - _E2) / F.pow(1 - _E2 * sin1 * sin1, 1.5)
    d = (x - 500000.0) / (n1 * _K0)
    d2 = d * d
    d3, d4 = d2 * d, d2 * d2
    d5, d6 = d4 * d, d4 * d2
    phi = phi1 - (n1 * tan1 / r1) * (
        d2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * _EP2) * d4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * _EP2 - 3 * c1 * c1) * d6 / 720
    )
    lam = (
        d
        - (1 + 2 * t1 + c1) * d3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * _EP2 + 24 * t1 * t1) * d5 / 120
    ) / cos1
    return F.degrees(F.lit(lam0) + lam), F.degrees(phi)


# -- Swiss CH1903 / LV03 (swisstopo approximate formulas) --------------------

def ch1903_to_wgs84(e: Column, n: Column) -> tuple[Column, Column]:
    yp = (e - 600000.0) / 1000000.0
    xp = (n - 200000.0) / 1000000.0
    lam = 2.6779094 + 4.728982 * yp + 0.791484 * yp * xp + 0.1306 * yp * xp * xp - 0.0436 * yp * yp * yp
    phi = (
        16.9023892 + 3.238272 * xp - 0.270978 * yp * yp - 0.002528 * xp * xp
        - 0.0447 * yp * yp * xp - 0.0140 * xp * xp * xp
    )
    return lam * 100.0 / 36.0, phi * 100.0 / 36.0


def wgs84_to_ch1903(lon: Column, lat: Column) -> tuple[Column, Column]:
    phi = (lat * 3600.0 - 169028.66) / 10000.0
    lam = (lon * 3600.0 - 26782.5) / 10000.0
    e = (
        600072.37 + 211455.93 * lam - 10938.51 * lam * phi
        - 0.36 * lam * phi * phi - 44.54 * lam * lam * lam
    )
    n = (
        200147.07 + 308807.95 * phi + 3745.25 * lam * lam + 76.63 * phi * phi
        - 194.56 * lam * lam * phi + 119.79 * phi * phi * phi
    )
    return e, n


# -- generic transverse Mercator (any ellipsoid / national grid) -------------
#
# The UTM code above is WGS84-specialized; the functions below take the
# full parameter set (ellipsoid a/f, origin lat0/lon0, scale k0, false
# easting/northing) — the Snyder series generalizes directly, covering
# most national grids (British National Grid, Gauss-Krüger, ...). For
# grids on non-WGS84 datums a 7-parameter Helmert transformation
# (position-vector convention, via geocentric XYZ with Bowring's
# closed-form inverse) bridges to WGS84 — all pure Column expressions.

from dataclasses import dataclass


@dataclass(frozen=True)
class TMGrid:
    """A transverse-Mercator national grid + its datum bridge.

    ``helmert_to_wgs84`` = (tx_m, ty_m, tz_m, rx_arcsec, ry_arcsec,
    rz_arcsec, scale_ppm) in the position-vector convention, applied
    geocentrically from the grid's datum to WGS84; None = the grid's
    datum IS WGS84.
    """

    a: float
    f: float
    lat0: float
    lon0: float
    k0: float
    false_easting: float
    false_northing: float
    helmert_to_wgs84: tuple[float, float, float, float, float, float, float] | None = None

    @property
    def e2(self) -> float:
        return self.f * (2 - self.f)


def _arc(phi: Column, a: float, e2: float) -> Column:
    e4, e6 = e2**2, e2**3
    return a * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * F.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * F.sin(4 * phi)
        - (35 * e6 / 3072) * F.sin(6 * phi)
    )


def _arc_scalar(phi: float, a: float, e2: float) -> float:
    e4, e6 = e2**2, e2**3
    return a * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi)
        - (35 * e6 / 3072) * math.sin(6 * phi)
    )


def tm_forward(lon: Column, lat: Column, g: TMGrid) -> tuple[Column, Column]:
    """Geodetic (on the grid's own datum) -> grid easting/northing
    (Snyder 8-9..8-13 with arbitrary ellipsoid/origin/scale)."""
    a_, e2 = g.a, g.e2
    ep2 = e2 / (1 - e2)
    lam0 = math.radians(g.lon0)
    m0 = _arc_scalar(math.radians(g.lat0), a_, e2)
    phi = F.radians(lat)
    lam = F.radians(lon)
    sin_p, cos_p, tan_p = F.sin(phi), F.cos(phi), F.tan(phi)
    n = a_ / F.sqrt(1 - e2 * sin_p * sin_p)
    t = tan_p * tan_p
    c = ep2 * cos_p * cos_p
    aa = (lam - lam0) * cos_p
    a2 = aa * aa
    a3, a4 = a2 * aa, a2 * a2
    a5, a6 = a4 * aa, a4 * a2
    x = g.k0 * n * (aa + (1 - t + c) * a3 / 6 + (5 - 18 * t + t * t + 72 * c - 58 * ep2) * a5 / 120)
    y = g.k0 * (
        _arc(phi, a_, e2) - m0
        + n * tan_p * (a2 / 2 + (5 - t + 9 * c + 4 * c * c) * a4 / 24
                       + (61 - 58 * t + t * t + 600 * c - 330 * ep2) * a6 / 720)
    )
    return x + g.false_easting, y + g.false_northing


def tm_inverse(x: Column, y: Column, g: TMGrid) -> tuple[Column, Column]:
    """Grid easting/northing -> geodetic lon/lat on the grid's own
    datum (Snyder 8-17..8-25, footpoint latitude)."""
    a_, e2 = g.a, g.e2
    ep2 = e2 / (1 - e2)
    lam0 = math.radians(g.lon0)
    m0 = _arc_scalar(math.radians(g.lat0), a_, e2)
    e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    m = (y - g.false_northing) / g.k0 + m0
    mu = m / (a_ * (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * F.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * F.sin(4 * mu)
        + (151 * e1**3 / 96) * F.sin(6 * mu)
        + (1097 * e1**4 / 512) * F.sin(8 * mu)
    )
    sin1, cos1, tan1 = F.sin(phi1), F.cos(phi1), F.tan(phi1)
    c1 = ep2 * cos1 * cos1
    t1 = tan1 * tan1
    n1 = a_ / F.sqrt(1 - e2 * sin1 * sin1)
    r1 = a_ * (1 - e2) / F.pow(1 - e2 * sin1 * sin1, 1.5)
    d = (x - g.false_easting) / (n1 * g.k0)
    d2 = d * d
    d3, d4 = d2 * d, d2 * d2
    d5, d6 = d4 * d, d4 * d2
    phi = phi1 - (n1 * tan1 / r1) * (
        d2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * d4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1) * d6 / 720
    )
    lam = (
        d
        - (1 + 2 * t1 + c1) * d3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1) * d5 / 120
    ) / cos1
    return F.degrees(F.lit(lam0) + lam), F.degrees(phi)


def _geodetic_to_xyz(lon: Column, lat: Column, a: float, e2: float) -> tuple[Column, Column, Column]:
    phi, lam = F.radians(lat), F.radians(lon)
    sin_p, cos_p = F.sin(phi), F.cos(phi)
    nu = a / F.sqrt(1 - e2 * sin_p * sin_p)
    return nu * cos_p * F.cos(lam), nu * cos_p * F.sin(lam), nu * (1 - e2) * sin_p


def _xyz_to_geodetic(x: Column, y: Column, z: Column, a: float, e2: float) -> tuple[Column, Column]:
    # Bowring's closed-form inverse: sub-mm at earth-surface heights
    b = a * math.sqrt(1 - e2)
    ep2 = e2 / (1 - e2)
    p = F.sqrt(x * x + y * y)
    theta = F.atan2(z * a, p * b)
    st, ct = F.sin(theta), F.cos(theta)
    phi = F.atan2(z + ep2 * b * st * st * st, p - e2 * a * ct * ct * ct)
    lam = F.atan2(y, x)
    return F.degrees(lam), F.degrees(phi)


_ARCSEC = math.pi / (180.0 * 3600.0)


def _helmert(x: Column, y: Column, z: Column, p: tuple, invert: bool = False):
    tx, ty, tz, rx, ry, rz, s_ppm = p
    if invert:
        # the linearized position-vector transform's inverse is the
        # negated parameter set (second-order error ~1e-9 * |t|, < 1 um)
        tx, ty, tz, rx, ry, rz, s_ppm = (-v for v in p)
    rx, ry, rz = rx * _ARCSEC, ry * _ARCSEC, rz * _ARCSEC
    m = 1.0 + s_ppm * 1e-6
    return (
        tx + m * (x - rz * y + ry * z),
        ty + m * (rz * x + y - rx * z),
        tz + m * (-ry * x + rx * y + z),
    )


# ellipsoids (public geodetic constants)
_AIRY_1830 = (6377563.396, 1 / 299.3249646)
_BESSEL_1841 = (6377397.155, 1 / 299.1528128)

# OSGB36 -> WGS84 (the standard published 7-parameter set, ~2 m)
_OSGB36_HELMERT = (446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)
# DHDN (Potsdam) -> WGS84 (BKG national set, ~3 m)
_DHDN_HELMERT = (598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7)

# GRS80 differs from WGS84 by <0.1 mm in flattening — datum bridge not
# needed for GRS80-based modern national frames (SWEREF99, NZGD2000)
_GRS80 = (6378137.0, 1 / 298.257222101)

#: EPSG -> grid parameters; extend via :func:`register_tm_grid`.
TM_GRIDS: dict[int, TMGrid] = {
    # British National Grid (OSGB36)
    27700: TMGrid(*_AIRY_1830, lat0=49.0, lon0=-2.0, k0=0.9996012717,
                  false_easting=400_000.0, false_northing=-100_000.0,
                  helmert_to_wgs84=_OSGB36_HELMERT),
    # SWEREF99 TM (Sweden)
    3006: TMGrid(*_GRS80, lat0=0.0, lon0=15.0, k0=0.9996,
                 false_easting=500_000.0, false_northing=0.0),
    # NZTM2000 (New Zealand)
    2193: TMGrid(*_GRS80, lat0=0.0, lon0=173.0, k0=0.9996,
                 false_easting=1_600_000.0, false_northing=10_000_000.0),
}
# German Gauss-Krüger zones 2-5 (DHDN): lon0 = 3 * zone, FE = zone e6 + 500k
for _z, _epsg in ((2, 31466), (3, 31467), (4, 31468), (5, 31469)):
    TM_GRIDS[_epsg] = TMGrid(
        *_BESSEL_1841, lat0=0.0, lon0=3.0 * _z, k0=1.0,
        false_easting=_z * 1_000_000.0 + 500_000.0, false_northing=0.0,
        helmert_to_wgs84=_DHDN_HELMERT,
    )


def register_tm_grid(epsg: int, grid: TMGrid) -> None:
    """Register a custom transverse-Mercator grid so
    :func:`transform_points` / :func:`transform_xy` accept its EPSG
    code — the extension hook for national grids not built in."""
    TM_GRIDS[epsg] = grid


# -- Lambert Conformal Conic (2SP) national grids -----------------------------
#
# Snyder, "Map Projections — A Working Manual" (USGS PP 1395), §15:
# forward eqns 15-1..15-7 with the ellipsoidal t/m functions (14-15,
# 14-9), inverse via eqns 15-8..15-11 and the conformal-latitude
# series (3-5) instead of the fixed-point iteration — closed form, so
# the Catalyst expression stays one bounded tree. Covers France
# Lambert-93 (EPSG:2154), Belgian Lambert 72 (EPSG:31370), the
# NAD83 State Plane LCC zones, and Canada's LCC frames. The reference
# delegates all reprojection to geopandas/pyproj
# (reference trackintel/geogr/distances.py:213-250); here the math is
# pure Column expressions so it distributes with zero Python in the row
# path.


@dataclass(frozen=True)
class LCCGrid:
    """A 2-standard-parallel Lambert Conformal Conic grid + datum bridge.

    ``lat0``/``lon0`` = latitude/longitude of false origin, ``lat1`` /
    ``lat2`` = standard parallels (degrees). ``helmert_to_wgs84`` as in
    :class:`TMGrid` (position-vector convention); None = datum is
    WGS84-equivalent (RGF93, NAD83, ...).
    """

    a: float
    f: float
    lat0: float
    lon0: float
    lat1: float
    lat2: float
    false_easting: float
    false_northing: float
    helmert_to_wgs84: tuple[float, float, float, float, float, float, float] | None = None

    @property
    def e2(self) -> float:
        return self.f * (2 - self.f)


def _lcc_consts(g: LCCGrid) -> tuple[float, float, float, float]:
    """Plan-time scalars (n, F, rho0, e) for the 2SP cone."""
    e = math.sqrt(g.e2)

    def m(phi: float) -> float:
        s = math.sin(phi)
        return math.cos(phi) / math.sqrt(1 - g.e2 * s * s)

    def t(phi: float) -> float:
        s = math.sin(phi)
        return math.tan(math.pi / 4 - phi / 2) / ((1 - e * s) / (1 + e * s)) ** (e / 2)

    p0, p1, p2 = (math.radians(v) for v in (g.lat0, g.lat1, g.lat2))
    m1, m2 = m(p1), m(p2)
    t0, t1, t2 = t(p0), t(p1), t(p2)
    if abs(g.lat1 - g.lat2) < 1e-12:
        n = math.sin(p1)
    else:
        n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    f_ = m1 / (n * t1**n)
    rho0 = g.a * f_ * t0**n if t0 > 0 else 0.0
    return n, f_, rho0, e


def lcc_forward(lon: Column, lat: Column, g: LCCGrid) -> tuple[Column, Column]:
    """Geodetic (grid datum) -> LCC easting/northing (Snyder 15-1..15-7)."""
    n, f_, rho0, e = _lcc_consts(g)
    phi = F.radians(lat)
    sin_p = F.sin(phi)
    # t(phi) as a Column (Snyder 15-9 / 14-15)
    t_c = F.tan(math.pi / 4 - phi / 2) / F.pow((1 - e * sin_p) / (1 + e * sin_p), e / 2)
    rho = g.a * f_ * F.pow(t_c, n)
    theta = n * (F.radians(lon) - math.radians(g.lon0))
    x = rho * F.sin(theta)
    y = rho0 - rho * F.cos(theta)
    return x + g.false_easting, y + g.false_northing


def lcc_inverse(x: Column, y: Column, g: LCCGrid) -> tuple[Column, Column]:
    """LCC easting/northing -> geodetic lon/lat on the grid's own datum
    (Snyder 15-8..15-11; latitude via the conformal-latitude series 3-5,
    closed form — no fixed-point iteration in the expression tree)."""
    n, f_, rho0, e = _lcc_consts(g)
    sgn = 1.0 if n >= 0 else -1.0
    dx = x - g.false_easting
    dy = rho0 - (y - g.false_northing)
    rho = sgn * F.sqrt(dx * dx + dy * dy)
    theta = F.atan2(sgn * dx, sgn * dy)
    lam = theta / n + math.radians(g.lon0)
    t_c = F.pow(rho / (g.a * f_), 1.0 / n)
    chi = math.pi / 2 - 2 * F.atan(t_c)
    e2 = g.e2
    e4, e6, e8 = e2 * e2, e2 * e2 * e2, e2 * e2 * e2 * e2
    phi = (
        chi
        + (e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360) * F.sin(2 * chi)
        + (7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520) * F.sin(4 * chi)
        + (7 * e6 / 120 + 81 * e8 / 1120) * F.sin(6 * chi)
        + (4279 * e8 / 161280) * F.sin(8 * chi)
    )
    return F.degrees(lam), F.degrees(phi)


# International 1924 (Hayford) ellipsoid — Belgian Lambert 72 datum
_INTL_1924 = (6378388.0, 1 / 297.0)
# BD72 -> WGS84 (NGI 7-parameter set, position-vector convention; the
# national NGI correction grid is more accurate — this Helmert set is
# the standard grid-free approximation, good to a few meters)
_BD72_HELMERT = (-106.8686, 52.2978, -103.7239, 0.3366, -0.457, 1.8422, -1.2747)

#: EPSG -> LCC grid parameters; extend via :func:`register_lcc_grid`.
LCC_GRIDS: dict[int, LCCGrid] = {
    # France Lambert-93 (RGF93 / GRS80 — datum equivalent to WGS84)
    2154: LCCGrid(*_GRS80, lat0=46.5, lon0=3.0, lat1=44.0, lat2=49.0,
                  false_easting=700_000.0, false_northing=6_600_000.0),
    # Belgian Lambert 72 (BD72 on International 1924, Helmert-bridged)
    31370: LCCGrid(*_INTL_1924, lat0=90.0, lon0=4.367486666666666,
                   lat1=51.16666723333333, lat2=49.8333339,
                   false_easting=150_000.013, false_northing=5_400_088.438,
                   helmert_to_wgs84=_BD72_HELMERT),
    # Statistics Canada Lambert (NAD83 / GRS80, metric)
    3347: LCCGrid(*_GRS80, lat0=63.390675, lon0=-91.86666666666666,
                  lat1=49.0, lat2=77.0,
                  false_easting=6_200_000.0, false_northing=3_000_000.0),
    # NAD83 / Maryland (State Plane LCC zone, metric)
    26985: LCCGrid(*_GRS80, lat0=37.66666666666666, lon0=-77.0,
                   lat1=38.3, lat2=39.45,
                   false_easting=400_000.0, false_northing=0.0),
}


def register_lcc_grid(epsg: int, grid: LCCGrid) -> None:
    """Register a custom Lambert-Conformal-Conic grid so
    :func:`transform_points` / :func:`transform_xy` accept its EPSG
    code — the extension hook for LCC zones not built in (other State
    Plane zones, regional cones, ...)."""
    LCC_GRIDS[epsg] = grid


# -- Albers Equal-Area Conic (2SP) -------------------------------------------
# Snyder §14 (Map Projections: A Working Manual, pp. 98-103), the CONUS
# analysis projection (US Census / National Atlas) and the Australian
# national equal-area grid. Same staged-projection + Helmert machinery
# as TM/LCC.


@dataclass(frozen=True)
class AEAGrid:
    """A 2-standard-parallel Albers Equal-Area Conic grid + datum bridge.

    ``lat0``/``lon0`` = latitude/longitude of false origin, ``lat1`` /
    ``lat2`` = standard parallels (degrees). ``helmert_to_wgs84`` as in
    :class:`TMGrid`; None = datum is WGS84-equivalent (NAD83, GDA94...).
    """

    a: float
    f: float
    lat0: float
    lon0: float
    lat1: float
    lat2: float
    false_easting: float
    false_northing: float
    helmert_to_wgs84: tuple[float, float, float, float, float, float, float] | None = None

    @property
    def e2(self) -> float:
        return self.f * (2 - self.f)


def _aea_q_scalar(phi: float, e2: float) -> float:
    """Authalic q(φ) — Snyder 3-12 — at plan time."""
    if e2 == 0.0:
        return 2.0 * math.sin(phi)
    e = math.sqrt(e2)
    s = math.sin(phi)
    return (1 - e2) * (
        s / (1 - e2 * s * s) - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s))
    )


def _aea_consts(g: AEAGrid) -> tuple[float, float, float, float]:
    """Plan-time cone scalars (n, C, rho0, q_pole) — Snyder 14-3..14-6."""
    e2 = g.e2
    p0, p1, p2 = (math.radians(v) for v in (g.lat0, g.lat1, g.lat2))

    def m(phi: float) -> float:
        s = math.sin(phi)
        return math.cos(phi) / math.sqrt(1 - e2 * s * s)

    q0, q1, q2 = (_aea_q_scalar(p, e2) for p in (p0, p1, p2))
    m1, m2 = m(p1), m(p2)
    if abs(g.lat1 - g.lat2) < 1e-12:
        n = math.sin(p1)
    else:
        n = (m1 * m1 - m2 * m2) / (q2 - q1)
    c = m1 * m1 + n * q1
    rho0 = g.a * math.sqrt(c - n * q0) / n
    q_pole = _aea_q_scalar(math.pi / 2, e2)
    return n, c, rho0, q_pole


def _aea_q_col(phi: Column, e2: float) -> Column:
    """q(φ) as a Column (Snyder 3-12)."""
    if e2 == 0.0:  # sphere
        return 2.0 * F.sin(phi)
    e = math.sqrt(e2)
    s = F.sin(phi)
    return (1 - e2) * (
        s / (1 - e2 * s * s) - (1 / (2 * e)) * F.log((1 - e * s) / (1 + e * s))
    )


def aea_forward(lon: Column, lat: Column, g: AEAGrid) -> tuple[Column, Column]:
    """Geodetic (grid datum) -> AEA easting/northing (Snyder 14-1..14-4)."""
    n, c, rho0, _ = _aea_consts(g)
    q = _aea_q_col(F.radians(lat), g.e2)
    rho = g.a * F.sqrt(c - n * q) / n
    theta = n * (F.radians(lon) - math.radians(g.lon0))
    x = rho * F.sin(theta)
    y = rho0 - rho * F.cos(theta)
    return x + g.false_easting, y + g.false_northing


def aea_inverse(x: Column, y: Column, g: AEAGrid) -> tuple[Column, Column]:
    """AEA easting/northing -> geodetic lon/lat on the grid's own datum
    (Snyder 14-8..14-11; latitude via the authalic-latitude series 3-18,
    closed form — no fixed-point iteration in the expression tree)."""
    n, c, rho0, q_pole = _aea_consts(g)
    sgn = 1.0 if n >= 0 else -1.0
    dx = x - g.false_easting
    dy = rho0 - (y - g.false_northing)
    rho = F.sqrt(dx * dx + dy * dy)
    theta = F.atan2(sgn * dx, sgn * dy)
    lam = theta / n + math.radians(g.lon0)
    q = (c - (rho * rho) * (n * n) / (g.a * g.a)) / n
    # clamp |q/q_pole| into asin's domain against float round-off at the pole
    ratio = F.greatest(F.lit(-1.0), F.least(F.lit(1.0), q / q_pole))
    beta = F.asin(ratio)
    e2 = g.e2
    e4, e6 = e2 * e2, e2 * e2 * e2
    phi = (
        beta
        + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * F.sin(2 * beta)
        + (23 * e4 / 360 + 251 * e6 / 3780) * F.sin(4 * beta)
        + (761 * e6 / 45360) * F.sin(6 * beta)
    )
    return F.degrees(lam), F.degrees(phi)


#: EPSG -> AEA grid parameters; extend via :func:`register_aea_grid`.
AEA_GRIDS: dict[int, AEAGrid] = {
    # NAD83 / Conus Albers — the US Census / National Atlas CONUS frame
    5070: AEAGrid(*_GRS80, lat0=23.0, lon0=-96.0, lat1=29.5, lat2=45.5,
                  false_easting=0.0, false_northing=0.0),
    # NAD83 / California Albers (statewide analysis grid)
    3310: AEAGrid(*_GRS80, lat0=0.0, lon0=-120.0, lat1=34.0, lat2=40.5,
                  false_easting=0.0, false_northing=-4_000_000.0),
    # GDA94 / Australian Albers (national equal-area grid)
    3577: AEAGrid(*_GRS80, lat0=0.0, lon0=132.0, lat1=-18.0, lat2=-36.0,
                  false_easting=0.0, false_northing=0.0),
}


def register_aea_grid(epsg: int, grid: AEAGrid) -> None:
    """Register a custom Albers Equal-Area grid so
    :func:`transform_points` / :func:`transform_xy` accept its EPSG code
    — the extension hook for AEA zones not built in (state planes,
    continental analysis grids, ...)."""
    AEA_GRIDS[epsg] = grid


# -- Polar Stereographic ------------------------------------------------------
# Snyder §21 (pp. 160-163) / EPSG Guidance Note 7-2 variants A (scale
# factor at the pole — UPS) and B (standard parallel — the NSIDC sea-ice
# grids). Conformal; shares the conformal-latitude series with LCC.


@dataclass(frozen=True)
class PSGrid:
    """A polar stereographic grid (variant A or B) + datum bridge.

    ``north`` picks the pole aspect. Give EITHER ``lat_ts`` (standard
    parallel, variant B — NSIDC 3413/3031) OR ``k0`` (scale factor at
    the pole, variant A — UPS). ``lon0`` = longitude of origin (the
    down-grid meridian).
    """

    a: float
    f: float
    north: bool
    lon0: float
    false_easting: float
    false_northing: float
    lat_ts: float | None = None
    k0: float | None = None
    helmert_to_wgs84: tuple[float, float, float, float, float, float, float] | None = None

    @property
    def e2(self) -> float:
        return self.f * (2 - self.f)


def _ps_t_scalar(phi: float, e2: float) -> float:
    """Conformal t(φ) for the NORTH aspect (Snyder 15-9) at plan time."""
    e = math.sqrt(e2)
    s = math.sin(phi)
    return math.tan(math.pi / 4 - phi / 2) / ((1 - e * s) / (1 + e * s)) ** (e / 2)


def _ps_scale(g: PSGrid) -> float:
    """Plan-time radial scale K with rho = K * t — variant B from the
    standard parallel (Snyder 21-34), variant A from k0 (21-33)."""
    e2 = g.e2
    e = math.sqrt(e2)
    if g.lat_ts is not None:
        pc = math.radians(abs(g.lat_ts))  # pole-relative
        s = math.sin(pc)
        m_c = math.cos(pc) / math.sqrt(1 - e2 * s * s)
        t_c = _ps_t_scalar(pc, e2)
        return g.a * m_c / t_c
    if g.k0 is None:
        raise ValueError("PSGrid needs lat_ts (variant B) or k0 (variant A)")
    return 2.0 * g.a * g.k0 / math.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e))


def ps_forward(lon: Column, lat: Column, g: PSGrid) -> tuple[Column, Column]:
    """Geodetic (grid datum) -> polar stereographic easting/northing
    (Snyder 21-30..21-34; south aspect via the φ→-φ, λ→-λ symmetry)."""
    k = _ps_scale(g)
    e = math.sqrt(g.e2)
    sgn = 1.0 if g.north else -1.0
    phi = sgn * F.radians(lat)  # pole-relative latitude
    s = F.sin(phi)
    t_c = F.tan(math.pi / 4 - phi / 2) / F.pow((1 - e * s) / (1 + e * s), e / 2)
    rho = k * t_c
    lam = sgn * (F.radians(lon) - math.radians(g.lon0))
    x = rho * F.sin(lam)
    y = -rho * F.cos(lam)
    return sgn * x + g.false_easting, sgn * y + g.false_northing


def ps_inverse(x: Column, y: Column, g: PSGrid) -> tuple[Column, Column]:
    """Polar stereographic easting/northing -> geodetic lon/lat on the
    grid's own datum (Snyder 21-39/21-40 + conformal-latitude series)."""
    k = _ps_scale(g)
    sgn = 1.0 if g.north else -1.0
    dx = sgn * (x - g.false_easting)
    dy = sgn * (y - g.false_northing)
    rho = F.sqrt(dx * dx + dy * dy)
    t_c = rho / k
    chi = math.pi / 2 - 2 * F.atan(t_c)
    e2 = g.e2
    e4, e6, e8 = e2 * e2, e2 * e2 * e2, e2 * e2 * e2 * e2
    phi = (
        chi
        + (e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360) * F.sin(2 * chi)
        + (7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520) * F.sin(4 * chi)
        + (7 * e6 / 120 + 81 * e8 / 1120) * F.sin(6 * chi)
        + (4279 * e8 / 161280) * F.sin(8 * chi)
    )
    # dx/dy are the north-aspect pole-relative plane coords; undo the
    # forward's lam_p = sgn*(lam - lon0), then wrap into (-180, 180] —
    # atan2 folds |lam - lon0| > 180 cases (e.g. the date line opposite
    # lon0) onto the wrong branch otherwise
    lam_p = F.atan2(dx, -dy)
    lam_deg = F.degrees(sgn * lam_p + math.radians(g.lon0))
    lam_wrapped = lam_deg - 360.0 * F.floor((lam_deg + 180.0) / 360.0)
    return lam_wrapped, F.degrees(sgn * phi)


#: EPSG -> polar stereographic grids; extend via :func:`register_ps_grid`.
PS_GRIDS: dict[int, PSGrid] = {
    # NSIDC Sea Ice Polar Stereographic North (WGS84, lat_ts 70N, lon0 -45)
    3413: PSGrid(_A, _F, north=True, lon0=-45.0,
                 false_easting=0.0, false_northing=0.0, lat_ts=70.0),
    # Antarctic Polar Stereographic (WGS84, lat_ts 71S, lon0 0)
    3031: PSGrid(_A, _F, north=False, lon0=0.0,
                 false_easting=0.0, false_northing=0.0, lat_ts=-71.0),
    # Universal Polar Stereographic North / South (variant A, k0=0.994)
    32661: PSGrid(_A, _F, north=True, lon0=0.0,
                  false_easting=2_000_000.0, false_northing=2_000_000.0, k0=0.994),
    32761: PSGrid(_A, _F, north=False, lon0=0.0,
                  false_easting=2_000_000.0, false_northing=2_000_000.0, k0=0.994),
}


def register_ps_grid(epsg: int, grid: PSGrid) -> None:
    """Register a custom polar stereographic grid for
    :func:`transform_points` / :func:`transform_xy`."""
    PS_GRIDS[epsg] = grid


# -- Lambert Azimuthal Equal-Area (oblique aspect) ----------------------------
# Snyder §24 (pp. 182-190): the EU statistical grid (ETRS89-LAEA
# EPSG:3035) and the sphere-based US National Atlas grids. Ellipsoidal
# form via the authalic sphere; e2 == 0 degrades exactly to the
# spherical formulas.


@dataclass(frozen=True)
class LAEAGrid:
    """An oblique Lambert Azimuthal Equal-Area grid + datum bridge.

    ``lat0``/``lon0`` = latitude/longitude of the projection center
    (degrees). ``helmert_to_wgs84`` as in :class:`TMGrid`; None = datum
    is WGS84-equivalent (ETRS89, the National-Atlas sphere, ...).
    """

    a: float
    f: float
    lat0: float
    lon0: float
    false_easting: float
    false_northing: float
    helmert_to_wgs84: tuple[float, float, float, float, float, float, float] | None = None

    @property
    def e2(self) -> float:
        return self.f * (2 - self.f)


def _laea_consts(g: LAEAGrid) -> tuple[float, float, float, float, float]:
    """Plan-time scalars (Rq, D, sin beta1, cos beta1, q_pole) — Snyder
    24-20, 3-11..3-13, 24-17..24-19."""
    e2 = g.e2
    p0 = math.radians(g.lat0)
    q_pole = _aea_q_scalar(math.pi / 2, e2)
    q1 = _aea_q_scalar(p0, e2)
    rq = g.a * math.sqrt(q_pole / 2.0)
    beta1 = math.asin(max(-1.0, min(1.0, q1 / q_pole)))
    s0 = math.sin(p0)
    m1 = math.cos(p0) / math.sqrt(1 - e2 * s0 * s0)
    cos_b1 = math.cos(beta1)
    d = g.a * m1 / (rq * cos_b1) if cos_b1 > 1e-12 else 1.0
    return rq, d, math.sin(beta1), cos_b1, q_pole


def laea_forward(lon: Column, lat: Column, g: LAEAGrid) -> tuple[Column, Column]:
    """Geodetic (grid datum) -> LAEA easting/northing (Snyder
    24-15..24-19: authalic-latitude oblique aspect)."""
    rq, d, sin_b1, cos_b1, q_pole = _laea_consts(g)
    q = _aea_q_col(F.radians(lat), g.e2)
    ratio = F.greatest(F.lit(-1.0), F.least(F.lit(1.0), q / q_pole))
    beta = F.asin(ratio)
    sb, cb = F.sin(beta), F.cos(beta)
    dl = F.radians(lon) - math.radians(g.lon0)
    # B (24-19); the denominator vanishes only at the antipode
    b_den = F.sqrt(
        F.greatest(F.lit(1e-12), 1.0 + sin_b1 * sb + cos_b1 * cb * F.cos(dl))
    )
    b = rq * math.sqrt(2.0) / b_den
    x = b * d * cb * F.sin(dl)
    y = (b / d) * (cos_b1 * sb - sin_b1 * cb * F.cos(dl))
    return x + g.false_easting, y + g.false_northing


def laea_inverse(x: Column, y: Column, g: LAEAGrid) -> tuple[Column, Column]:
    """LAEA easting/northing -> geodetic lon/lat on the grid's own datum
    (Snyder 24-26..24-31 + the authalic-latitude series 3-18)."""
    rq, d, sin_b1, cos_b1, _ = _laea_consts(g)
    dx = (x - g.false_easting) / d
    dy = (y - g.false_northing) * d
    rho = F.sqrt(dx * dx + dy * dy)
    # ce = 2 asin(rho / 2Rq); guard the center point (rho == 0)
    ce = 2.0 * F.asin(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), rho / (2.0 * rq))))
    sce, cce = F.sin(ce), F.cos(ce)
    safe_rho = F.when(rho < 1e-9, F.lit(1.0)).otherwise(rho)
    sb = F.when(rho < 1e-9, F.lit(float(sin_b1))).otherwise(
        cce * sin_b1 + dy * sce * cos_b1 / safe_rho
    )
    sb = F.greatest(F.lit(-1.0), F.least(F.lit(1.0), sb))
    beta = F.asin(sb)
    lam = math.radians(g.lon0) + F.atan2(
        dx * sce, safe_rho * cos_b1 * cce - dy * sin_b1 * sce
    )
    e2 = g.e2
    e4, e6 = e2 * e2, e2 * e2 * e2
    phi = (
        beta
        + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * F.sin(2 * beta)
        + (23 * e4 / 360 + 251 * e6 / 3780) * F.sin(4 * beta)
        + (761 * e6 / 45360) * F.sin(6 * beta)
    )
    lam_deg = F.degrees(lam)
    lam_wrapped = lam_deg - 360.0 * F.floor((lam_deg + 180.0) / 360.0)
    return lam_wrapped, F.degrees(phi)


# authalic sphere of Clarke 1866 — the US National Atlas radius
_ATLAS_SPHERE_A = 6370997.0

#: EPSG -> LAEA grid parameters; extend via :func:`register_laea_grid`.
LAEA_GRIDS: dict[int, LAEAGrid] = {
    # ETRS89-extended / LAEA Europe — the EU statistical grid
    3035: LAEAGrid(*_GRS80, lat0=52.0, lon0=10.0,
                   false_easting=4_321_000.0, false_northing=3_210_000.0),
    # US National Atlas Equal Area (sphere; 2163 deprecated -> 9311)
    2163: LAEAGrid(_ATLAS_SPHERE_A, 0.0, lat0=45.0, lon0=-100.0,
                   false_easting=0.0, false_northing=0.0),
    9311: LAEAGrid(_ATLAS_SPHERE_A, 0.0, lat0=45.0, lon0=-100.0,
                   false_easting=0.0, false_northing=0.0),
}


def register_laea_grid(epsg: int, grid: LAEAGrid) -> None:
    """Register a custom Lambert-Azimuthal-Equal-Area grid for
    :func:`transform_points` / :func:`transform_xy`."""
    LAEA_GRIDS[epsg] = grid


# -- Oblique Stereographic (EPSG method 9809) ---------------------------------
# The "double projection" via a conformal sphere — EPSG Guidance Note
# 7-2 §3.2.6.1 — used by the Dutch national grid (RD New, EPSG:28992)
# and several other European grids. Conformal; the inverse recovers the
# geodetic latitude from the isometric latitude with a fixed-point
# iteration UNROLLED into the expression tree (4 steps, quadratic
# convergence — sub-micrometer at step 3).


@dataclass(frozen=True)
class OSTGrid:
    """An oblique stereographic grid (EPSG 9809) + datum bridge.

    ``lat0``/``lon0`` = latitude/longitude of origin (degrees), ``k0``
    = scale factor at origin. ``helmert_to_wgs84`` as in
    :class:`TMGrid`.
    """

    a: float
    f: float
    lat0: float
    lon0: float
    k0: float
    false_easting: float
    false_northing: float
    helmert_to_wgs84: tuple[float, float, float, float, float, float, float] | None = None

    @property
    def e2(self) -> float:
        return self.f * (2 - self.f)


def _ost_consts(g: OSTGrid) -> tuple[float, float, float, float, float]:
    """Plan-time conformal-sphere constants (R, n, c, sin chi0, cos
    chi0) — EPSG GN7-2 §3.2.6.1."""
    e2 = g.e2
    e = math.sqrt(e2)
    p0 = math.radians(g.lat0)
    s0 = math.sin(p0)
    rho0 = g.a * (1 - e2) / (1 - e2 * s0 * s0) ** 1.5
    nu0 = g.a / math.sqrt(1 - e2 * s0 * s0)
    r = math.sqrt(rho0 * nu0)
    n = math.sqrt(1 + e2 * math.cos(p0) ** 4 / (1 - e2))
    s1 = (1 + s0) / (1 - s0)
    s2 = (1 - e * s0) / (1 + e * s0)
    w1 = (s1 * s2**e) ** n
    sin_chi0 = (w1 - 1) / (w1 + 1)
    c = (n + s0) * (1 - sin_chi0) / ((n - s0) * (1 + sin_chi0))
    w2 = c * w1
    sin_chi0 = (w2 - 1) / (w2 + 1)
    return r, n, c, sin_chi0, math.sqrt(1 - sin_chi0 * sin_chi0)


def ost_forward(lon: Column, lat: Column, g: OSTGrid) -> tuple[Column, Column]:
    """Geodetic (grid datum) -> oblique stereographic easting/northing
    (EPSG 9809 forward)."""
    r, n, c, sin_chi0, cos_chi0 = _ost_consts(g)
    e = math.sqrt(g.e2)
    phi = F.radians(lat)
    s = F.sin(phi)
    sa = (1 + s) / (1 - s)
    sb = (1 - e * s) / (1 + e * s)
    w = c * F.pow(sa * F.pow(sb, e), n)
    sin_chi = (w - 1) / (w + 1)
    cos_chi = F.sqrt(F.greatest(F.lit(0.0), 1.0 - sin_chi * sin_chi))
    dlam = n * (F.radians(lon) - math.radians(g.lon0))
    b = 1.0 + sin_chi * sin_chi0 + cos_chi * cos_chi0 * F.cos(dlam)
    x = 2.0 * r * g.k0 * cos_chi * F.sin(dlam) / b
    y = 2.0 * r * g.k0 * (sin_chi * cos_chi0 - cos_chi * sin_chi0 * F.cos(dlam)) / b
    return x + g.false_easting, y + g.false_northing


def _ost_inverse_seed(x: Column, y: Column, g: OSTGrid) -> tuple[Column, Column, Column]:
    """Stage 1 of the EPSG 9809 inverse: (easting, northing) ->
    (phi seed, isometric latitude psi, longitude in radians)."""
    r, n, c, sin_chi0, _cos_chi0 = _ost_consts(g)
    chi0 = math.asin(sin_chi0)
    gg = 2.0 * r * g.k0 * math.tan(math.pi / 4 - chi0 / 2)
    h = 4.0 * r * g.k0 * math.tan(chi0) + gg
    dx = x - g.false_easting
    dy = y - g.false_northing
    i = F.atan2(dx, h + dy)
    j = F.atan2(dx, gg - dy) - i
    chi = chi0 + 2.0 * F.atan((dy - dx * F.tan(j / 2.0)) / (2.0 * r * g.k0))
    lam = (j + 2.0 * i) / n + math.radians(g.lon0)
    sin_chi = F.sin(chi)
    psi = F.log((1.0 + sin_chi) / (F.lit(float(c)) * (1.0 - sin_chi))) / (2.0 * n)
    phi0 = 2.0 * F.atan(F.exp(psi)) - math.pi / 2
    return phi0, psi, lam


def _ost_iterate(phi: Column, psi: Column, g: OSTGrid) -> Column:
    """One fixed-point step toward the geodetic latitude whose
    isometric latitude equals ``psi`` (EPSG 9809 inverse iteration)."""
    e2 = g.e2
    e = math.sqrt(e2)
    sp = F.sin(phi)
    psi_i = F.log(F.tan(phi / 2.0 + math.pi / 4.0)) - (e / 2.0) * F.log(
        (1.0 + e * sp) / (1.0 - e * sp)
    )
    return phi - (psi_i - psi) * F.cos(phi) * (1.0 - e2 * sp * sp) / (1.0 - e2)


def _ost_finish(phi: Column, lam: Column) -> tuple[Column, Column]:
    lam_deg = F.degrees(lam)
    lam_wrapped = lam_deg - 360.0 * F.floor((lam_deg + 180.0) / 360.0)
    return lam_wrapped, F.degrees(phi)


# quadratic convergence: the seed is ~e²-accurate, 3 steps reach
# float64 round-off for any ellipsoid in use
_OST_ITERS = 3


def ost_inverse(x: Column, y: Column, g: OSTGrid) -> tuple[Column, Column]:
    """Oblique stereographic easting/northing -> geodetic lon/lat on
    the grid's own datum (EPSG 9809 inverse; geodetic latitude from
    the isometric latitude by unrolled fixed-point steps).

    .. warning:: composing the unrolled iteration into ONE Column pair
       grows the Catalyst tree multiplicatively (each step references
       the previous latitude ~6 times). :func:`transform_points`
       applies the identical math as staged projections with a
       linear-size plan — prefer it for data-sized frames; this
       composed form is for literal/one-off expressions.
    """
    phi, psi, lam = _ost_inverse_seed(x, y, g)
    for _ in range(_OST_ITERS):
        phi = _ost_iterate(phi, psi, g)
    return _ost_finish(phi, lam)


def _ost_inverse_stages(g: OSTGrid) -> list:
    """The EPSG 9809 inverse as SEPARATE projection stages (seed, one
    stage per fixed-point step, finish) — linear plan size; used by
    :func:`_transform_stages`."""
    stages = [lambda c, g=g: list(_ost_inverse_seed(c[0], c[1], g))]
    for _ in range(_OST_ITERS):
        stages.append(lambda c, g=g: [_ost_iterate(c[0], c[1], g), c[1], c[2]])
    stages.append(lambda c: list(_ost_finish(c[0], c[2])))
    return stages


# Amersfoort -> WGS84 (position-vector 7-parameter, the standard
# grid-free approximation; the national NTv2/RDNAPTRANS correction is
# more accurate)
_AMERSFOORT_HELMERT = (565.417, 50.3319, 465.552, -0.398957, 0.343988, -1.87740, 4.0725)

#: EPSG -> oblique stereographic grids; extend via :func:`register_ost_grid`.
OST_GRIDS: dict[int, OSTGrid] = {
    # Amersfoort / RD New — the Dutch national grid (Bessel 1841)
    28992: OSTGrid(*_BESSEL_1841,
                   lat0=52.0 + 9.0 / 60 + 22.178 / 3600,
                   lon0=5.0 + 23.0 / 60 + 15.5 / 3600,
                   k0=0.9999079,
                   false_easting=155_000.0, false_northing=463_000.0,
                   helmert_to_wgs84=_AMERSFOORT_HELMERT),
}


def register_ost_grid(epsg: int, grid: OSTGrid) -> None:
    """Register a custom oblique stereographic (EPSG 9809) grid for
    :func:`transform_points` / :func:`transform_xy`."""
    OST_GRIDS[epsg] = grid


# -- Mollweide (world equal-area) ---------------------------------------------
# Snyder §31 (pp. 249-252), spherical — the convention PROJ uses for
# +proj=moll with an ellipsoid: sphere radius = the semi-major axis.
# Forward solves 2t + sin 2t = pi sin(phi) by Newton steps (quadratic;
# staged through the projection machinery like the 9809 inverse);
# the inverse is closed-form.


@dataclass(frozen=True)
class MollweideGrid:
    """A Mollweide world grid (sphere radius ``r``, central meridian
    ``lon0``). ``helmert_to_wgs84`` kept for interface parity (world
    grids are WGS84-based in practice)."""

    r: float
    lon0: float
    false_easting: float = 0.0
    false_northing: float = 0.0
    helmert_to_wgs84: tuple[float, float, float, float, float, float, float] | None = None

    # interface parity with the ellipsoidal grids (Helmert bridge math)
    @property
    def a(self) -> float:
        return self.r

    @property
    def e2(self) -> float:
        return 0.0


_MOLL_ITERS = 7  # Newton stalls to linear near the poles; 7 staged steps


def _moll_seed(lon: Column, lat: Column, g: MollweideGrid) -> tuple[Column, Column, Column]:
    """(theta seed, pi*sin(phi), delta-lon) — Newton target carried
    through the iteration stages.

    Near the poles the Newton root has multiplicity 3 (f(t) ~ pi -
    (4/3)(pi/2 - t)^3) and plain Newton converges only linearly at
    factor 2/3, so for |sin phi| > 0.995 the seed is the analytic
    cube-root solution of that limiting cubic — accurate to O(u^2)
    relative, which the remaining steps polish."""
    phi = F.radians(lat)
    dlam = F.radians(lon) - math.radians(g.lon0)
    target = math.pi * F.sin(phi)
    u = F.cbrt(3.0 * (math.pi - F.abs(target)) / 4.0)
    pole_seed = F.signum(phi) * (math.pi / 2 - u)
    seed = F.when(F.abs(F.sin(phi)) > 0.995, pole_seed).otherwise(phi)
    return seed, target, dlam


def _moll_iterate(theta: Column, target: Column) -> Column:
    """One Newton step on f(t) = 2t + sin 2t - target; the pole
    (denominator -> 0) is already the fixpoint there, so freeze it."""
    den = 2.0 + 2.0 * F.cos(2.0 * theta)
    step = (2.0 * theta + F.sin(2.0 * theta) - target) / F.greatest(den, F.lit(1e-9))
    # |theta| can only move toward the pole; clamp into [-pi/2, pi/2]
    t = theta - step
    return F.greatest(F.lit(-math.pi / 2), F.least(F.lit(math.pi / 2), t))


def _moll_finish(theta: Column, dlam: Column, g: MollweideGrid) -> tuple[Column, Column]:
    x = (2.0 * math.sqrt(2.0) / math.pi) * g.r * dlam * F.cos(theta)
    y = math.sqrt(2.0) * g.r * F.sin(theta)
    return x + g.false_easting, y + g.false_northing


def moll_forward(lon: Column, lat: Column, g: MollweideGrid) -> tuple[Column, Column]:
    """Geodetic -> Mollweide (composed form, for transform_xy-style
    Column usage; :func:`transform_points` stages the same math across
    projections).

    Runs the SAME ``_MOLL_ITERS`` Newton steps as the staged path so
    both public paths agree bit-for-bit — a 5-vs-7 step divergence
    previously returned slightly different coordinates for identical
    input. Naively composing 7 steps would substitute theta ~4x per
    step (a 4^7-leaf expression tree that stalls analysis), so the
    iteration folds through ONE ``F.aggregate`` lambda instead: the
    accumulator is a bound variable, evaluated iteratively at runtime,
    keeping the expression linear in ``_MOLL_ITERS``."""
    theta0, target, dlam = _moll_seed(lon, lat, g)
    folded = F.aggregate(
        F.array_repeat(F.lit(1), _MOLL_ITERS),
        F.struct(theta0.alias("t"), target.alias("tg")),
        lambda a, _: F.struct(_moll_iterate(a["t"], a["tg"]).alias("t"), a["tg"].alias("tg")),
    )
    return _moll_finish(folded["t"], dlam, g)


def _moll_forward_stages(g: MollweideGrid) -> list:
    stages = [lambda c, g=g: list(_moll_seed(c[0], c[1], g))]
    for _ in range(_MOLL_ITERS):
        stages.append(lambda c: [_moll_iterate(c[0], c[1]), c[1], c[2]])
    stages.append(lambda c, g=g: list(_moll_finish(c[0], c[2], g)))
    return stages


def moll_inverse(x: Column, y: Column, g: MollweideGrid) -> tuple[Column, Column]:
    """Mollweide -> geodetic (closed form, Snyder 31-6..31-8)."""
    dy = (y - g.false_northing) / (math.sqrt(2.0) * g.r)
    theta = F.asin(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), dy)))
    sphi = (2.0 * theta + F.sin(2.0 * theta)) / math.pi
    phi = F.asin(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), sphi)))
    cos_t = F.cos(theta)
    dlam = F.when(
        cos_t < 1e-12, F.lit(0.0)
    ).otherwise(
        math.pi * (x - g.false_easting) / (2.0 * math.sqrt(2.0) * g.r * cos_t)
    )
    lam_deg = F.degrees(dlam + math.radians(g.lon0))
    lam_wrapped = lam_deg - 360.0 * F.floor((lam_deg + 180.0) / 360.0)
    return lam_wrapped, F.degrees(phi)


#: ESRI/EPSG codes -> Mollweide grids; extend via :func:`register_moll_grid`.
MOLL_GRIDS: dict[int, MollweideGrid] = {
    # ESRI:54009 World Mollweide (WGS84; PROJ spherical convention R = a)
    54009: MollweideGrid(r=_A, lon0=0.0),
}


def register_moll_grid(epsg: int, grid: MollweideGrid) -> None:
    """Register a custom Mollweide grid for :func:`transform_points` /
    :func:`transform_xy`."""
    MOLL_GRIDS[epsg] = grid


# -- Equidistant Cylindrical (EPSG method 1028) --------------------------------
# World Equidistant Cylindrical (EPSG:4087) and Plate-Carrée-style
# grids: x is linear in longitude at the standard parallel's normal
# radius, y is the ellipsoidal meridian arc — both closed-form (the
# inverse reuses the TM footpoint rectifying series), so no staging.


@dataclass(frozen=True)
class EQCGrid:
    """An equidistant cylindrical grid (EPSG 1028) + datum bridge.

    ``lat1`` = latitude of the first standard parallel (degrees),
    ``lon0`` = longitude of origin. ``helmert_to_wgs84`` as in
    :class:`TMGrid`.
    """

    a: float
    f: float
    lat1: float
    lon0: float
    false_easting: float
    false_northing: float
    helmert_to_wgs84: tuple[float, float, float, float, float, float, float] | None = None

    @property
    def e2(self) -> float:
        return self.f * (2 - self.f)


def _eqc_nu1_cos(g: EQCGrid) -> float:
    s1 = math.sin(math.radians(g.lat1))
    return g.a / math.sqrt(1 - g.e2 * s1 * s1) * math.cos(math.radians(g.lat1))


def eqc_forward(lon: Column, lat: Column, g: EQCGrid) -> tuple[Column, Column]:
    """Geodetic lon/lat (degrees, grid datum) -> easting/northing
    (EPSG GN7-2 §3.5.3: E = nu1 cos(lat1) (lam - lam0), N = M(phi))."""
    x = _eqc_nu1_cos(g) * (F.radians(lon) - math.radians(g.lon0))
    y = _arc(F.radians(lat), g.a, g.e2)
    return x + g.false_easting, y + g.false_northing


def eqc_inverse(x: Column, y: Column, g: EQCGrid) -> tuple[Column, Column]:
    """Easting/northing -> geodetic lon/lat on the grid's own datum
    (meridian-arc inversion via the rectifying-latitude series —
    closed form, same series as the TM footpoint)."""
    a_, e2 = g.a, g.e2
    lam = (x - g.false_easting) / _eqc_nu1_cos(g) + math.radians(g.lon0)
    e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    mu = (y - g.false_northing) / (a_ * (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256))
    phi = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * F.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * F.sin(4 * mu)
        + (151 * e1**3 / 96) * F.sin(6 * mu)
        + (1097 * e1**4 / 512) * F.sin(8 * mu)
    )
    return F.degrees(lam), F.degrees(phi)


#: EPSG -> equidistant cylindrical grids; extend via :func:`register_eqc_grid`.
EQC_GRIDS: dict[int, EQCGrid] = {
    # WGS84 / World Equidistant Cylindrical
    4087: EQCGrid(_A, _F, lat1=0.0, lon0=0.0,
                  false_easting=0.0, false_northing=0.0),
}


def register_eqc_grid(epsg: int, grid: EQCGrid) -> None:
    """Register a custom equidistant cylindrical grid for
    :func:`transform_points` / :func:`transform_xy`."""
    EQC_GRIDS[epsg] = grid


# -- Krovak (oblique conformal conic, EPSG methods 9819/1041) ------------------
# The Czech/Slovak national grid (S-JTSK). EPSG Guidance Note 7-2
# §3.2.8: a conformal conic on an OBLIQUE cone whose axis passes
# through a pseudo pole; forward is closed-form, the inverse recovers
# geodetic latitude from the conformal-sphere latitude U by the
# EPSG fixed-point iteration (3 steps, staged like the 9809 inverse).
# EPSG 5514 ("Krovak East North") negates the native southing/westing
# axes so coordinates behave as ordinary (easting, northing) — both
# axis conventions are supported via ``east_north``.


@dataclass(frozen=True)
class KrovakGrid:
    """A Krovak grid + datum bridge.

    ``lat_c``/``lon0`` = latitude of projection centre / longitude of
    origin (degrees, Greenwich); ``alpha_c`` = co-latitude of the cone
    axis; ``lat_p`` = latitude of the pseudo standard parallel; ``k_p``
    = scale factor on it. ``east_north=True`` (EPSG 1041, CRS 5514)
    emits (-westing, -southing); ``False`` (EPSG 9819) emits the native
    (southing, westing) pair. ``helmert_to_wgs84`` as in
    :class:`TMGrid`.
    """

    a: float
    f: float
    lat_c: float
    lon0: float
    alpha_c: float
    lat_p: float
    k_p: float
    false_easting: float
    false_northing: float
    east_north: bool = True
    helmert_to_wgs84: tuple[float, float, float, float, float, float, float] | None = None

    @property
    def e2(self) -> float:
        return self.f * (2 - self.f)


def _krovak_consts(g: KrovakGrid) -> tuple[float, float, float, float, float]:
    """Plan-time constants (B, t0, n, r0, e) — EPSG GN7-2 §3.2.8."""
    e2 = g.e2
    e = math.sqrt(e2)
    pc = math.radians(g.lat_c)
    sc = math.sin(pc)
    b = math.sqrt(1 + e2 * math.cos(pc) ** 4 / (1 - e2))
    a_ = g.a * math.sqrt(1 - e2) / (1 - e2 * sc * sc)
    gamma0 = math.asin(sc / b)
    t0 = (
        math.tan(math.pi / 4 + gamma0 / 2)
        * ((1 + e * sc) / (1 - e * sc)) ** (e * b / 2)
        / math.tan(math.pi / 4 + pc / 2) ** b
    )
    pp = math.radians(g.lat_p)
    n = math.sin(pp)
    r0 = g.k_p * a_ / math.tan(pp)
    return b, t0, n, r0, e


def krovak_forward(lon: Column, lat: Column, g: KrovakGrid) -> tuple[Column, Column]:
    """Geodetic lon/lat (degrees, on the grid's own datum) -> grid
    coordinates (EPSG 9819 forward; 1041 axis flip when
    ``east_north``)."""
    b, t0, n, r0, e = _krovak_consts(g)
    alpha = math.radians(g.alpha_c)
    pp = math.radians(g.lat_p)
    phi, lam = F.radians(lat), F.radians(lon)
    sp = F.sin(phi)
    u = 2 * (
        F.atan(
            t0
            * F.pow(F.tan(phi / 2 + math.pi / 4), b)
            / F.pow((1 + e * sp) / (1 - e * sp), e * b / 2)
        )
        - math.pi / 4
    )
    v = b * (math.radians(g.lon0) - lam)
    t_ = F.asin(math.cos(alpha) * F.sin(u) + math.sin(alpha) * F.cos(u) * F.cos(v))
    d = F.asin(F.cos(u) * F.sin(v) / F.cos(t_))
    theta = n * d
    r = r0 * math.tan(math.pi / 4 + pp / 2) ** n / F.pow(F.tan(t_ / 2 + math.pi / 4), n)
    southing = r * F.cos(theta)
    westing = r * F.sin(theta)
    if g.east_north:
        return -westing + g.false_easting, -southing + g.false_northing
    return southing + g.false_easting, westing + g.false_northing


def _krovak_inverse_seed(x: Column, y: Column, g: KrovakGrid) -> tuple[Column, Column]:
    """(x, y) -> (U', lambda) — everything before the latitude
    iteration (EPSG GN7-2 §3.2.8 inverse)."""
    b, t0, n, r0, e = _krovak_consts(g)
    alpha = math.radians(g.alpha_c)
    pp = math.radians(g.lat_p)
    if g.east_north:
        southing = -(y - g.false_northing)
        westing = -(x - g.false_easting)
    else:
        southing = x - g.false_easting
        westing = y - g.false_northing
    r = F.sqrt(southing * southing + westing * westing)
    theta = F.atan2(westing, southing)
    d = theta / n
    t_ = 2 * (
        F.atan(F.pow(F.lit(r0) / r, 1.0 / n) * math.tan(math.pi / 4 + pp / 2))
        - math.pi / 4
    )
    u = F.asin(math.cos(alpha) * F.sin(t_) - math.sin(alpha) * F.cos(t_) * F.cos(d))
    v = F.asin(F.cos(t_) * F.sin(d) / F.cos(u))
    lam = math.radians(g.lon0) - v / b
    return u, lam


_KROVAK_ITERS = 3  # EPSG-prescribed fixed-point count (quadratic)


def _krovak_iterate(phi: Column, u: Column, g: KrovakGrid) -> Column:
    """One latitude fixed-point step: phi_j from (U', phi_{j-1})."""
    b, t0, n, r0, e = _krovak_consts(g)
    sp = F.sin(phi)
    return 2 * (
        F.atan(
            t0 ** (-1.0 / b)
            * F.pow(F.tan(u / 2 + math.pi / 4), 1.0 / b)
            * F.pow((1 + e * sp) / (1 - e * sp), e / 2)
        )
        - math.pi / 4
    )


def krovak_inverse(x: Column, y: Column, g: KrovakGrid) -> tuple[Column, Column]:
    """Krovak grid coordinates -> geodetic lon/lat on the grid's own
    datum.

    .. warning:: the composed form unrolls the latitude iteration into
       one expression (each step references the previous latitude
       twice); :func:`transform_points` applies the identical math as
       staged projections — prefer it for data-sized frames.
    """
    u, lam = _krovak_inverse_seed(x, y, g)
    phi = u
    for _ in range(_KROVAK_ITERS):
        phi = _krovak_iterate(phi, u, g)
    return F.degrees(lam), F.degrees(phi)


def _krovak_inverse_stages(g: KrovakGrid) -> list:
    """The Krovak inverse as SEPARATE projection stages (seed, one per
    fixed-point step, finish) — linear plan size; used by
    :func:`_transform_stages` like the 9809 inverse."""
    stages = [lambda c, g=g: [*_krovak_inverse_seed(c[0], c[1], g)]]
    stages.append(lambda c: [c[0], c[1], c[0]])  # phi_0 = U'
    for _ in range(_KROVAK_ITERS):
        stages.append(lambda c, g=g: [c[0], c[1], _krovak_iterate(c[2], c[0], g)])
    stages.append(lambda c: [F.degrees(c[1]), F.degrees(c[2])])
    return stages


# S-JTSK -> WGS84 (the standard published 7-parameter position-vector
# set, ~1 m; national grid corrections are more accurate)
_SJTSK_HELMERT = (570.8, 85.7, 462.8, 4.998, 1.587, 5.261, 3.56)

#: EPSG -> Krovak grids; extend via :func:`register_krovak_grid`.
KROVAK_GRIDS: dict[int, KrovakGrid] = {
    # S-JTSK / Krovak East North — the Czech/Slovak national grid
    5514: KrovakGrid(*_BESSEL_1841,
                     lat_c=49.5,
                     lon0=24.0 + 50.0 / 60.0,
                     alpha_c=30.0 + 17.0 / 60.0 + 17.30311 / 3600.0,
                     lat_p=78.5, k_p=0.9999,
                     false_easting=0.0, false_northing=0.0,
                     east_north=True, helmert_to_wgs84=_SJTSK_HELMERT),
    # S-JTSK / Krovak (native southing/westing axes, method 9819)
    5513: KrovakGrid(*_BESSEL_1841,
                     lat_c=49.5,
                     lon0=24.0 + 50.0 / 60.0,
                     alpha_c=30.0 + 17.0 / 60.0 + 17.30311 / 3600.0,
                     lat_p=78.5, k_p=0.9999,
                     false_easting=0.0, false_northing=0.0,
                     east_north=False, helmert_to_wgs84=_SJTSK_HELMERT),
}


def register_krovak_grid(epsg: int, grid: KrovakGrid) -> None:
    """Register a custom Krovak grid for :func:`transform_points` /
    :func:`transform_xy`."""
    KROVAK_GRIDS[epsg] = grid


def _get_grid(epsg: int):
    """Combined grid registry lookup (TM, LCC, AEA, PS, LAEA, OST,
    Mollweide)."""
    for reg in (TM_GRIDS, LCC_GRIDS, AEA_GRIDS, PS_GRIDS, LAEA_GRIDS, OST_GRIDS,
                MOLL_GRIDS, KROVAK_GRIDS, EQC_GRIDS):
        g = reg.get(epsg)
        if g is not None:
            return g
    return None


def _grid_forward(lon: Column, lat: Column, g) -> tuple[Column, Column]:
    if isinstance(g, LCCGrid):
        return lcc_forward(lon, lat, g)
    if isinstance(g, AEAGrid):
        return aea_forward(lon, lat, g)
    if isinstance(g, PSGrid):
        return ps_forward(lon, lat, g)
    if isinstance(g, LAEAGrid):
        return laea_forward(lon, lat, g)
    if isinstance(g, OSTGrid):
        return ost_forward(lon, lat, g)
    if isinstance(g, MollweideGrid):
        return moll_forward(lon, lat, g)
    if isinstance(g, KrovakGrid):
        return krovak_forward(lon, lat, g)
    if isinstance(g, EQCGrid):
        return eqc_forward(lon, lat, g)
    return tm_forward(lon, lat, g)


def _grid_inverse(x: Column, y: Column, g) -> tuple[Column, Column]:
    if isinstance(g, LCCGrid):
        return lcc_inverse(x, y, g)
    if isinstance(g, AEAGrid):
        return aea_inverse(x, y, g)
    if isinstance(g, PSGrid):
        return ps_inverse(x, y, g)
    if isinstance(g, LAEAGrid):
        return laea_inverse(x, y, g)
    if isinstance(g, OSTGrid):
        return ost_inverse(x, y, g)
    if isinstance(g, MollweideGrid):
        return moll_inverse(x, y, g)
    if isinstance(g, KrovakGrid):
        return krovak_inverse(x, y, g)
    if isinstance(g, EQCGrid):
        return eqc_inverse(x, y, g)
    return tm_inverse(x, y, g)


def _grid_to_wgs84(x: Column, y: Column, g) -> tuple[Column, Column]:
    """TM or LCC grid coords -> WGS84 lon/lat (Helmert-bridged if needed)."""
    lon, lat = _grid_inverse(x, y, g)
    if g.helmert_to_wgs84 is None:
        return lon, lat
    gx, gy, gz = _geodetic_to_xyz(lon, lat, g.a, g.e2)
    wx, wy, wz = _helmert(gx, gy, gz, g.helmert_to_wgs84)
    return _xyz_to_geodetic(wx, wy, wz, _A, _E2)


def _wgs84_to_grid(lon: Column, lat: Column, g) -> tuple[Column, Column]:
    """WGS84 lon/lat -> TM or LCC grid coords (Helmert-bridged if needed)."""
    if g.helmert_to_wgs84 is not None:
        wx, wy, wz = _geodetic_to_xyz(lon, lat, _A, _E2)
        gx, gy, gz = _helmert(wx, wy, wz, g.helmert_to_wgs84, invert=True)
        lon, lat = _xyz_to_geodetic(gx, gy, gz, g.a, g.e2)
    return _grid_forward(lon, lat, g)


def _transform_stages(src_epsg: int, dst_epsg: int):
    """The src->dst coordinate pipeline as a LIST of column-list stages.

    Composing the whole datum-bridged chain into one Column pair
    (transform_xy style) blows the Catalyst tree up multiplicatively —
    each stage references the previous stage's giant expression 10-20
    times (series terms, Bowring trig), so three nested stages copy the
    base tree thousands of times and analysis OOMs. Applying the stages
    as SEPARATE projections keeps the plan linear: CollapseProject
    refuses to merge projections whose aliases are non-cheap and
    multiply referenced, so each stage is evaluated once per row.
    Returns None when the pair needs no staging (plain dispatcher path).
    """
    gs = _get_grid(src_epsg)
    gd = _get_grid(dst_epsg)
    if gs is None and gd is None:
        return None
    # plan-time probe: if the non-grid side has no built-in transform, the
    # staged lambdas would raise NotImplementedError deep inside
    # _apply_stages — bypassing transform_xy's pyproj fallback. Probe the
    # dispatcher with dummy literals NOW and return None for such mixed
    # pairs so the whole pair routes through transform_xy (which catches
    # NotImplementedError and dispatches to the pyproj Arrow UDF).
    if gs is None:
        try:
            _to_wgs84(F.lit(0.0), F.lit(0.0), src_epsg)
        except NotImplementedError:
            return None
    if gd is None:
        try:
            _from_wgs84(F.lit(0.0), F.lit(0.0), dst_epsg)
        except NotImplementedError:
            return None
    stages = []
    if gs is not None:
        if isinstance(gs, OSTGrid):
            # the 9809 inverse iterates; one composed expression grows
            # multiplicatively (measured OOM) — stage each step
            stages.extend(_ost_inverse_stages(gs))
        elif isinstance(gs, KrovakGrid):
            # the Krovak latitude recovery iterates too — same staging
            stages.extend(_krovak_inverse_stages(gs))
        else:
            stages.append(lambda c, g=gs: list(_grid_inverse(c[0], c[1], g)))
        if gs.helmert_to_wgs84 is not None:
            stages.append(lambda c, g=gs: list(_geodetic_to_xyz(c[0], c[1], g.a, g.e2)))
            stages.append(lambda c, g=gs: list(_helmert(c[0], c[1], c[2], g.helmert_to_wgs84)))
            stages.append(lambda c: list(_xyz_to_geodetic(c[0], c[1], c[2], _A, _E2)))
    else:
        stages.append(lambda c: list(_to_wgs84(c[0], c[1], src_epsg)))
    if gd is not None:
        if gd.helmert_to_wgs84 is not None:
            stages.append(lambda c: list(_geodetic_to_xyz(c[0], c[1], _A, _E2)))
            stages.append(
                lambda c, g=gd: list(_helmert(c[0], c[1], c[2], g.helmert_to_wgs84, invert=True))
            )
            stages.append(lambda c, g=gd: list(_xyz_to_geodetic(c[0], c[1], c[2], g.a, g.e2)))
        if isinstance(gd, MollweideGrid):
            # the Mollweide forward iterates; stage each Newton step
            stages.extend(_moll_forward_stages(gd))
        else:
            stages.append(lambda c, g=gd: list(_grid_forward(c[0], c[1], g)))
    else:
        stages.append(lambda c: list(_from_wgs84(c[0], c[1], dst_epsg)))
    return stages


def _apply_stages(df: DataFrame, stages, in_cols: list[Column]) -> tuple[DataFrame, list[str]]:
    """Run the stage chain over ``df`` as successive projections on
    temporary columns; returns (df, [x_col_name, y_col_name])."""
    names = []
    cur = list(in_cols)
    for si, fn in enumerate(stages):
        outs = fn([F.col(n) for n in names] if names else cur)
        names = [f"__crs_{si}_{j}" for j in range(len(outs))]
        df = df.withColumns({n: c for n, c in zip(names, outs)})
    return df, names[:2]


# -- dispatcher ---------------------------------------------------------------

def _to_wgs84(x: Column, y: Column, epsg: int) -> tuple[Column, Column]:
    if is_geographic(epsg):
        return x, y
    if epsg == WEB_MERCATOR:
        return web_mercator_to_wgs84(x, y)
    if epsg == CH1903:
        return ch1903_to_wgs84(x, y)
    if epsg == CH1903_PLUS:
        return ch1903_to_wgs84(x - 2000000.0, y - 1000000.0)
    z = _utm_zone(epsg)
    if z is not None:
        zone, north = z
        return utm_to_wgs84(x, y if north else y - 10000000.0, zone)
    g = _get_grid(epsg)
    if g is not None:
        return _grid_to_wgs84(x, y, g)
    raise NotImplementedError(
        f"EPSG:{epsg} has no built-in transform; register_tm_grid() / "
        f"register_lcc_grid() / register_aea_grid() / register_ps_grid() / "
        f"register_laea_grid() / register_ost_grid() / register_moll_grid() / "
        f"register_krovak_grid() / register_eqc_grid() "
        f"cover most national grids, or install pyproj for arbitrary CRS support"
    )


def _from_wgs84(lon: Column, lat: Column, epsg: int) -> tuple[Column, Column]:
    if is_geographic(epsg):
        return lon, lat
    if epsg == WEB_MERCATOR:
        return wgs84_to_web_mercator(lon, lat)
    if epsg == CH1903:
        return wgs84_to_ch1903(lon, lat)
    if epsg == CH1903_PLUS:
        e, n = wgs84_to_ch1903(lon, lat)
        return e + 2000000.0, n + 1000000.0
    z = _utm_zone(epsg)
    if z is not None:
        zone, north = z
        x, y = wgs84_to_utm(lon, lat, zone)
        return x, (y if north else y + 10000000.0)
    g = _get_grid(epsg)
    if g is not None:
        return _wgs84_to_grid(lon, lat, g)
    raise NotImplementedError(
        f"EPSG:{epsg} has no built-in transform; register_tm_grid() / "
        f"register_lcc_grid() / register_aea_grid() / register_ps_grid() / "
        f"register_laea_grid() / register_ost_grid() / register_moll_grid() / "
        f"register_krovak_grid() / register_eqc_grid() "
        f"cover most national grids, or install pyproj for arbitrary CRS support"
    )


def transform_xy(x: Column, y: Column, src_epsg: int, dst_epsg: int) -> tuple[Column, Column]:
    """Coordinate pair from src to dst CRS, WGS84 as the hub. Pure
    column expressions for the built-in systems; pyproj Arrow UDF for
    everything else when available.

    .. warning:: For datum-bridged national grids (``TM_GRIDS`` entries
       carrying a Helmert transform — EPSG:27700, 31466-69, the LCC
       grids, ...) this composes the full TM/LCC + Helmert + Bowring
       chain into ONE Column pair. Each stage references the previous
       stage's expression 10-20 times, so the Catalyst tree grows
       multiplicatively and analysis can OOM on wide plans. Prefer
       :func:`transform_points`, which applies the identical math as
       staged projections with a linear-size plan.
    """
    try:
        lon, lat = _to_wgs84(x, y, src_epsg)
        out = _from_wgs84(lon, lat, dst_epsg)
    except NotImplementedError:
        return _pyproj_transform(x, y, src_epsg, dst_epsg)
    # warn only when the composed chain is actually returned (the pyproj
    # fallback above ships the whole pair to one Arrow UDF instead)
    for _e in (src_epsg, dst_epsg):
        _g = _get_grid(_e)
        if _g is not None and _g.helmert_to_wgs84 is not None:
            import warnings

            warnings.warn(
                f"transform_xy composes the datum-bridged EPSG:{_e} chain into one "
                "Column expression whose Catalyst tree grows multiplicatively; "
                "prefer transform_points() for datum-bridged grids",
                RuntimeWarning,
                stacklevel=2,
            )
            break
    return out


def transform_points(
    df: DataFrame, src_epsg: int, dst_epsg: int, geom_cols: tuple[str, ...] = ("geom",)
) -> DataFrame:
    """Reproject ``struct<lon,lat>`` geometry columns in place. The
    struct keeps its field names — downstream operators address
    ``geom.lon``/``geom.lat`` regardless of CRS, with the CRS carried as
    metadata by convention (model/schemas). Datum-bridged national
    grids (TM_GRIDS) run as STAGED projections — see
    :func:`_transform_stages` for why the one-expression composition
    cannot be used there.
    """
    if src_epsg == dst_epsg:
        return df
    stages = _transform_stages(src_epsg, dst_epsg)
    out = df
    for g in geom_cols:
        if g not in out.columns:
            continue
        is_array = dict(out.dtypes)[g].startswith("array")
        if stages is None:
            if is_array:
                # linestring: per-vertex transform inside the array
                out = out.withColumn(
                    g,
                    F.transform(
                        F.col(g),
                        lambda p: F.struct(
                            transform_xy(p["lon"], p["lat"], src_epsg, dst_epsg)[0].alias("lon"),
                            transform_xy(p["lon"], p["lat"], src_epsg, dst_epsg)[1].alias("lat"),
                        ),
                    ),
                )
            else:
                nx, ny = transform_xy(F.col(g)["lon"], F.col(g)["lat"], src_epsg, dst_epsg)
                out = out.withColumn(g, F.struct(nx.alias("lon"), ny.alias("lat")))
            continue
        if is_array:
            # per-vertex staging can't run inside a lambda; explode to
            # rows keyed by a per-row id + vertex index, stage, rebuild
            # in order (one extra exchange — the price of a datum-
            # bridged linestring reprojection)
            col_order = list(out.columns)
            others = [c for c in col_order if c != g]
            keyed = out.withColumn("__crs_rid", F.monotonically_increasing_id()).withColumn(
                "__crs_gnull", F.col(g).isNull()
            )
            ex = keyed.select(
                "__crs_rid",
                "__crs_gnull",
                *others,
                F.posexplode_outer(F.col(g)).alias("__crs_pos", "__crs_p"),
            )
            ex, (xn, yn) = _apply_stages(
                ex, stages, [F.col("__crs_p")["lon"], F.col("__crs_p")["lat"]]
            )
            ex = ex.withColumn(
                "__crs_np",
                F.when(
                    F.col("__crs_p").isNotNull(),
                    F.struct(F.col(xn).alias("lon"), F.col(yn).alias("lat")),
                ),
            )
            rebuilt = ex.groupBy("__crs_rid").agg(
                *[F.first(c).alias(c) for c in others],
                F.first("__crs_gnull").alias("__crs_gnull"),
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                F.col("__crs_pos").isNotNull(),
                                F.struct(F.col("__crs_pos"), F.col("__crs_np").alias("p")),
                            )
                        )
                    ),
                    lambda s: s["p"],
                ).alias(g),
            )
            # a NULL source array must come back NULL, not empty — the
            # posexplode_outer row for it carries NULL pos, which the
            # collect_list filter drops, collapsing NULL to [] otherwise
            rebuilt = rebuilt.withColumn(
                g, F.when(~F.col("__crs_gnull"), F.col(g))
            )
            out = rebuilt.select(*col_order)
        else:
            out, (xn, yn) = _apply_stages(
                out, stages, [F.col(g)["lon"], F.col(g)["lat"]]
            )
            out = out.withColumn(g, F.struct(F.col(xn).alias("lon"), F.col(yn).alias("lat")))
            out = out.drop(*[c for c in out.columns if c.startswith("__crs_")])
    return out


def _pyproj_transform(x: Column, y: Column, src_epsg: int, dst_epsg: int) -> tuple[Column, Column]:
    try:
        import pyproj  # noqa: F401
    except ImportError as exc:  # pragma: no cover - pyproj absent here
        raise NotImplementedError(
            f"EPSG:{src_epsg}->EPSG:{dst_epsg} needs pyproj, which is not installed"
        ) from exc

    import pandas as pd  # pragma: no cover - exercised only with pyproj
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StructType([T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]))
    def _tx(xs: pd.Series, ys: pd.Series) -> pd.DataFrame:
        from pyproj import Transformer

        tr = Transformer.from_crs(src_epsg, dst_epsg, always_xy=True)
        ox, oy = tr.transform(xs.to_numpy(), ys.to_numpy())
        return pd.DataFrame({"x": ox, "y": oy})

    res = _tx(x, y)
    return res["x"], res["y"]
