"""Map and modal-split plotting over Spark entity DataFrames.

Reference: visualization/plotting.py:16-123 (figure helpers), :126-158
(OSM basemap), :161-323 (``plot``), :326-450 (``plot_modal_split``).

The reference plots GeoDataFrames already sitting in driver memory. At
engine scale the input DataFrame can be arbitrarily large, so the
contract here splits in two:

1. :func:`prepare_plot_layers` — the DISTRIBUTED step. Reprojects to
   WGS84 (mirror of ``_prepare_frames``, reference :161-185), computes
   the map bounds with one aggregate per frame (mirror of
   ``_calculate_bounds`` :188-225 — same frame priority and 0.03-degree
   pad), and decimates each layer to a bounded row count with a
   deterministic hash top-k BEFORE anything reaches the driver. What
   comes back is a few thousand plot-ready rows, never the data.
2. :func:`plot` / :func:`plot_modal_split` — driver-side rendering of
   those bounded layers. matplotlib is optional (absent in this
   container): rendering raises a clear ``ImportError`` while the layer
   preparation stays fully functional and tested.

Deviation from the reference: staypoint/location circle radii are
converted meters→degrees at the latitude midpoint of the DATA bounds
(reference :231-259 uses the axis midpoint, which equals the data
midpoint whenever the axes frame the data). OSM street basemaps
(reference :126-158) need osmnx + network access — ``plot_osm=True``
raises ``NotImplementedError``.
"""

from __future__ import annotations

import logging
import math
from dataclasses import dataclass
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trackintel_spark.geogr.crs import WGS84, transform_points

_LOG = logging.getLogger(__name__)

#: bound on rows shipped to the driver per layer; a figure has no use
#: for more marks than it has pixels.
DEFAULT_MAX_ROWS = 20_000


def _require_matplotlib():
    try:
        import matplotlib  # noqa: F401
        import matplotlib.pyplot as plt  # noqa: F401

        return matplotlib, plt
    except ImportError as exc:  # pragma: no cover - matplotlib absent here
        raise ImportError(
            "matplotlib is required for rendering; prepare_plot_layers / "
            "modal_split_frame provide the plot-ready data without it"
        ) from exc


# -- figure helpers (reference :16-123) --------------------------------------


def a4_figsize(fig_height_mm: float | None = None, columns: float = 2) -> tuple[float, float]:
    """Width/height in inches for an A4-fitting figure.

    Pure arithmetic port of reference :16-60 (Springer artwork sizes,
    golden-ratio height, 234 mm cap) — no matplotlib needed.
    """
    if columns == 1:
        fig_width_mm = 84.0
    elif columns == 1.5:
        fig_width_mm = 129.0
    elif columns == 2.0:
        fig_width_mm = 174.0
    else:
        raise ValueError

    if fig_height_mm is None:
        golden_mean = (math.sqrt(5.0) - 1.0) / 2.0
        fig_height_mm = fig_width_mm * golden_mean

    max_fig_height_mm = 234.0
    if fig_height_mm > max_fig_height_mm:
        _LOG.warning("fig_height too large: %s, reducing to %s", fig_height_mm, max_fig_height_mm)
        fig_height_mm = max_fig_height_mm

    inch = 1 / 25.4
    return fig_width_mm * inch, fig_height_mm * inch


def regular_figure():
    """Readability rc params + empty figure (reference :63-89)."""
    matplotlib, plt = _require_matplotlib()
    params = {
        "axes.labelsize": 7,
        "axes.titlesize": 7,
        "font.size": 7,
        "legend.fontsize": 7,
        "xtick.labelsize": 7,
        "ytick.labelsize": 7,
        "grid.linewidth": 0.8,
        "grid.linestyle": ":",
        "legend.frameon": True,
        "figure.dpi": 600,
    }
    matplotlib.rcParams.update(params)
    fig = plt.figure(figsize=a4_figsize(columns=2))
    ax = fig.gca()
    ax.ticklabel_format(useOffset=False)
    return fig, ax


def save_fig(out_filename: str, tight: str = "tight", formats: tuple[str, ...] = ("png", "pdf")) -> None:
    """Save the current figure (reference :92-123)."""
    _, plt = _require_matplotlib()
    outpath = out_filename if out_filename.endswith(".png") else out_filename + ".png"
    if "png" in formats:
        plt.savefig(outpath, dpi=600, bbox_inches=tight, pad_inches=0)
    if "pdf" in formats:
        plt.savefig(outpath.replace(".png", ".pdf"), bbox_inches=tight, pad_inches=0)
    plt.close()


# -- distributed layer preparation -------------------------------------------


@dataclass
class PlotLayers:
    """Bounded, WGS84, driver-sized data for one map figure."""

    bbox: tuple[float, float, float, float] | None  # (west, south, east, north)
    positionfixes: pd.DataFrame | None  # lon, lat
    staypoints: pd.DataFrame | None  # lon, lat
    triplegs: pd.DataFrame | None  # coords: list[(lon, lat)]
    locations: pd.DataFrame | None  # lon, lat
    radius_sp_deg: float | None
    radius_locs_deg: float | None


def _decimate(df: DataFrame, cols: list, max_rows: int, seed_col: F.Column) -> pd.DataFrame:
    """Deterministic ≤max_rows sample: hash-ordered top-k. Spark plans
    orderBy+limit as TakeOrderedAndProject — per-partition heaps plus a
    driver merge of max_rows rows, no global sort materialization."""
    return df.select(*cols).orderBy(F.xxhash64(seed_col)).limit(max_rows).toPandas()


def prepare_plot_layers(
    positionfixes: DataFrame | None = None,
    staypoints: DataFrame | None = None,
    triplegs: DataFrame | None = None,
    locations: DataFrame | None = None,
    radius_sp: float = 100,
    radius_locs: float = 150,
    epsg: int | None = None,
    max_rows_per_layer: int = DEFAULT_MAX_ROWS,
) -> PlotLayers:
    """Reproject, bound, and decimate entity frames for plotting.

    ``epsg`` declares the CRS of the inputs (the engine convention
    carries CRS out-of-band, model/schemas.py); planar inputs are
    reprojected to WGS84 like the reference's ``_prepare_frames``
    (:161-185). Bounds follow ``_calculate_bounds`` (:188-225): the
    first non-None frame in (pfs, sp, tpls, locs) order decides them;
    every frame except positionfixes pads by 0.03 degrees.
    """
    if positionfixes is None and staypoints is None and triplegs is None and locations is None:
        raise ValueError("At least one DataFrame should not be None.")

    def _wgs84(df: DataFrame | None, geom_col: str) -> DataFrame | None:
        if df is None or epsg in (None, WGS84):
            return df
        return transform_points(df, epsg, WGS84, geom_cols=(geom_col,))

    pfs = _wgs84(positionfixes, "geom")
    sp = _wgs84(staypoints, "geom")
    tpls = _wgs84(triplegs, "geom")
    locs = _wgs84(locations, "center")

    # bounds: one tiny agg on the first non-None frame (priority order
    # and the 0.03 pad mirror the reference)
    bbox = None
    if pfs is not None:
        row = pfs.agg(
            F.min("geom.lon").alias("w"), F.min("geom.lat").alias("s"),
            F.max("geom.lon").alias("e"), F.max("geom.lat").alias("n"),
        ).first()
        pad = 0.0
    elif sp is not None:
        row = sp.agg(
            F.min("geom.lon").alias("w"), F.min("geom.lat").alias("s"),
            F.max("geom.lon").alias("e"), F.max("geom.lat").alias("n"),
        ).first()
        pad = 0.03
    elif tpls is not None:
        v = tpls.select(F.explode("geom").alias("p"))
        row = v.agg(
            F.min("p.lon").alias("w"), F.min("p.lat").alias("s"),
            F.max("p.lon").alias("e"), F.max("p.lat").alias("n"),
        ).first()
        pad = 0.03
    else:
        row = locs.agg(
            F.min("center.lon").alias("w"), F.min("center.lat").alias("s"),
            F.max("center.lon").alias("e"), F.max("center.lat").alias("n"),
        ).first()
        pad = 0.03
    if row is not None and row["w"] is not None:
        bbox = (row["w"] - pad, row["s"] - pad, row["e"] + pad, row["n"] + pad)

    center_lat = (bbox[1] + bbox[3]) / 2.0 if bbox else 0.0
    # meters → degrees at the bounds' latitude midpoint (reference
    # :246-259 via meters_to_decimal_degrees at the axis midpoint)
    deg_per_m = 1.0 / (111.32 * 1000.0 * math.cos(math.radians(center_lat)))

    pfs_pd = sp_pd = tpls_pd = locs_pd = None
    if pfs is not None:
        pfs_pd = _decimate(
            pfs.select(F.col("geom.lon").alias("lon"), F.col("geom.lat").alias("lat")),
            ["lon", "lat"], max_rows_per_layer, F.struct("lon", "lat"),
        )
    if sp is not None:
        sp_pd = _decimate(
            sp.select(F.col("geom.lon").alias("lon"), F.col("geom.lat").alias("lat")),
            ["lon", "lat"], max_rows_per_layer, F.struct("lon", "lat"),
        )
    if tpls is not None:
        tpls_pd = _decimate(
            tpls.select(
                F.transform("geom", lambda p: F.array(p["lon"], p["lat"])).alias("coords")
            ),
            ["coords"], max_rows_per_layer, F.col("coords"),
        )
    if locs is not None:
        locs_pd = _decimate(
            locs.select(F.col("center.lon").alias("lon"), F.col("center.lat").alias("lat")),
            ["lon", "lat"], max_rows_per_layer, F.struct("lon", "lat"),
        )

    return PlotLayers(
        bbox=bbox,
        positionfixes=pfs_pd,
        staypoints=sp_pd,
        triplegs=tpls_pd,
        locations=locs_pd,
        radius_sp_deg=radius_sp * deg_per_m,
        radius_locs_deg=radius_locs * deg_per_m,
    )


# -- rendering (reference :228-323) ------------------------------------------


def plot(
    positionfixes: DataFrame | None = None,
    staypoints: DataFrame | None = None,
    triplegs: DataFrame | None = None,
    locations: DataFrame | None = None,
    radius_sp: float = 100,
    radius_locs: float = 150,
    filename: str | None = None,
    plot_osm: bool = False,
    ax=None,
    epsg: int | None = None,
    max_rows_per_layer: int = DEFAULT_MAX_ROWS,
) -> None:
    """Render positionfixes/staypoints/triplegs/locations on one map.

    Signature and draw order mirror reference ``plot`` (:266-323):
    positionfix scatter, green staypoint circles, viridis tripleg
    lines, red location circles, equal aspect, optional save.
    """
    if plot_osm:
        raise NotImplementedError("OSM basemaps need osmnx + network access (reference :126-158)")
    layers = prepare_plot_layers(
        positionfixes, staypoints, triplegs, locations,
        radius_sp=radius_sp, radius_locs=radius_locs,
        epsg=epsg, max_rows_per_layer=max_rows_per_layer,
    )
    matplotlib, plt = _require_matplotlib()
    import matplotlib.patches as mpatches
    from matplotlib.collections import LineCollection

    has_no_ax_input = ax is None
    if ax is None:
        _, ax = regular_figure()

    if layers.positionfixes is not None:
        ax.scatter(layers.positionfixes["lon"], layers.positionfixes["lat"], s=0.5, zorder=1)
    if layers.staypoints is not None:
        for _, r in layers.staypoints.iterrows():
            ax.add_artist(
                mpatches.Circle((r["lon"], r["lat"]), layers.radius_sp_deg,
                                facecolor="none", edgecolor="g", zorder=3)
            )
    if layers.triplegs is not None and len(layers.triplegs):
        lc = LineCollection(list(layers.triplegs["coords"]), cmap="viridis", zorder=2)
        lc.set_array(pd.RangeIndex(len(layers.triplegs)).to_numpy())
        ax.add_collection(lc)
    if layers.locations is not None:
        for _, r in layers.locations.iterrows():
            ax.add_artist(
                mpatches.Circle((r["lon"], r["lat"]), layers.radius_locs_deg,
                                facecolor="none", edgecolor="r", zorder=4)
            )

    ax.set_aspect("equal", adjustable="box")
    if filename is not None:
        save_fig(filename, formats=("png",))
    elif has_no_ax_input:
        plt.show()


# -- modal split (reference :326-450) ----------------------------------------


def modal_split_frame(df_modal_split: DataFrame) -> pd.DataFrame:
    """Spark ``calculate_modal_split`` output → the reference's plot
    input: a pandas frame indexed by the time bucket, one column per
    mode. The modal-split table is one row per bucket — already
    driver-sized — so the collect is bounded by construction.

    Matches the reference's input validation (:391-403): multi-user
    output (a ``user_id`` column) and missing time buckets both raise.
    """
    cols = df_modal_split.columns
    if "user_id" in cols:
        raise ValueError(
            "This function can not support multiindex types. Pass the "
            "`per_user=False` flag in 'calculate_modal_split'."
        )
    if "timestamp" not in cols:
        raise ValueError(
            "Index of modal split has to be a datetime type. This problem can be "
            "solved if the 'freq' keyword of 'calculate_modal_split' is not None"
        )
    pdf = df_modal_split.orderBy("timestamp").toPandas().set_index("timestamp")
    pdf.index = pd.to_datetime(pdf.index)
    return pdf


def plot_modal_split(
    df_modal_split_in: DataFrame | pd.DataFrame,
    out_path: str | None = None,
    date_fmt_x_axis: str = "%W",
    fig=None,
    axis=None,
    title: str | None = None,
    x_label: str | None = None,
    y_label: str | None = None,
    x_pad: float = 10,
    y_pad: float = 10,
    title_pad: float = 1.02,
    skip_xticks: int = 0,
    n_col_legend: int = 5,
    borderaxespad: float = 0.5,
    bar_kws: dict[str, Any] | None = None,
):
    """Stacked-bar modal split (reference :326-450): strftime x labels,
    legend below the axes, optional save. Accepts the Spark modal-split
    DataFrame (converted via :func:`modal_split_frame`) or an
    already-pivoted pandas frame."""
    if isinstance(df_modal_split_in, DataFrame):
        df_modal_split = modal_split_frame(df_modal_split_in)
    else:
        df_modal_split = df_modal_split_in.copy()
        if len(df_modal_split) and isinstance(df_modal_split.index[0], tuple):
            raise ValueError(
                "This function can not support multiindex types. Use "
                "'pandas.MultiIndex.droplevel' or pass the `per_user=False` flag "
                "in 'calculate_modal_split' function."
            )
        if not pd.api.types.is_datetime64_any_dtype(df_modal_split.index.dtype):
            raise ValueError(
                "Index of modal split has to be a datetime type. This problem can "
                "be solved if the 'freq' keyword of 'calculate_modal_split' is not None"
            )

    _, plt = _require_matplotlib()
    if axis is None:
        fig, ax = regular_figure()
    else:
        ax = axis

    df_modal_split.index = df_modal_split.index.map(lambda s: s.strftime(date_fmt_x_axis))
    df_modal_split.plot.bar(stacked=True, ax=ax, **(bar_kws or {}))

    if skip_xticks > 0:
        for i, tick in enumerate(ax.xaxis.get_major_ticks()):
            if i % skip_xticks != 0:
                tick.set_visible(False)

    box = ax.get_position()
    ax.set_position([box.x0, box.y0 + box.height * 0.1, box.width, box.height * 0.9])
    ax.legend(
        loc="upper center", bbox_to_anchor=(0.5, -0.05), fancybox=True,
        frameon=False, ncol=n_col_legend, borderaxespad=borderaxespad,
    )
    if title is not None:
        ax.set_title(title, y=title_pad)
    ax.set_xlabel(x_label)
    ax.set_ylabel(y_label)
    if fig is not None:
        fig.autofmt_xdate()
    plt.tight_layout()
    ax.xaxis.labelpad = x_pad
    ax.yaxis.labelpad = y_pad
    if out_path is not None:
        save_fig(out_path)
    return fig, ax
