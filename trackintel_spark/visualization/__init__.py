"""Visualization: bounded plot-layer preparation + gated rendering.

Reference surface: visualization/__init__.py exports ``plot`` and
``plot_modal_split``; the figure utilities (``a4_figsize``,
``regular_figure``, ``save_fig``) live beside them.
"""

from trackintel_spark.visualization.plotting import (
    a4_figsize,
    modal_split_frame,
    plot,
    plot_modal_split,
    prepare_plot_layers,
    regular_figure,
    save_fig,
)

__all__ = [
    "a4_figsize",
    "modal_split_frame",
    "plot",
    "plot_modal_split",
    "prepare_plot_layers",
    "regular_figure",
    "save_fig",
]
