"""trackintel_spark — a PySpark-native spatio-temporal mobility analytics engine.

A from-scratch re-expression of the semantics of mie-lab/trackintel
(eager pandas/GeoPandas mobility library) on idiomatic PySpark:

* entities are plain Spark DataFrames validated against ``StructType``
  schemas (``trackintel_spark.model``); an optional fluent accessor
  layer (``trackintel_spark.model.accessors``) mirrors the reference's
  ``pfs.generate_staypoints(...)`` call sites over the functional core;
* geometry is ``struct<lon,lat>`` / ``array<struct<lon,lat>>`` so the
  great-circle math stays inside whole-stage codegen;
* every operator is a lazy ``DataFrame -> DataFrame`` transformation;
  Python kernels (Arrow-batched ``applyInPandas``) appear only where the
  reference algorithm is inherently sequential per user (staypoint
  sliding scan, tour stack scan, per-user DBSCAN).

Reference parity citations use ``file:line`` relative to the reference
checkout (mie-lab/trackintel).
"""

from trackintel_spark.session import get_spark
from trackintel_spark.model.accessors import (
    Locations,
    Positionfixes,
    Staypoints,
    Tours,
    Triplegs,
    Trips,
)
from trackintel_spark.sources import (
    read_locations_csv,
    read_positionfixes_csv,
    read_staypoints_csv,
    read_tours_csv,
    read_triplegs_csv,
    read_trips_csv,
)
from trackintel_spark.visualization import plot, plot_modal_split

__version__ = "0.1.0"


def print_version() -> None:
    """Reference core.py:4-9."""
    print(f"This is trackintel_spark v{__version__}")


__all__ = [
    "get_spark",
    "__version__",
    "print_version",
    "Positionfixes",
    "Staypoints",
    "Triplegs",
    "Trips",
    "Locations",
    "Tours",
    "read_positionfixes_csv",
    "read_staypoints_csv",
    "read_triplegs_csv",
    "read_trips_csv",
    "read_locations_csv",
    "read_tours_csv",
    "plot",
    "plot_modal_split",
]
