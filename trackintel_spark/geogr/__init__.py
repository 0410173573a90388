from trackintel_spark.geogr.distances import (
    calculate_distance_matrix,
    get_speed_positionfixes,
    get_speed_triplegs,
)
from trackintel_spark.geogr.filter import spatial_filter

__all__ = [
    "get_speed_positionfixes",
    "get_speed_triplegs",
    "calculate_distance_matrix",
    "spatial_filter",
]
