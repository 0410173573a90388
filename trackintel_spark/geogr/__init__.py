from trackintel_spark.geogr.distances import (
    calculate_distance_matrix,
    get_speed_positionfixes,
    get_speed_triplegs,
)
from trackintel_spark.geogr.crs import check_planar, transform_points, transform_xy
from trackintel_spark.geogr.filter import spatial_filter
from trackintel_spark.geogr.trajectory_distance import trajectory_distance_matrix

__all__ = [
    "check_planar",
    "transform_points",
    "transform_xy",
    "get_speed_positionfixes",
    "get_speed_triplegs",
    "calculate_distance_matrix",
    "spatial_filter",
    "trajectory_distance_matrix",
]
