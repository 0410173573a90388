from trackintel_spark.geogr.distances import (
    calculate_distance_matrix,
    get_speed_positionfixes,
    get_speed_triplegs,
)
from trackintel_spark.geogr.crs import check_planar, transform_points, transform_xy
from trackintel_spark.geogr.filter import spatial_filter
from trackintel_spark.geogr.trajectory_distance import (
    trajectory_distance_matrix,
    trajectory_similarity_join,
    trajectory_topk,
)

# reference-named aliases (trackintel.geogr exports these names; the
# engine implementations live in functions/spatial.py and geogr/crs.py)
from trackintel_spark.functions.spatial import (
    haversine_m as point_haversine_dist,  # geogr/distances.py point_haversine_dist
    linestring_length_m as calculate_haversine_length,  # geogr/distances.py:166-210
    meters_to_decimal_degrees,
)

check_gdf_planar = check_planar  # geogr/distances.py:213-250

__all__ = [
    "check_planar",
    "check_gdf_planar",
    "transform_points",
    "transform_xy",
    "get_speed_positionfixes",
    "get_speed_triplegs",
    "calculate_distance_matrix",
    "calculate_haversine_length",
    "point_haversine_dist",
    "meters_to_decimal_degrees",
    "spatial_filter",
    "trajectory_distance_matrix",
    "trajectory_similarity_join",
    "trajectory_topk",
]
