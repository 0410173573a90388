from trackintel_spark.functions.spatial import (
    EARTH_RADIUS_M,
    haversine_m,
    haversine_point,
    linestring_length_m,
    lon_wrap_centroid,
    meters_to_decimal_degrees,
    point,
)
from trackintel_spark.functions.temporal import duration_s, temp_overlap_ratio

__all__ = [
    "EARTH_RADIUS_M",
    "point",
    "haversine_m",
    "haversine_point",
    "linestring_length_m",
    "lon_wrap_centroid",
    "meters_to_decimal_degrees",
    "duration_s",
    "temp_overlap_ratio",
]
