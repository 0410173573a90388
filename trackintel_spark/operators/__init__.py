from trackintel_spark.operators.asof import asof_join
from trackintel_spark.operators.dbscan_distributed import dbscan_distributed
from trackintel_spark.operators.locations import generate_locations, generate_locations_grid
from trackintel_spark.operators.merge import merge_staypoints
from trackintel_spark.operators.staypoints import generate_staypoints
from trackintel_spark.operators.tours import flag_journeys, generate_tours, get_trips_grouped
from trackintel_spark.operators.triplegs import generate_triplegs
from trackintel_spark.operators.trips import generate_trips

__all__ = [
    "asof_join",
    "generate_staypoints",
    "generate_triplegs",
    "generate_trips",
    "flag_journeys",
    "generate_tours",
    "get_trips_grouped",
    "generate_locations",
    "generate_locations_grid",
    "dbscan_distributed",
    "merge_staypoints",
]
