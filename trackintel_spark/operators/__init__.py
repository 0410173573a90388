from trackintel_spark.operators.merge import merge_staypoints
from trackintel_spark.operators.staypoints import generate_staypoints
from trackintel_spark.operators.triplegs import generate_triplegs
from trackintel_spark.operators.trips import generate_trips

__all__ = ["generate_staypoints", "generate_triplegs", "generate_trips", "merge_staypoints"]
