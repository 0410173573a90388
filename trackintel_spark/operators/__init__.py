from trackintel_spark.operators.staypoints import generate_staypoints
from trackintel_spark.operators.triplegs import generate_triplegs

__all__ = ["generate_staypoints", "generate_triplegs"]
