from trackintel_spark.model.accessors import (
    Locations,
    Positionfixes,
    Staypoints,
    Tours,
    Triplegs,
    Trips,
)
from trackintel_spark.model.schemas import (
    LINESTRING,
    POINT,
    ENTITY_SCHEMAS,
    entity_columns,
    validate,
)

__all__ = [
    "Corpus",
    "POINT",
    "LINESTRING",
    "ENTITY_SCHEMAS",
    "entity_columns",
    "validate",
    "Positionfixes",
    "Staypoints",
    "Triplegs",
    "Trips",
    "Locations",
    "Tours",
]
from trackintel_spark.model.corpus import Corpus  # noqa: E402
