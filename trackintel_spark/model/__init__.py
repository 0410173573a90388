from trackintel_spark.model.schemas import (
    LINESTRING,
    POINT,
    ENTITY_SCHEMAS,
    entity_columns,
    validate,
)

__all__ = ["POINT", "LINESTRING", "ENTITY_SCHEMAS", "entity_columns", "validate"]
