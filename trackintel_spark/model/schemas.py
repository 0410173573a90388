"""Entity schemas + validation for the trackintel data model on Spark.

The reference implements entities as GeoDataFrame subclasses whose
``validate`` checks required columns / dtypes at construction time
(model/positionfixes.py:55-74, model/staypoints.py:57-74,
model/triplegs.py:55-72, model/locations.py:45-54, model/trips.py:95-111,
model/tours.py:50-60). Extra columns always flow through untouched.

Here an entity is a plain DataFrame + a schema contract:

* geometry Point   -> ``struct<lon:double, lat:double>``  (column ``geom``;
  locations use ``center`` and optional polygon ``extent``)
* LineString       -> ``array<struct<lon:double, lat:double>>`` (ordered
  vertices) so length/speed are codegen-able expressions, no UDF
* MultiPoint(trip) -> ``struct<origin:struct<lon,lat>, dest:struct<lon,lat>>``
* Polygon extent   -> ``array<struct<lon:double, lat:double>>`` exterior ring
* ids              -> nullable LongType (reference nullable Int64,
  preprocessing/positionfixes.py:175)
* timestamps       -> TimestampType under a UTC session timezone
  (reference demands tz-aware datetime64, model/positionfixes.py:64-66)

Validation is structural (names + types), mirroring the reference's
check-required-columns approach — data-dependent checks stay lazy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# -- geometry building blocks -------------------------------------------------

POINT = T.StructType(
    [
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("lat", T.DoubleType(), True),
    ]
)

LINESTRING = T.ArrayType(POINT, containsNull=False)

MULTIPOINT_OD = T.StructType(  # trips origin/destination pair (model/trips.py:185-186)
    [
        T.StructField("origin", POINT, True),
        T.StructField("dest", POINT, True),
    ]
)

# -- required columns per entity (name -> type) -------------------------------
# (reference: required-column lists in each model/*.py)

_TS = T.TimestampType()
_LONG = T.LongType()

ENTITY_SCHEMAS: dict[str, dict[str, T.DataType]] = {
    # model/positionfixes.py:13 — user_id, tracked_at (+ Point geometry :73-74)
    "positionfixes": {
        "id": _LONG,
        "user_id": _LONG,
        "tracked_at": _TS,
        "geom": POINT,
    },
    # model/staypoints.py:12 — user_id, started_at, finished_at (+ Point :73-74)
    "staypoints": {
        "id": _LONG,
        "user_id": _LONG,
        "started_at": _TS,
        "finished_at": _TS,
        "geom": POINT,
    },
    # model/triplegs.py:12 — user_id, started_at, finished_at (+ LineString :71-72)
    "triplegs": {
        "id": _LONG,
        "user_id": _LONG,
        "started_at": _TS,
        "finished_at": _TS,
        "geom": LINESTRING,
    },
    # model/locations.py:10 — user_id, center (+ optional extent :21)
    "locations": {
        "id": _LONG,
        "user_id": _LONG,
        "center": POINT,
    },
    # model/trips.py:60 — user_id, started_at, finished_at, origin/destination sp
    "trips": {
        "id": _LONG,
        "user_id": _LONG,
        "started_at": _TS,
        "finished_at": _TS,
        "origin_staypoint_id": _LONG,
        "destination_staypoint_id": _LONG,
    },
    # model/tours.py:12 — user_id, started_at, finished_at (no geometry)
    "tours": {
        "id": _LONG,
        "user_id": _LONG,
        "started_at": _TS,
        "finished_at": _TS,
    },
}


def entity_columns(entity: str) -> list[str]:
    return list(ENTITY_SCHEMAS[entity])


class SchemaError(ValueError):
    pass


def validate(df: DataFrame, entity: str) -> DataFrame:
    """Assert ``df`` satisfies the entity contract; returns ``df`` unchanged.

    Mirrors reference ``validate`` (e.g. model/positionfixes.py:54-74):
    required columns present with compatible types; extra columns pass.
    """
    required = ENTITY_SCHEMAS.get(entity)
    if required is None:
        raise SchemaError(f"unknown entity {entity!r}; one of {sorted(ENTITY_SCHEMAS)}")
    fields = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in required if c not in fields]
    if missing:
        raise SchemaError(f"{entity}: missing required columns {missing}")
    for col, want in required.items():
        got = fields[col]
        if not _compatible(got, want):
            raise SchemaError(f"{entity}.{col}: expected {want.simpleString()}, got {got.simpleString()}")
    return df


def _compatible(got: T.DataType, want: T.DataType) -> bool:
    if isinstance(want, T.LongType):
        return isinstance(got, (T.LongType, T.IntegerType, T.ShortType))
    if isinstance(want, T.TimestampType):
        return isinstance(got, T.TimestampType)
    if isinstance(want, T.StructType):
        if not isinstance(got, T.StructType):
            return False
        gf = {f.name: f.dataType for f in got.fields}
        return all(n in gf and _compatible(gf[n], f.dataType) for n, f in ((f.name, f) for f in want.fields))
    if isinstance(want, T.ArrayType):
        return isinstance(got, T.ArrayType) and _compatible(got.elementType, want.elementType)
    return got == want
