import pytest

from tests.conftest import make_pfs
from trackintel_spark.model import validate
from trackintel_spark.model.schemas import SchemaError


def test_validate_positionfixes_ok(spark):
    pfs = make_pfs(spark, [(0, 1, "2024-01-01T00:00:00Z", 8.5, 47.4)])
    assert validate(pfs, "positionfixes") is pfs


def test_validate_missing_column(spark):
    pfs = make_pfs(spark, [(0, 1, "2024-01-01T00:00:00Z", 8.5, 47.4)]).drop("tracked_at")
    with pytest.raises(SchemaError, match="tracked_at"):
        validate(pfs, "positionfixes")


def test_validate_unknown_entity(spark):
    pfs = make_pfs(spark, [(0, 1, "2024-01-01T00:00:00Z", 8.5, 47.4)])
    with pytest.raises(SchemaError, match="unknown entity"):
        validate(pfs, "nope")


def test_extra_columns_pass(spark):
    from pyspark.sql import functions as F

    pfs = make_pfs(spark, [(0, 1, "2024-01-01T00:00:00Z", 8.5, 47.4)]).withColumn("extra", F.lit("x"))
    validate(pfs, "positionfixes")
