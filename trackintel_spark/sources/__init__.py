from trackintel_spark.sources.testdata import load_table

__all__ = ["load_table"]
