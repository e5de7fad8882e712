from de_polars_spark.engine.core import SparkEngine
from de_polars_spark.engine.dialect import translate_duckdb_sql
from de_polars_spark.engine.session import get_spark

__all__ = ["SparkEngine", "get_spark", "translate_duckdb_sql"]
