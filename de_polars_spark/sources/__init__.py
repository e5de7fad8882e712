from de_polars_spark.sources.registry import TESTDATA_TABLES, register_testdata

__all__ = ["TESTDATA_TABLES", "register_testdata"]
