"""de_polars_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
``jasonwu001t/de-polars`` (a DuckDB/Polars FinOps engine), re-expressed
Spark-first: Spark SQL replaces DuckDB, Spark DataFrames replace Polars,
``spark.read.parquet`` + catalog temp views replace eager ``read_parquet``
table materialization, and Catalyst/AQE supply the optimizer the reference
delegated to DuckDB (reference: de_polars/engine/duckdb_engine.py:138-313).

Layout
------
- ``engine``     — SparkSession factory, SparkEngine (register + query),
                   DuckDB→Spark SQL dialect shim.
- ``sources``    — parquet/testdata registration, auth chain + S3A options,
                   S3 downloader + estimators, SQL-library partitioner,
                   pricing manager + joinable pricing views.
- ``functions``  — reusable column expressions (cost normalization ladders,
                   text stats, vector math).
- ``operators``  — composed operators: dedup (exact/MinHash/SimHash/Jaccard/
                   embedding near-dup) + connected-components closure, ANN
                   similarity search, multimodal decode plumbing, as-of /
                   range temporal joins, snapshot MERGE, text ranking
                   (TF-IDF/BM25/inverted index), deterministic + weighted
                   sampling, skew-salted aggregation.
- ``views``      — the KPI SQL view chain (two-dialect renderings).
- ``analytics``  — the reference's 7 analytics modules re-expressed on Spark.
- ``api``        — framework-free REST handlers + optional FastAPI factory.
- ``utils``      — formatters, export sinks, validators, profiler/cache.
- ``streaming``  — Structured Streaming extensions: windowed cost alerts,
                   sessionization (native + stateful), streaming dedup,
                   stream-stream interval join with watermarked state.
- ``inventory``  — every operator bound to the test tables with a DuckDB
                   oracle (the correctness gate).
- ``client``     — FinOpsEngine facade tying it all together.
"""

from de_polars_spark.config import DataConfig, DataExportType
from de_polars_spark.engine.core import SparkEngine
from de_polars_spark.engine.session import get_spark

__all__ = ["DataConfig", "DataExportType", "SparkEngine", "get_spark"]

__version__ = "0.1.0"
