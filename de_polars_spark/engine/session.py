"""SparkSession factory with scale-ready defaults.

Defaults are chosen for correctness against a UTC-naive oracle (session
timezone pinned to UTC) and for large-cluster behavior: AQE on (runtime
join-strategy switches, partition coalescing, skew-join splitting),
Arrow-accelerated Python interchange, and shuffle partitions sized by the
caller (local[N] tests pass N; a 1000-executor deployment would raise it
or rely on AQE coalescing from a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    # AQE: re-plan at runtime — broadcast switch, partition coalesce, skew split.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for toPandas()/pandas_udf transfer (reference used Arrow-first
    # result transfer, duckdb_engine.py:289-306).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic comparisons vs UTC-naive engines (DuckDB oracle).
    "spark.sql.session.timeZone": "UTC",
    # ANSI off: match DuckDB's permissive casts in translated SQL.
    "spark.sql.ansi.enabled": "false",
    # 100 TB posture: cap single-file partition splits so scans parallelize;
    # keep broadcast threshold generous — dims here are tiny vs the fact table.
    "spark.sql.files.maxPartitionBytes": "134217728",  # 128 MiB
    "spark.sql.autoBroadcastJoinThreshold": "67108864",  # 64 MiB
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Split generated expression code into sub-methods earlier (default
    # 1024 bytes): the KPI view chain's wide CASE-ladder projections fused
    # into aggregate stages exceed the JVM's 64 KB method limit at the
    # default, silently falling back to interpreted (non-codegen)
    # evaluation — measured 2-5x slower on kpi_tracker. 256 keeps every
    # generated method compilable (and under HotSpot's JIT inline limit).
    "spark.sql.codegen.methodSplitThreshold": "256",
}


def get_spark(
    app_name: str = "de_polars_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    for tests; on a cluster, leave unset and submit normally.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    conf.setdefault("spark.ui.enabled", "false")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
