"""Bucketed tables: pre-shuffled storage for co-located joins.

The 100 TB join strategy the ad-hoc path can't give you: write both fact
tables bucketed (and sorted) by the join key once, and every subsequent
join on that key reads co-located buckets — the planner drops BOTH
shuffle exchanges (and the sorts, when ``sort_cols`` covers the key).
On a 1000-executor cluster this turns the dominant repeated cost of a
fact-fact join (full-data shuffle per query) into a one-time write cost.

Spark's native (non-Hive) bucketing is used: ``bucketBy`` + external
``path`` + ``saveAsTable`` registers the bucket spec in the session
catalog; ``spark.sql.sources.bucketing.enabled`` (default true) lets the
scan report its distribution. tests/test_bucketing.py asserts the
joined plan contains no shuffle exchange.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Optional[Sequence[str]] = None,
) -> None:
    """Materialize ``df`` as an external parquet table bucketed on
    ``bucket_cols``. ``n_buckets`` should divide the target parallelism;
    matching bucket counts on both join sides is what enables the
    shuffle-free join."""
    writer = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left: str, right: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key. The plan
    should contain zero shuffle exchanges — verify with
    ``tools/audit_plans.py`` or ``df.explain()`` after changes."""
    return spark.table(left).join(spark.table(right), on=list(on), how=how)
