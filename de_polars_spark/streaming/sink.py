"""Idempotent foreachBatch sink: exactly-once parquet output on replay.

Structured Streaming guarantees at-least-once delivery to a
``foreachBatch`` callback — after a crash the last uncommitted micro-batch
is REPLAYED with the same ``batch_id``. A sink that blindly appends
duplicates that batch. The standard fix (Structured Streaming programming
guide, foreachBatch section): make the write idempotent on ``batch_id`` —
each batch lands in its own directory, a replayed id is detected and
skipped, and readers see only committed batches.

Commit protocol: write to ``<dir>/_staging_<id>``, then atomically rename
to ``<dir>/batch_id=<id>``. The hive-style directory name doubles as a
partition column, so ``spark.read.parquet(dir)`` exposes the batch
provenance for free.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from de_polars_spark.streaming import fsutil


def idempotent_parquet_sink(out_dir: str) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch(df, batch_id)`` callback writing to ``out_dir``.

    Use: ``stream.writeStream.foreachBatch(idempotent_parquet_sink(d))``.

    All protocol steps go through the Hadoop FileSystem of ``out_dir``'s
    scheme (fsutil), so the sink works against hdfs:///s3a:// paths too
    — with the rename-atomicity caveat documented in fsutil.
    """

    def write_batch(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        final = f"{out_dir.rstrip('/')}/batch_id={batch_id}"
        if fsutil.exists(spark, final):
            return  # replayed batch — already committed, skip
        staging = f"{out_dir.rstrip('/')}/_staging_{batch_id}"
        if fsutil.exists(spark, staging):
            fsutil.delete(spark, staging)  # half-written attempt from a crash
        df.write.mode("overwrite").parquet(staging)
        fsutil.rename(spark, staging, final)

    return write_batch
