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

import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame


def idempotent_parquet_sink(out_dir: str) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch(df, batch_id)`` callback writing to ``out_dir``.

    Use: ``stream.writeStream.foreachBatch(idempotent_parquet_sink(d))``.
    """

    def write_batch(df: DataFrame, batch_id: int) -> None:
        final = os.path.join(out_dir, f"batch_id={batch_id}")
        if os.path.exists(final):
            return  # replayed batch — already committed, skip
        staging = os.path.join(out_dir, f"_staging_{batch_id}")
        if os.path.exists(staging):
            shutil.rmtree(staging)  # half-written attempt from a crash
        df.write.mode("overwrite").parquet(staging)
        os.rename(staging, final)

    return write_batch
