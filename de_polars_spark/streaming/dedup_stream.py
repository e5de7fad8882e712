"""Streaming deduplication: exact-dup suppression on a live stream.

The streaming arm of ``operators/dedup.py``: the same md5 content-hash
key, applied incrementally. ``dropDuplicatesWithinWatermark`` bounds the
dedup state store by the watermark horizon — the property that makes
streaming dedup viable at all at scale (unbounded ``dropDuplicates``
state grows forever on an infinite stream).

Batch/stream parity: on a batch frame the same helper degrades to plain
``dropDuplicates`` over the hash, which is exactly
``operators/dedup.exact_dup_groups``'s keep-first semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    content_col: str,
    time_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Emit only the first occurrence of each content hash.

    Streaming input: state is bounded — a duplicate arriving later than
    ``watermark`` past its original may be re-emitted (the documented,
    bounded-memory trade-off). Batch input: exact global dedup."""
    hashed = stream.withColumn("content_hash", F.md5(F.col(content_col)))
    if stream.isStreaming:
        return hashed.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    return hashed.dropDuplicates(["content_hash"])
