"""Stream-stream interval join: bounded-lag attribution.

Join each left event to the right-side events that happened within a
bounded look-back window (``right_time`` in ``[left_time - gap,
left_time]``) for the same key — "views in the 24h before a purchase".

The same logical query runs batch and streaming (the Structured
Streaming model): on two streams, BOTH sides get watermarks and the
time-bound join condition lets Spark expire state — right-side rows
older than ``left watermark - gap`` can never match again and are
evicted, so state is bounded by (rate x (gap + watermark)) instead of
growing forever. On batch frames the watermark is a no-op and Catalyst
plans an equi hash join on the key with the range condition as a
post-filter.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    gap_seconds: int,
    watermark: str | None = None,
) -> DataFrame:
    """INNER join pairs with ``left_time - gap <= right_time <= left_time``.

    ``left_time`` / ``right_time`` must be distinct column names (rename
    one side first). With ``watermark`` set and streaming inputs, both
    sides are watermarked on their time columns (required for state
    cleanup in a stream-stream join).
    """
    if watermark is not None and left.isStreaming:
        left = left.withWatermark(left_time, watermark)
    if watermark is not None and right.isStreaming:
        right = right.withWatermark(right_time, watermark)
    for k in on:
        right = right.withColumnRenamed(k, f"__r_{k}")
    cond = None
    for k in on:
        eq = F.col(k) == F.col(f"__r_{k}")
        cond = eq if cond is None else cond & eq
    lt, rt = F.col(left_time), F.col(right_time)
    cond = (
        cond
        & (rt <= lt)
        & (rt >= lt - F.expr(f"INTERVAL {int(gap_seconds)} SECOND"))
    )
    return left.join(right, cond, "inner").drop(*[f"__r_{k}" for k in on])
