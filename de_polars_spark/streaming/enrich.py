"""Stream-static enrichment join: decorate an event stream with a
dimension table (the classic "join clickstream to the user/account dim").

Structured Streaming supports joining a streaming DataFrame to a static
one without watermarks or state: each micro-batch hash-joins against the
dimension. The dimension is broadcast-hinted — on a cluster the dim
ships once per executor instead of shuffling the (unbounded) stream;
AQE would usually pick this anyway for a small dim, but the hint makes
the stream side's no-shuffle property part of the operator's contract.

For a dimension that must be re-read every micro-batch (slowly changing
dim with live updates), wrap the join in ``foreachBatch`` and re-read
inside the function — a static DataFrame's content is pinned at plan
time. That variant trades the broadcast reuse for freshness; this
module implements the pinned-dim case, which is the 99% case for
training-data enrichment (dims versioned per run).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Join ``stream`` (streaming or batch) to the static ``dim``.

    Same code path for batch frames, so stream==batch equivalence is
    testable (tests/test_streaming.py).
    """
    if dim.isStreaming:
        raise ValueError("dim must be a static DataFrame (got a stream)")
    return stream.join(F.broadcast(dim), list(on), how)
