"""Streaming embedding ingestion into a persisted IVF-PQ index.

The maintenance path of the ANN stack (`operators/pq.py`,
`operators/similarity.py`): vectors stream in; each micro-batch is
assigned its coarse cell and PQ codes map-only against the FROZEN
quantizers (centroids + codebooks loaded once at sink construction —
the standard serving trade-off: assignment quality decays as the
corpus drifts, rebuild when recall drops), and the encoded postings
``(id, cell, code_0..code_{m-1})`` append through the batch-committed
directory protocol. Queries serve from the union of committed batches
with ``pq.ivfpq_topk`` — cell partition pruning and ADC work unchanged
because the posting schema is exactly ``ivfpq_index``'s output.

Per-batch cost: ONE map-only pass over the batch (no shuffle, no state
read — admission-free ingest; compose with ``neardup_ingest`` upstream
if near-dup rejection is wanted). State is the index itself.

Exactly-once on replay: the committed ``batch_id=`` directory protocol
of ``sink.idempotent_parquet_sink`` — a replayed batch re-encodes
deterministically (frozen quantizers, pure column expressions) and the
commit is skipped if it already landed. All filesystem steps go
through ``fsutil`` (any Hadoop-FS scheme; see its atomicity note).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from de_polars_spark.operators.pq import ivfpq_index
from de_polars_spark.streaming.sink import idempotent_parquet_sink


def ivfpq_ingest_sink(
    id_col: str,
    vec_col: str,
    centroids: list,
    codebooks: list[list[list[float]]],
    postings_dir: str,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch(df, batch_id)`` callback that PQ-encodes
    and appends each micro-batch to ``postings_dir``."""
    write_postings = idempotent_parquet_sink(postings_dir)

    def ingest(df: DataFrame, batch_id: int) -> None:
        write_postings(
            ivfpq_index(df, id_col, vec_col, centroids, codebooks), batch_id
        )

    return ingest
