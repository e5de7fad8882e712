"""Token-window document chunking — the context-length preprocessing
step of a training-data pipeline (long docs split into model-sized
windows with overlap so no span is ever cut without context).

Reference parity: the reference engine has no chunking step; this is a
beyond-parity LLM-pipeline operator (SURVEY §7 Phase 5 family).

Scale shape: pure map + generator explode (``posexplode(sequence(...))``)
— no shuffle, no UDF, embarrassingly parallel over any corpus size. The
per-row expansion factor is ``ceil(n_tokens / stride)``, bounded by the
document length itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from de_polars_spark.functions import text as TX


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """One row per (doc, chunk): whitespace-token windows of ``window``
    tokens advancing by ``window - overlap``.

    Chunk starts are 0, stride, 2*stride, ...; the last chunk may be
    shorter than ``window`` but is never empty, and a doc shorter than
    one window yields exactly one chunk. Output columns:

    - ``chunk_idx``   0-based chunk ordinal within the doc
    - ``chunk_start`` first token index (0-based)
    - ``chunk_len``   tokens in this chunk (= window except possibly last)
    - ``chunk_hash``  md5 of the space-joined chunk tokens (stable id for
      downstream exact-dedup of chunks across docs)
    """
    if overlap >= window:
        raise ValueError(f"overlap ({overlap}) must be < window ({window})")
    stride = window - overlap
    toks = df.select(
        F.col(id_col), TX.tokens(F.col(text_col)).alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    # number of chunks: 1 + ceil((n - window) / stride) when n > window
    n_chunks = F.when(F.col("__n") <= window, F.lit(1)).otherwise(
        F.lit(1)
        + F.ceil((F.col("__n") - F.lit(window)) / F.lit(stride)).cast("int")
    )
    return (
        toks.where(F.col("__n") > 0)
        .withColumn(
            "chunk_idx",
            F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))),
        )
        .withColumn("chunk_start", F.col("chunk_idx") * F.lit(stride))
        .withColumn(
            "chunk_len",
            F.least(F.lit(window), F.col("__n") - F.col("chunk_start")),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.col("chunk_start").cast("int").alias("chunk_start"),
            F.col("chunk_len").cast("int").alias("chunk_len"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.slice("__toks", F.col("chunk_start") + 1, F.lit(window)),
                )
            ).alias("chunk_hash"),
        )
    )


def duplicate_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 64,
    overlap: int = 16,
    min_docs: int = 2,
) -> DataFrame:
    """Boilerplate detection: token windows whose exact content recurs
    across ``min_docs``+ distinct documents (headers, footers, license
    blocks, navigation chrome — the spans chunk-level dedup should drop
    even when the *documents* are not duplicates).

    One groupBy on the chunk hash over the chunk stream — map +
    generator explode feeding a single map-side-combinable shuffle.

    Output per recurring window:
    ``(chunk_hash, chunk_len, n_docs, n_occurrences, first_doc_id,
    doc_id_sum)`` — the checksum pins the exact membership.
    """
    chunks = chunk_documents(df, id_col, text_col, window, overlap)
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.max("chunk_len").alias("chunk_len"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min(F.col(id_col)).alias("first_doc_id"),
            F.sum(F.col(id_col)).alias("doc_id_sum"),
        )
        .where(F.col("n_docs") >= min_docs)
    )
