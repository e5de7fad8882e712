"""Streaming distribution-drift monitor: per-batch PSI against a
FROZEN reference histogram.

The deployment shape of the batch ``psi_drift_report`` query
(inventory/llm_ops.py): the reference bucket counts are fitted offline
(a profiling query over the training window) and ride into the sink as
plain Python state — the same frozen-model pattern as
``vector_ingest``'s quantizers. Each micro-batch pays one bucket
aggregation (≤ ``bins`` rows) and appends ONE summary row
``(n_rows, psi, worst_bucket, worst_term)`` through the committed
batch-directory protocol, so the monitor's output is itself a tiny
queryable parquet time series and replay cannot double-log.

Laplace-smoothed proportions (no ln(0) guard needed, empty buckets
included via the full bin spine) and ROUND-6 DECIMAL terms keep every
emitted number deterministic — a replayed batch logs byte-identical
rows, and the test suite pins stream output == batch-mode computation.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from de_polars_spark.functions.local_relation import values_df
from de_polars_spark.streaming.sink import idempotent_parquet_sink


def batch_psi(
    df: DataFrame,
    value_col: str,
    ref_counts: dict[int, int],
    bins: int = 10,
    width: float = 50.0,
) -> DataFrame:
    """One-row PSI summary of ``df`` against the frozen reference.

    Shared by the streaming sink and the stream==batch tests — the
    sink's per-batch work IS this function."""
    spark = df.sparkSession
    ne = sum(ref_counts.values())
    ref = values_df(
        spark,
        [(int(b), int(ref_counts.get(b, 0))) for b in range(bins)],
        "bucket int, n_expected long",
    )
    counts = (
        ref.join(
            df.select(
                # clamp BOTH tails into the edge buckets: without the
                # greatest(0, ...) a negative value maps to a negative
                # bucket and silently vanishes through the spine join —
                # n_rows undercounts and PSI ignores low-side outliers
                F.greatest(
                    F.least(
                        F.floor(F.col(value_col) / width).cast("int"),
                        F.lit(bins - 1),
                    ),
                    F.lit(0),
                ).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_actual")),
            "bucket",
            "left",
        )
        .fillna(0, ["n_actual"])
    )
    tot = counts.agg(F.sum("n_actual").alias("na"))
    pe = (F.col("n_expected") + 1) / (ne + bins)
    pa = (F.col("n_actual") + 1) / (F.col("na") + bins)
    terms = counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_actual",
        F.round((pa - pe) * F.log(pa / pe), 6)
        .cast("decimal(28,6)")
        .alias("term"),
    )
    return terms.agg(
        F.sum("n_actual").cast("bigint").alias("n_rows"),
        F.sum("term").cast("double").alias("psi"),
        # tie-break on the LOWEST bucket when terms tie (max_by alone is
        # nondeterministic across partitionings — would break the
        # byte-identical-replay guarantee)
        F.max_by("bucket", F.struct(F.col("term"), -F.col("bucket")))
        .cast("int")
        .alias("worst_bucket"),
        F.max("term").cast("double").alias("worst_term"),
    )


def psi_monitor_sink(
    value_col: str,
    ref_counts: dict[int, int],
    out_dir: str,
    bins: int = 10,
    width: float = 50.0,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch(df, batch_id)`` callback appending one
    PSI summary row per micro-batch to ``out_dir``."""
    write_out = idempotent_parquet_sink(out_dir)

    def monitor(df: DataFrame, batch_id: int) -> None:
        write_out(batch_psi(df, value_col, ref_counts, bins, width), batch_id)

    return monitor
