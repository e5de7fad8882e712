"""Late-event accounting for watermarked windowed aggregation.

Structured Streaming's watermark DROPS late rows silently: an event
whose window end is at or below the current watermark never reaches the
aggregation state, and nothing in the query's output says how much data
was lost. A production pipeline needs that number — data-loss accounting
is the first question when a downstream daily total looks low.

``late_audit_sink`` re-implements the watermark rule explicitly in a
``foreachBatch`` callback over the RAW (un-watermarked) stream, so every
row is seen and classified:

- the watermark basis is the max event time over all PRIOR batches
  (Spark updates the global watermark between micro-batches — a batch
  never drops rows based on its own maximum, and neither does this);
- a row is late-dropped iff ``window_end(ts) <= watermark`` — exactly
  the rule ``withWatermark(...).groupBy(window(...))`` applies;
- kept rows append per-window partial aggregates, and one audit row per
  micro-batch records ``(batch_id, n_rows, n_late_dropped, watermark)``.

State (the running max event time) and both outputs go through the
committed batch-directory protocol (``sink.idempotent_parquet_sink``),
so replays converge: a replayed batch sees its committed directories and
skips, and the max-ts state is itself per-batch committed (recomputing
the basis from committed batches <= replay point gives the same
watermark the original run used).

Scale shape: per batch one map-only classification (the watermark is a
1-row broadcast literal), one map-side-combinable window aggregation of
the kept rows, one 1-row audit aggregate. The state read is a parquet
scan of one max-ts row per committed batch — bounded by batch count,
not data volume.

Batch twin: ``late_arrival_audit`` (same rule over an explicit arrival
order + batch size) backs the oracle-checked inventory query
``streaming_late_arrival_audit`` — the driver-verifiable form of the
exact semantics the sink runs, same pairing as
``neardup_admission`` / ``neardup_ingest``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from de_polars_spark.streaming import fsutil
from de_polars_spark.streaming.sink import idempotent_parquet_sink


def late_arrival_audit(
    df: DataFrame,
    arrival_col: str,
    ts_col: str,
    batch_size: int,
    window: str = "1 hour",
    delay: str = "1 hour",
) -> DataFrame:
    """Batch form: replay ``df`` in ``arrival_col`` order as batches of
    ``batch_size`` and account per batch what a watermarked tumbling
    ``window`` aggregation with ``delay`` would have dropped.

    Output per batch: ``(batch_id, n_rows, n_late_dropped, dropped_pct,
    watermark)`` — watermark as a string ('' for the first batch, whose
    watermark is unset and drops nothing).
    """
    ev = df.select(
        (F.col(arrival_col) / batch_size).cast("bigint").alias("batch_id"),
        F.col(ts_col).alias("__ts"),
    )
    bmax = ev.groupBy("batch_id").agg(F.max("__ts").alias("__mx"))
    from pyspark.sql import Window as W

    wprev = (
        W.orderBy("batch_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    wm = bmax.select(
        "batch_id",
        (F.max("__mx").over(wprev) - F.expr(f"INTERVAL {delay}")).alias("__wm"),
    )
    wend = F.date_trunc("hour", F.col("__ts")) + F.expr(f"INTERVAL {window}")
    return (
        ev.join(wm, "batch_id")
        .groupBy("batch_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(
                (F.col("__wm").isNotNull() & (wend <= F.col("__wm"))).cast(
                    "bigint"
                )
            ).alias("n_late_dropped"),
            F.coalesce(
                F.date_format(F.min("__wm"), "yyyy-MM-dd HH:mm:ss"), F.lit("")
            ).alias("watermark"),
        )
        .select(
            "batch_id",
            "n_rows",
            "n_late_dropped",
            F.round(F.col("n_late_dropped") / F.col("n_rows"), 6).alias(
                "dropped_pct"
            ),
            "watermark",
        )
    )


def late_audit_sink(
    ts_col: str,
    value_col: str,
    state_dir: str,
    out_dir: str,
    audit_dir: str,
    window: str = "1 hour",
    delay: str = "1 hour",
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch(df, batch_id)`` callback over a RAW stream.

    Writes per-window partial aggregates of kept rows to ``out_dir``
    (``window_start, n_events, total_value`` — mergeable partials, sum
    downstream for finals), one audit row per batch to ``audit_dir``,
    and the batch's max event time to ``state_dir``.
    """
    write_out = idempotent_parquet_sink(out_dir)
    write_audit = idempotent_parquet_sink(audit_dir)
    write_state = idempotent_parquet_sink(state_dir)

    def audit(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        state_exists = any(
            name.startswith("batch_id=")
            for name in fsutil.child_names(spark, state_dir)
        )
        wm = None
        if state_exists:
            prior = (
                spark.read.parquet(state_dir)
                .filter(F.col("batch_id") < batch_id)
                .agg(F.max("max_ts").alias("mx"))
                .collect()[0]["mx"]
            )
            if prior is not None:
                wm = prior
        wend = F.date_trunc("hour", F.col(ts_col)) + F.expr(f"INTERVAL {window}")
        if wm is None:
            classified = df.withColumn("__late", F.lit(False))
        else:
            wm_col = F.lit(wm).cast("timestamp") - F.expr(f"INTERVAL {delay}")
            classified = df.withColumn("__late", wend <= wm_col)
        kept = classified.filter(~F.col("__late"))
        write_out(
            kept.groupBy(
                F.date_trunc("hour", F.col(ts_col)).alias("window_start")
            ).agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.sum(F.col(value_col).cast("decimal(38,6)"))
                .cast("double")
                .alias("total_value"),
            ),
            batch_id,
        )
        write_audit(
            classified.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(F.col("__late").cast("bigint")).alias("n_late_dropped"),
            ),
            batch_id,
        )
        write_state(
            df.agg(F.max(F.col(ts_col)).alias("max_ts")), batch_id
        )

    return audit
