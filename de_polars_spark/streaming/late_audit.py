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


#: duration-string units → microseconds (the subset Spark's window()
#: accepts for epoch-aligned tumbling windows; months are NOT tumbling)
_UNITS_US = {
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def _duration_us(spec: str) -> int:
    """'30 minutes' → 1_800_000_000. Raises on units Spark's tumbling
    window does not epoch-align (months/years)."""
    n, unit = spec.strip().split()
    unit = unit.rstrip("s").lower()
    if unit not in _UNITS_US:
        raise ValueError(
            f"unsupported tumbling-window unit {unit!r}; use one of "
            f"{sorted(_UNITS_US)} (Spark's window() epoch alignment)"
        )
    return int(n) * _UNITS_US[unit]


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

    Window ends are epoch-aligned integer-microsecond arithmetic —
    exactly how Spark's ``window(ts, w)`` buckets tumbling windows for
    ANY duration (a first cut hard-coded ``date_trunc('hour')``, which
    only agrees with native semantics at the default '1 hour').

    Output per batch: ``(batch_id, n_rows, n_late_dropped, dropped_pct,
    watermark)`` — watermark as a string ('' for the first batch, whose
    watermark is unset and drops nothing).
    """
    w_us = _duration_us(window)
    d_us = _duration_us(delay)
    ev = df.select(
        (F.col(arrival_col) / batch_size).cast("bigint").alias("batch_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us"),
    )
    bmax = ev.groupBy("batch_id").agg(F.max("__us").alias("__mx"))
    from pyspark.sql import Window as W

    wprev = (
        W.orderBy("batch_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    wm = bmax.select(
        "batch_id",
        (F.max("__mx").over(wprev) - F.lit(d_us)).alias("__wm"),
    )
    wend = (F.expr(f"__us div {w_us}") + F.lit(1)) * F.lit(w_us)
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
                F.date_format(
                    F.timestamp_micros(F.min("__wm")), "yyyy-MM-dd HH:mm:ss"
                ),
                F.lit(""),
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
    w_us = _duration_us(window)
    d_us = _duration_us(delay)

    def audit(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        state_exists = any(
            name.startswith("batch_id=")
            for name in fsutil.child_names(spark, state_dir)
        )
        wm_us = None
        if state_exists:
            prior = (
                spark.read.parquet(state_dir)
                .filter(F.col("batch_id") < batch_id)
                .agg(F.max("max_us").alias("mx"))
                .collect()[0]["mx"]
            )
            if prior is not None:
                wm_us = int(prior) - d_us
        us = F.unix_micros(F.col(ts_col).cast("timestamp"))
        # epoch-aligned tumbling window, all-integer micros (modulo, not
        # double division — exact at any epoch offset); matches Spark's
        # window(ts, w) bucketing for any duration. Post-1970 events
        # assumed (integer % is not floor-mod for negatives).
        wstart_us = us - us % F.lit(w_us)
        wend = wstart_us + F.lit(w_us)
        if wm_us is None:
            classified = df.withColumn("__late", F.lit(False))
        else:
            classified = df.withColumn("__late", wend <= F.lit(wm_us))
        kept = classified.filter(~F.col("__late"))
        write_out(
            kept.groupBy(
                F.timestamp_micros(wstart_us).alias("window_start")
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
            df.agg(
                F.max(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias(
                    "max_us"
                )
            ),
            batch_id,
        )

    return audit
