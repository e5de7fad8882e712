"""Streaming cost alerts: watermark + tumbling window + threshold.

Produces the ``cost_alert`` events whose schema the reference's MCP
stream config promises (mcp_integration.py:386-401: alert_id, alert_type,
service, current_cost, threshold, severity, timestamp) from a live
Structured Streaming source instead of a mock.

Design for scale:
- the aggregation is a standard watermarked tumbling-window groupBy —
  state store size is bounded by (services x windows inside the
  watermark), and late rows beyond the watermark are dropped instead of
  growing state forever;
- alerts are a stateless projection over the windowed aggregate, so the
  whole pipeline is expressible without Python UDFs and runs fully
  JVM-side;
- sinks are the caller's choice (foreachBatch / kafka / memory); tests
  use the memory sink via :func:`run_stream_to_memory`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: severity ladder over cost/threshold ratio (our extension; the
#: reference only enumerates the severity values, mcp_integration.py:395)
SEVERITY = (
    (4.0, "critical"),
    (2.0, "high"),
    (1.2, "medium"),
)


def windowed_costs(
    stream: DataFrame,
    time_col: str = "line_item_usage_start_date",
    service_col: str = "line_item_product_code",
    cost_col: str = "line_item_unblended_cost",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(window, service) cost totals with late-data bound.

    Works on both streaming and batch DataFrames (batch ignores the
    watermark) — the same logical query, which is the point of the
    Structured Streaming model."""
    if stream.isStreaming:
        stream = stream.withWatermark(time_col, watermark)
    return (
        stream.groupBy(
            F.window(F.col(time_col), window_duration).alias("window"),
            F.col(service_col).alias("service"),
        )
        .agg(
            F.sum(cost_col).alias("current_cost"),
            F.count(F.lit(1)).alias("line_items"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "service",
            "current_cost",
            "line_items",
        )
    )


def cost_alerts(windowed: DataFrame, threshold: float) -> DataFrame:
    """Thresholded ``cost_alert`` events (schema:
    mcp_integration.py:386-401)."""
    ratio = F.col("current_cost") / F.lit(threshold)
    severity = F.when(ratio >= SEVERITY[0][0], SEVERITY[0][1])
    for cutoff, label in SEVERITY[1:]:
        severity = severity.when(ratio >= cutoff, label)
    severity = severity.otherwise("low")
    return windowed.filter(F.col("current_cost") > threshold).select(
        F.concat_ws(
            "_",
            F.lit("alert"),
            F.col("service"),
            F.date_format("window_start", "yyyyMMddHH"),
        ).alias("alert_id"),
        F.lit("threshold_reached").alias("alert_type"),
        "service",
        "current_cost",
        F.lit(threshold).alias("threshold"),
        severity.alias("severity"),
        F.col("window_end").alias("timestamp"),
    )


def run_stream_to_memory(stream: DataFrame, name: str, output_mode: str = "update"):
    """Start a memory-sink query for tests/demos; caller drives it with
    ``query.processAllAvailable()`` and reads ``SELECT * FROM <name>``."""
    return (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
