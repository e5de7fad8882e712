"""Structured Streaming extensions (beyond-parity).

The reference has no streaming execution at all — its only stream
artifact is a static WebSocket config dict (mcp_integration.py:353-434,
served verbatim by analytics/mcp.py here). This package implements the
events that config *describes* as a real Structured Streaming pipeline:
watermarked tumbling-window cost aggregation over a CUR-shaped stream,
thresholded into ``cost_alert`` events with the exact schema the MCP
stream-config advertises — plus gap-based sessionization (native
``session_window`` and an ``applyInPandasWithState`` stateful template).
"""

from de_polars_spark.streaming.cost_alerts import (
    cost_alerts,
    run_stream_to_memory,
    windowed_costs,
)
from de_polars_spark.streaming.dedup_stream import dedup_stream
from de_polars_spark.streaming.dedup_ingest import dedup_ingest_sink
from de_polars_spark.streaming.enrich import enrich_stream
from de_polars_spark.streaming.interval_join import interval_join_backward
from de_polars_spark.streaming.sessionize import session_agg, sessionize_stateful
from de_polars_spark.streaming.drift_monitor import batch_psi, psi_monitor_sink
from de_polars_spark.streaming.late_audit import late_arrival_audit, late_audit_sink
from de_polars_spark.streaming.neardup_ingest import neardup_ingest_sink
from de_polars_spark.streaming.quota_ingest import quota_ingest_sink
from de_polars_spark.streaming.sink import idempotent_parquet_sink
from de_polars_spark.streaming.vector_ingest import ivfpq_ingest_sink
from de_polars_spark.streaming.sketch_stream import (
    hll_estimate,
    windowed_cms_cells,
    windowed_hll_registers,
)

__all__ = [
    "windowed_costs",
    "cost_alerts",
    "run_stream_to_memory",
    "session_agg",
    "sessionize_stateful",
    "dedup_stream",
    "interval_join_backward",
    "enrich_stream",
    "dedup_ingest_sink",
    "windowed_hll_registers",
    "hll_estimate",
    "windowed_cms_cells",
    "idempotent_parquet_sink",
    "late_arrival_audit",
    "late_audit_sink",
    "quota_ingest_sink",
    "neardup_ingest_sink",
    "ivfpq_ingest_sink",
    "batch_psi",
    "psi_monitor_sink",
]
