"""Structured Streaming cost alerts: file-source stream, watermarked
tumbling window, thresholded alert events, batch/stream agreement."""

from __future__ import annotations

from datetime import datetime

import pytest

from de_polars_spark.streaming import (
    cost_alerts,
    run_stream_to_memory,
    windowed_costs,
)

SCHEMA = (
    "line_item_usage_start_date timestamp, line_item_product_code string, "
    "line_item_unblended_cost double"
)


def _rows(hour: int, svc: str, costs: list[float]):
    return [
        (datetime(2025, 1, 1, hour, 5 * i), svc, c) for i, c in enumerate(costs)
    ]


@pytest.fixture()
def source_dir(spark, tmp_path):
    batch1 = _rows(9, "AmazonEC2", [60.0, 70.0]) + _rows(9, "AmazonS3", [5.0])
    spark.createDataFrame(batch1, SCHEMA).write.parquet(str(tmp_path / "b1"))
    return tmp_path


def test_windowed_costs_batch_semantics(spark, source_dir):
    df = spark.read.schema(SCHEMA).parquet(str(source_dir / "b1"))
    out = {
        (r["service"], r["window_start"].hour): r["current_cost"]
        for r in windowed_costs(df).collect()
    }
    assert out[("AmazonEC2", 9)] == 130.0
    assert out[("AmazonS3", 9)] == 5.0


def test_stream_incremental_and_alerts(spark, source_dir, tmp_path):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(source_dir / "b1"))
    )
    alerts = cost_alerts(windowed_costs(stream), threshold=50.0)
    query = run_stream_to_memory(alerts, "alerts_t")

    def latest(service: str) -> dict:
        # update mode emits one row per micro-batch that changed the key;
        # the live value is the most recent (highest running total)
        rows = spark.sql(
            f"SELECT * FROM alerts_t WHERE service = '{service}' "
            "ORDER BY current_cost DESC LIMIT 1"
        ).collect()
        return rows[0].asDict() if rows else {}

    try:
        query.processAllAvailable()
        alert = latest("AmazonEC2")
        assert alert["current_cost"] == 130.0
        assert alert["alert_type"] == "threshold_reached"
        assert alert["severity"] == "high"  # 130/50 = 2.6x
        assert alert["alert_id"].startswith("alert_AmazonEC2_2025010109")
        assert not latest("AmazonS3")  # 5.0 under threshold, never alerts
        # second batch arrives: same window's running total goes critical
        spark.createDataFrame(
            _rows(9, "AmazonEC2", [80.0]), SCHEMA
        ).write.mode("append").parquet(str(source_dir / "b1"))
        query.processAllAvailable()
        updated = latest("AmazonEC2")
        assert updated["current_cost"] == 210.0
        assert updated["severity"] == "critical"  # 4.2x
    finally:
        query.stop()


def test_stream_matches_batch(spark, source_dir):
    """Same logical query, batch and streaming, same totals."""
    batch = windowed_costs(
        spark.read.schema(SCHEMA).parquet(str(source_dir / "b1"))
    ).collect()
    stream = (
        spark.readStream.schema(SCHEMA).parquet(str(source_dir / "b1"))
    )
    query = run_stream_to_memory(
        windowed_costs(stream), "windowed_t", output_mode="update"
    )
    try:
        query.processAllAvailable()
        streamed = spark.sql(
            "SELECT service, window_start, current_cost FROM windowed_t"
        ).collect()
    finally:
        query.stop()
    assert {
        (r["service"], r["window_start"], r["current_cost"]) for r in streamed
    } == {(r["service"], r["window_start"], r["current_cost"]) for r in batch}


def test_severity_ladder(spark):
    df = spark.createDataFrame(
        _rows(9, "A", [55.0]) + _rows(9, "B", [101.0]) + _rows(9, "C", [450.0]),
        SCHEMA,
    )
    sev = {
        r["service"]: r["severity"]
        for r in cost_alerts(windowed_costs(df), 50.0).collect()
    }
    assert sev == {"A": "low", "B": "high", "C": "critical"}
