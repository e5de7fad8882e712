"""Sessionization: native session_window (batch + streaming) and the
applyInPandasWithState custom stateful operator must all agree."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from de_polars_spark.streaming import run_stream_to_memory
from de_polars_spark.streaming.sessionize import session_agg, sessionize_stateful

SCHEMA = "user_id long, ts timestamp, value double"
T0 = datetime(2025, 3, 1, 10, 0, 0)


def _events():
    m = lambda mins: T0 + timedelta(minutes=mins)
    return [
        # user 1: two sessions (gap at +90min > 30min gap)
        (1, m(0), 1.0),
        (1, m(10), 2.0),
        (1, m(25), 3.0),
        (1, m(90), 4.0),
        (1, m(100), 5.0),
        # user 2: one session, single event
        (2, m(5), 10.0),
        # user 3: three sessions of one event each
        (3, m(0), 1.0),
        (3, m(60), 1.0),
        (3, m(120), 1.0),
    ]


def _key(rows):
    return sorted(
        (
            r["user_id"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
            round(r["total_value"], 6),
        )
        for r in rows
    )


EXPECTED = [
    (1, T0, T0 + timedelta(minutes=55), 3, 6.0),
    (1, T0 + timedelta(minutes=90), T0 + timedelta(minutes=130), 2, 9.0),
    (2, T0 + timedelta(minutes=5), T0 + timedelta(minutes=35), 1, 10.0),
    (3, T0, T0 + timedelta(minutes=30), 1, 1.0),
    (3, T0 + timedelta(minutes=60), T0 + timedelta(minutes=90), 1, 1.0),
    (3, T0 + timedelta(minutes=120), T0 + timedelta(minutes=150), 1, 1.0),
]


def test_session_agg_batch(spark):
    df = spark.createDataFrame(_events(), SCHEMA)
    assert _key(session_agg(df, gap="30 minutes").collect()) == EXPECTED


def test_session_agg_streaming_matches_batch(spark, tmp_path):
    # streaming session windows are append-only: a session is emitted once
    # the watermark passes its end, so a late sentinel closes them all
    src = tmp_path / "src"
    spark.createDataFrame(_events(), SCHEMA).write.parquet(str(src))
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    query = run_stream_to_memory(
        session_agg(stream, gap="30 minutes", watermark="0 seconds"),
        "sessions_t",
        output_mode="append",
    )
    try:
        query.processAllAvailable()
        sentinel = [(99, T0 + timedelta(days=2), 0.0)]
        spark.createDataFrame(sentinel, SCHEMA).write.mode("append").parquet(str(src))
        query.processAllAvailable()
        rows = spark.sql("SELECT * FROM sessions_t WHERE user_id < 99").collect()
    finally:
        query.stop()
    assert _key(rows) == EXPECTED


def test_sessionize_stateful_matches_native(spark, tmp_path):
    # one file per write => one micro-batch per write, deterministic order
    # (multi-file batches would advance the watermark across files and
    # time out sessions before their later events arrive)
    src = tmp_path / "src"
    spark.createDataFrame(_events(), SCHEMA).coalesce(1).write.parquet(str(src))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = sessionize_stateful(stream, gap_minutes=30)
    query = run_stream_to_memory(out, "stateful_t", output_mode="append")
    try:
        query.processAllAvailable()
        # a far-future sentinel for user 99 pushes the watermark past every
        # open session's timeout, forcing the event-time timeouts to fire
        sentinel = [(99, T0 + timedelta(days=2), 0.0)]
        spark.createDataFrame(sentinel, SCHEMA).write.mode("append").parquet(str(src))
        query.processAllAvailable()
        spark.createDataFrame(  # one more batch so the new watermark is applied
            [(99, T0 + timedelta(days=2, minutes=1), 0.0)], SCHEMA
        ).write.mode("append").parquet(str(src))
        query.processAllAvailable()
        rows = spark.sql("SELECT * FROM stateful_t WHERE user_id < 99").collect()
    finally:
        query.stop()
    assert _key(rows) == EXPECTED


def test_dedup_stream_suppresses_duplicates(spark, tmp_path):
    from de_polars_spark.streaming.dedup_stream import dedup_stream

    src = tmp_path / "docs"
    rows1 = [(1, "alpha text", T0), (2, "beta text", T0), (3, "alpha text", T0)]
    schema = "doc_id long, text string, ts timestamp"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(str(src))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = dedup_stream(stream, "text", "ts", watermark="1 hour")
    query = run_stream_to_memory(out, "dedup_t", output_mode="append")
    try:
        query.processAllAvailable()
        # a later batch re-sends "alpha text" within the watermark: suppressed
        rows2 = [(4, "alpha text", T0 + timedelta(minutes=5)), (5, "gamma text", T0)]
        spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(str(src))
        query.processAllAvailable()
        emitted = {r["doc_id"] for r in spark.sql("SELECT * FROM dedup_t").collect()}
    finally:
        query.stop()
    # exactly one alpha (in-batch winner is engine-order dependent), one
    # beta, one gamma; the cross-batch duplicate (id 4) is suppressed
    assert len(emitted & {1, 3}) == 1 and 2 in emitted and 5 in emitted
    assert 4 not in emitted and len(emitted) == 3


def test_dedup_stream_batch_parity(spark):
    from de_polars_spark.streaming.dedup_stream import dedup_stream

    df = spark.createDataFrame(
        [(1, "a", T0), (2, "a", T0), (3, "b", T0)], "doc_id long, text string, ts timestamp"
    )
    out = dedup_stream(df, "text", "ts")
    assert out.count() == 2
