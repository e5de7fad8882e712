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


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """Stream-stream interval join == the same join on batch frames."""
    from de_polars_spark.streaming import interval_join_backward, run_stream_to_memory

    p_schema = "pid int, user_id int, p_ts timestamp"
    v_schema = "user_id int, v_ts timestamp"
    t0 = datetime(2025, 1, 1, 9, 0)

    def ts(minutes):
        return datetime(2025, 1, 1, 9, minutes)

    purchases = [(1, 7, ts(30)), (2, 7, ts(59)), (3, 8, ts(10))]
    views = [(7, ts(25)), (7, ts(29)), (7, ts(45)), (8, ts(50)), (9, ts(5))]
    spark.createDataFrame(purchases, p_schema).write.parquet(str(tmp_path / "p"))
    spark.createDataFrame(views, v_schema).write.parquet(str(tmp_path / "v"))

    def run(pdf, vdf):
        return interval_join_backward(
            pdf, vdf, ["user_id"], "p_ts", "v_ts", 600, watermark="1 hour"
        )

    batch = run(
        spark.read.schema(p_schema).parquet(str(tmp_path / "p")),
        spark.read.schema(v_schema).parquet(str(tmp_path / "v")),
    ).collect()
    # purchase 1 (9:30) matches views 9:25+9:29 (>=9:20); purchase 2 (9:59)
    # matches 9:45? no — 9:45 < 9:49 lower bound -> no match; purchase 3
    # (9:10) has no earlier view for user 8
    assert {(r.pid, r.v_ts.minute) for r in batch} == {(1, 25), (1, 29)}

    streamed = run(
        spark.readStream.schema(p_schema).parquet(str(tmp_path / "p")),
        spark.readStream.schema(v_schema).parquet(str(tmp_path / "v")),
    )
    query = run_stream_to_memory(streamed, "ij_t", output_mode="append")
    try:
        query.processAllAvailable()
        got = spark.sql("SELECT pid, v_ts FROM ij_t").collect()
    finally:
        query.stop()
    assert {(r.pid, r.v_ts.minute) for r in got} == {(1, 25), (1, 29)}


def test_windowed_hll_stream_matches_batch(spark, tmp_path):
    """Streaming HLL register table == batch register table on the same
    data, and the folded estimate is within sketch error of the truth."""
    from de_polars_spark.streaming import hll_estimate, windowed_hll_registers

    schema = "ts timestamp, grp string, uid long"
    rows = [
        (datetime(2025, 1, 1, h, m), g, uid)
        for g, base in (("a", 0), ("b", 5000))
        for h in (9, 10)
        for m in range(0, 60, 7)
        for uid in (base + m, base + m + 1)
    ]
    spark.createDataFrame(rows, schema).write.parquet(str(tmp_path / "d"))
    batch_df = spark.read.schema(schema).parquet(str(tmp_path / "d"))
    batch = windowed_hll_registers(batch_df, "ts", "grp", "uid", "1 hour")
    got_batch = {
        (r.window_start, r.grp, r.reg): r.rho for r in batch.collect()
    }

    stream = spark.readStream.schema(schema).parquet(str(tmp_path / "d"))
    q = run_stream_to_memory(
        windowed_hll_registers(stream, "ts", "grp", "uid", "1 hour"),
        "hll_t",
        output_mode="update",
    )
    try:
        q.processAllAvailable()
        got_stream = {
            (r.window_start, r.grp, r.reg): r.rho
            for r in spark.sql("SELECT * FROM hll_t").collect()
        }
    finally:
        q.stop()
    assert got_stream == got_batch

    est = {
        (r.window_start.hour, r.grp): r.estimate
        for r in hll_estimate(batch).collect()
    }
    # truth: 17-18 distinct uids per (hour, grp); linear counting regime
    for k, v in est.items():
        assert 10 <= v <= 30, (k, v)


def test_idempotent_sink_skips_replayed_batches(spark, tmp_path):
    """A replayed batch_id must not duplicate rows; half-written staging
    dirs from a crash are cleaned up and rewritten."""
    from de_polars_spark.streaming import idempotent_parquet_sink

    out = str(tmp_path / "sink")
    sink = idempotent_parquet_sink(out)
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    sink(df1, 0)
    sink(spark.createDataFrame([(3, "c")], "id int, v string"), 1)
    # crash replay: batch 1 delivered again with different content — the
    # committed version must win
    sink(spark.createDataFrame([(99, "dup")], "id int, v string"), 1)
    got = {r.id for r in spark.read.parquet(out).collect()}
    assert got == {1, 2, 3}
    # provenance partition column is exposed
    assert "batch_id" in spark.read.parquet(out).columns
    # a crashed half-write (staging left behind) is replaced cleanly
    import os
    os.makedirs(os.path.join(out, "_staging_2"))
    sink(spark.createDataFrame([(4, "d")], "id int, v string"), 2)
    got = {r.id for r in spark.read.parquet(out).collect()}
    assert got == {1, 2, 3, 4}


def test_enrich_stream_matches_batch(spark, tmp_path):
    """Stream-static broadcast enrichment == the same join on batch."""
    from de_polars_spark.streaming import enrich_stream, run_stream_to_memory

    e_schema = "event_id int, user_id int, value double"
    events = [(1, 7, 2.0), (2, 8, 3.0), (3, 9, 5.0)]
    dim = spark.createDataFrame(
        [(7, "gold"), (8, "silver")], "user_id int, tier string"
    )
    spark.createDataFrame(events, e_schema).write.parquet(str(tmp_path / "e"))

    batch = enrich_stream(
        spark.read.schema(e_schema).parquet(str(tmp_path / "e")), dim, ["user_id"]
    ).collect()
    assert {(r.event_id, r.tier) for r in batch} == {
        (1, "gold"), (2, "silver"), (3, None)
    }

    streamed = enrich_stream(
        spark.readStream.schema(e_schema).parquet(str(tmp_path / "e")),
        dim,
        ["user_id"],
    )
    q = run_stream_to_memory(streamed, "enr_t", output_mode="append")
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT event_id, tier FROM enr_t").collect()
    finally:
        q.stop()
    assert {(r.event_id, r.tier) for r in got} == {(r.event_id, r.tier) for r in batch}


def test_enrich_stream_rejects_streaming_dim(spark, tmp_path):
    from de_polars_spark.streaming import enrich_stream

    e_schema = "event_id int, user_id int"
    spark.createDataFrame([(1, 7)], e_schema).write.parquet(str(tmp_path / "e2"))
    s = spark.readStream.schema(e_schema).parquet(str(tmp_path / "e2"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="static"):
        enrich_stream(s, s, ["user_id"])


def test_windowed_cms_stream_matches_batch(spark, tmp_path):
    """Streaming CMS cell table == batch cell table, and the point-query
    min-over-rows bounds the true count from above (CMS guarantee)."""
    from de_polars_spark.streaming import run_stream_to_memory
    from de_polars_spark.streaming.sketch_stream import windowed_cms_cells

    schema = "uid int, grp string, ts timestamp"
    rows = [
        (7, "A", datetime(2025, 3, 1, 10, m)) for m in range(10)
    ] + [(8, "A", datetime(2025, 3, 1, 10, 30))]
    spark.createDataFrame(rows, schema).write.parquet(str(tmp_path / "cms"))

    batch_df = windowed_cms_cells(
        spark.read.schema(schema).parquet(str(tmp_path / "cms")),
        "ts", "uid", "1 hour", depth=4, width=64,
    )
    batch = {(r.window_start, r.j, r.cell): r.n for r in batch_df.collect()}
    # per depth row j, total cell mass == number of events
    from collections import Counter
    per_j = Counter()
    for (w, j, c), n in batch.items():
        per_j[j] += n
    assert all(v == 11 for v in per_j.values())
    # point query for uid 7: min over its 4 cells >= true count (10)
    import hashlib
    def cell_of(key, j, width=64):
        h = int(hashlib.md5(f"{key}#{j}".encode()).hexdigest()[:15], 16)
        return h % width
    est = min(batch[(w, j, cell_of(7, j))] for (w, j, c) in list(batch)[:1] for j in range(4))
    assert est >= 10

    streamed = windowed_cms_cells(
        spark.readStream.schema(schema).parquet(str(tmp_path / "cms")),
        "ts", "uid", "1 hour", depth=4, width=64,
    )
    q = run_stream_to_memory(streamed, "cms_t", output_mode="complete")
    try:
        q.processAllAvailable()
        got = {
            (r.window_start, r.j, r.cell): r.n
            for r in spark.sql("SELECT * FROM cms_t").collect()
        }
    finally:
        q.stop()
    assert got == batch


def test_dedup_ingest_across_batches_and_replay(spark, tmp_path):
    """Streaming ingest dedups against ALL history; a replayed batch_id
    is a no-op (exactly-once content on replay)."""
    from de_polars_spark.streaming.dedup_ingest import dedup_ingest_sink

    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    ingest = dedup_ingest_sink("doc_id", "text", state, out)

    b0 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")],  # 3 dups 1 in-batch
        "doc_id int, text string",
    )
    ingest(b0, 0)
    got0 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got0 == {1, 2}  # min-id keeper for 'alpha'

    b1 = spark.createDataFrame(
        [(4, "beta"), (5, "gamma")],  # beta seen in history
        "doc_id int, text string",
    )
    ingest(b1, 1)
    got1 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got1 == {1, 2, 5}

    # replay batch 1 (same id) — committed dirs detected, nothing changes
    ingest(b1, 1)
    again = [r.doc_id for r in spark.read.parquet(out).collect()]
    assert sorted(again) == [1, 2, 5]
    # state holds exactly the three distinct fingerprints
    assert spark.read.parquet(state).select("fp").distinct().count() == 3


def test_dedup_ingest_runs_as_stream(spark, tmp_path):
    from de_polars_spark.streaming.dedup_ingest import dedup_ingest_sink

    src = str(tmp_path / "src")
    schema = "doc_id int, text string"
    spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "x")], schema
    ).write.parquet(src)
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    q = (
        spark.readStream.schema(schema)
        .parquet(src)
        .writeStream.foreachBatch(dedup_ingest_sink("doc_id", "text", state, out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 2}


def test_quota_ingest_enforces_lifetime_cap(spark, tmp_path):
    """Per-source admission stops at the cap across batches; admission
    within a batch is deterministic (lowest ids win); replay is a no-op."""
    from de_polars_spark.streaming.quota_ingest import quota_ingest_sink

    state, out = str(tmp_path / "state"), str(tmp_path / "out")
    ingest = quota_ingest_sink("doc_id", "source", 2, state, out)

    b0 = spark.createDataFrame(
        [(3, "a"), (1, "a"), (2, "a"), (10, "b")],
        "doc_id int, source string",
    )
    ingest(b0, 0)
    got0 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got0 == {1, 2, 10}  # a capped at 2, lowest ids

    b1 = spark.createDataFrame(
        [(4, "a"), (11, "b"), (12, "b"), (20, "c")],
        "doc_id int, source string",
    )
    ingest(b1, 1)
    got1 = {r.doc_id for r in spark.read.parquet(out).collect()}
    # a already full; b admits 1 more (lowest id 11); c admits 1
    assert got1 == {1, 2, 10, 11, 20}

    ingest(b1, 1)  # replay: committed batch dirs detected, no change
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == got1
    from pyspark.sql import functions as SF

    per_src = {
        r["source"]: r["n"]
        for r in spark.read.parquet(out)
        .groupBy("source")
        .agg(SF.count(SF.lit(1)).alias("n"))
        .collect()
    }
    assert all(v <= 2 for v in per_src.values())


def test_quota_ingest_runs_as_stream(spark, tmp_path):
    from de_polars_spark.streaming.quota_ingest import quota_ingest_sink

    src = str(tmp_path / "src")
    schema = "doc_id int, source string"
    spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b")], schema
    ).write.parquet(src)
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    q = (
        spark.readStream.schema(schema)
        .parquet(src)
        .writeStream.foreachBatch(
            quota_ingest_sink("doc_id", "source", 2, state, out)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 2, 4}


def test_neardup_ingest_across_batches_and_replay(spark, tmp_path):
    """MinHash-LSH streaming admission: near-dups of admitted history
    (and of lower-id batchmates) are rejected; replay is a no-op."""
    from de_polars_spark.streaming.neardup_ingest import neardup_ingest_sink

    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    ingest = neardup_ingest_sink("doc_id", "text", state, out)

    b0 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # near-dup of 1
            (3, "completely different text about spark engines"),
        ],
        "doc_id long, text string",
    )
    ingest(b0, 0)
    got0 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got0 == {1, 3}  # 2 collides with lower-id batchmate 1

    b1 = spark.createDataFrame(
        [
            (4, "the quick brown fox jumps over the lazy dog"),  # history hit
            (5, "an entirely fresh sentence with novel words"),
        ],
        "doc_id long, text string",
    )
    ingest(b1, 1)
    got1 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got1 == {1, 3, 5}

    ingest(b1, 1)  # replay: committed batch dirs detected, no change
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 3, 5}
    # state covers exactly the admitted docs' band keys
    n_bands = 8 // 2
    assert spark.read.parquet(state).count() <= 3 * n_bands


def test_neardup_ingest_runs_as_stream(spark, tmp_path):
    from de_polars_spark.streaming.neardup_ingest import neardup_ingest_sink

    src = str(tmp_path / "src")
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "unrelated words entirely here"),
        ],
        schema,
    ).write.parquet(src)
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    q = (
        spark.readStream.schema(schema)
        .parquet(src)
        .writeStream.foreachBatch(
            neardup_ingest_sink("doc_id", "text", state, out)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 3}


def test_sink_and_state_work_on_scheme_qualified_paths(spark, tmp_path):
    """The commit protocol and restart-state detection must work through
    the Hadoop FileSystem API, not the driver's os module: drive both
    with explicit file:// URIs (a non-local scheme as far as os.path is
    concerned — os.path.isdir('file:/...') is False) and assert the
    quota survives a 'restart' (fresh sink object, same state dir)."""
    from de_polars_spark.streaming import fsutil
    from de_polars_spark.streaming.quota_ingest import quota_ingest_sink

    state = "file://" + str(tmp_path / "state")
    out = "file://" + str(tmp_path / "out")
    b0 = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b")], "doc_id long, source string"
    )
    quota_ingest_sink("doc_id", "source", 2, state, out)(b0, 0)
    # restart: a NEW sink instance must see the committed state via the
    # Hadoop FS listing (os.listdir would miss the file:// URI)
    b1 = spark.createDataFrame(
        [(5, "a"), (6, "b"), (7, "b")], "doc_id long, source string"
    )
    quota_ingest_sink("doc_id", "source", 2, state, out)(b1, 1)
    got = sorted(
        (r["source"], r["doc_id"])
        for r in spark.read.parquet(out).collect()
    )
    # cap 2 per source across the lifetime: a admits 1,2 then nothing;
    # b admits 4 then 6
    assert got == [("a", 1), ("a", 2), ("b", 4), ("b", 6)]
    # replay of batch 1 after the 'crash' is a committed no-op
    quota_ingest_sink("doc_id", "source", 2, state, out)(b1, 1)
    assert sorted(
        (r["source"], r["doc_id"]) for r in spark.read.parquet(out).collect()
    ) == got
    assert set(fsutil.child_names(spark, out)) == {"batch_id=0", "batch_id=1"}


def _tiny_pq_fixture(spark):
    """(corpus, centroids, codebooks) for the vector-ingest tests: 4-dim
    vectors, 2 coarse cells, m=2 subspaces of 2 dims, 2 codewords."""
    from de_polars_spark.operators.pq import fit_pq

    data = [
        (i, [float(a), float(b), float(c), float(d)])
        for i, (a, b, c, d) in enumerate(
            [(0, 0, 1, 1), (0, 1, 1, 0), (4, 4, 5, 5), (4, 5, 5, 4),
             (1, 0, 0, 1), (5, 4, 4, 5), (2, 2, 2, 2), (3, 3, 3, 3)]
        )
    ]
    corpus = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    seeds_full = [v for _, v in data[:2]]
    cbs = fit_pq(corpus, "vec_id", "embedding", seeds_full, 2, 2, iterations=1)
    cents = [(0, data[0][1]), (1, data[2][1])]
    return corpus, data, cents, cbs


def test_ivfpq_ingest_stream_matches_batch_index(spark, tmp_path):
    """Appending micro-batches through the frozen-quantizer sink must
    serve EXACTLY the same top-k as a one-shot ivfpq_index over the
    full corpus — the persisted index is just the materialized encode,
    and replay must not change it."""
    from de_polars_spark.operators.pq import ivfpq_index, ivfpq_topk
    from de_polars_spark.streaming.vector_ingest import ivfpq_ingest_sink

    corpus, data, cents, cbs = _tiny_pq_fixture(spark)
    postings = str(tmp_path / "postings")
    ingest = ivfpq_ingest_sink("vec_id", "embedding", cents, cbs, postings)
    b0 = spark.createDataFrame(data[:5], "vec_id long, embedding array<double>")
    b1 = spark.createDataFrame(data[5:], "vec_id long, embedding array<double>")
    ingest(b0, 0)
    ingest(b1, 1)
    ingest(b1, 1)  # replay: committed, no duplicate postings

    served = spark.read.parquet(postings)
    assert served.count() == len(data)

    from pyspark.sql import functions as F

    queries = corpus.filter(F.col("vec_id") % 4 == 0)
    from_stream = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["adist"])
        for r in ivfpq_topk(
            served, queries, "vec_id", "embedding", cents, cbs, k=3, nprobe=2
        ).collect()
    }
    batch_index = ivfpq_index(corpus, "vec_id", "embedding", cents, cbs)
    from_batch = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["adist"])
        for r in ivfpq_topk(
            batch_index, queries, "vec_id", "embedding", cents, cbs,
            k=3, nprobe=2,
        ).collect()
    }
    assert from_stream == from_batch


def test_ivfpq_ingest_runs_as_stream(spark, tmp_path):
    from de_polars_spark.streaming.vector_ingest import ivfpq_ingest_sink

    _, data, cents, cbs = _tiny_pq_fixture(spark)
    src = str(tmp_path / "src")
    schema = "vec_id long, embedding array<double>"
    spark.createDataFrame(data, schema).write.parquet(src)
    postings = str(tmp_path / "postings")
    q = (
        spark.readStream.schema(schema)
        .parquet(src)
        .writeStream.foreachBatch(
            ivfpq_ingest_sink("vec_id", "embedding", cents, cbs, postings)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    served = spark.read.parquet(postings)
    assert served.count() == len(data)
    assert {c for c in served.columns} >= {"vec_id", "cell", "code_0", "code_1"}


def test_psi_monitor_stream_matches_batch(spark, tmp_path):
    """Each micro-batch's logged PSI row must equal the batch-mode
    computation over the same rows (shared batch_psi body), replay must
    not double-log, and a shifted batch must score drastically higher
    than an in-distribution one."""
    from de_polars_spark.streaming.drift_monitor import (
        batch_psi, psi_monitor_sink,
    )

    ref = {0: 50, 1: 30, 2: 20}
    out = str(tmp_path / "out")
    sink = psi_monitor_sink("value", ref, out, bins=4, width=10.0)

    b0 = spark.createDataFrame(
        [(float(v),) for v in [1, 2, 11, 12, 3, 21, 4, 13]], "value double"
    )
    b1 = spark.createDataFrame(  # shifted mass into the overflow bin
        [(float(v),) for v in [35, 36, 37, 38, 39]], "value double"
    )
    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)  # replay

    got = {
        r["batch_id"]: (r["n_rows"], r["psi"], r["worst_bucket"], r["worst_term"])
        for r in spark.read.parquet(out).collect()
    }
    assert set(got) == {0, 1}
    for bid, bdf in ((0, b0), (1, b1)):
        expect = batch_psi(bdf, "value", ref, bins=4, width=10.0).collect()[0]
        assert got[bid] == (
            expect["n_rows"], expect["psi"],
            expect["worst_bucket"], expect["worst_term"],
        )
    assert got[1][1] > 10 * got[0][1]  # the shifted batch screams


def test_psi_monitor_runs_as_stream(spark, tmp_path):
    from de_polars_spark.streaming.drift_monitor import psi_monitor_sink

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(float(v),) for v in [1, 2, 11, 35, 36]], "value double"
    ).write.parquet(src)
    out = str(tmp_path / "out")
    q = (
        spark.readStream.schema("value double")
        .parquet(src)
        .writeStream.foreachBatch(
            psi_monitor_sink("value", {0: 5, 1: 5}, out, bins=4, width=10.0)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1 and rows[0]["n_rows"] == 5


# --------------------------------------------------------------------- #
# late_audit: watermark-drop accounting                                  #
# --------------------------------------------------------------------- #
def test_late_audit_batches_and_replay(spark, tmp_path):
    """The sink classifies with the PRIOR batches' max ts minus delay
    (Spark's between-batch watermark), accounts drops per batch, and a
    replayed batch_id is a no-op."""
    from datetime import datetime

    from de_polars_spark.streaming.late_audit import late_audit_sink

    state = str(tmp_path / "st")
    out = str(tmp_path / "out")
    audit_dir = str(tmp_path / "aud")
    sink = late_audit_sink("ts", "value", state, out, audit_dir)
    schema = "ts timestamp, value double"

    def ts(h, m):
        return datetime(2025, 1, 1, h, m)

    # batch 0: no prior state -> nothing can drop, whatever the ts
    b0 = spark.createDataFrame([(ts(10, 5), 1.0), (ts(10, 50), 2.0)], schema)
    sink(b0, 0)
    # batch 1 advances the basis to 12:30; its own rows judged by batch
    # 0's max (10:50 - 1h = 9:50) -> on time
    b1 = spark.createDataFrame([(ts(12, 30), 4.0)], schema)
    sink(b1, 1)
    # batch 2: watermark now 12:30 - 1h = 11:30. The 10:15 row's window
    # ends 11:00 <= 11:30 -> dropped; 12:45 on time.
    b2 = spark.createDataFrame([(ts(10, 15), 8.0), (ts(12, 45), 16.0)], schema)
    sink(b2, 2)

    audit = {
        r["batch_id"]: (r["n_rows"], r["n_late_dropped"])
        for r in spark.read.parquet(audit_dir).collect()
    }
    assert audit == {0: (2, 0), 1: (1, 0), 2: (2, 1)}
    totals = (
        spark.read.parquet(out)
        .groupBy("window_start")
        .sum("n_events", "total_value")
        .collect()
    )
    got = {r["window_start"].hour: (r["sum(n_events)"], r["sum(total_value)"])
           for r in totals}
    # the 10:15/8.0 row is gone; hour 10 keeps only batch 0's rows
    assert got == {10: (2, 3.0), 12: (2, 20.0)}

    # replay batch 2: committed dirs detected, nothing changes
    sink(b2, 2)
    assert spark.read.parquet(audit_dir).count() == 3
    re = (
        spark.read.parquet(out)
        .groupBy()
        .sum("n_events")
        .collect()[0]["sum(n_events)"]
    )
    assert re == 4


def test_late_audit_sink_matches_batch_twin(spark):
    """Driving the sink with arrival-ordered batches reproduces the
    oracle-checked batch twin (late_arrival_audit) row for row."""
    import math
    from datetime import datetime, timedelta

    from de_polars_spark.streaming.late_audit import (
        late_arrival_audit,
        late_audit_sink,
    )
    import tempfile, os

    base = datetime(2025, 3, 1, 6, 0)
    # deterministic out-of-order arrival: event i carries a ts that jumps
    # back several hours on every 5th event
    rows = []
    for i in range(40):
        back = 7 if i % 5 == 4 else 0
        rows.append((i, base + timedelta(minutes=13 * i) - timedelta(hours=back), 1.0))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    twin = {
        r["batch_id"]: (r["n_rows"], r["n_late_dropped"])
        for r in late_arrival_audit(df, "event_id", "ts", 8).collect()
    }
    with tempfile.TemporaryDirectory() as td:
        sink = late_audit_sink(
            "ts", "value", os.path.join(td, "s"), os.path.join(td, "o"),
            os.path.join(td, "a"),
        )
        for b in range(5):
            sink(df.filter((df.event_id >= 8 * b) & (df.event_id < 8 * (b + 1))), b)
        got = {
            r["batch_id"]: (r["n_rows"], r["n_late_dropped"])
            for r in spark.read.parquet(os.path.join(td, "a")).collect()
        }
    assert got == twin
    assert sum(v[1] for v in twin.values()) > 0  # scenario actually drops


def test_late_audit_agrees_with_native_watermark(spark, tmp_path):
    """The kept-row window totals equal what Spark's OWN
    withWatermark().groupBy(window) keeps on the same batch sequence —
    the sink is an account of native semantics, not a new policy."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from de_polars_spark.streaming.late_audit import late_audit_sink

    schema = "ts timestamp, value double"

    def ts(h, m):
        return datetime(2025, 1, 1, h, m)

    batches = [
        [(ts(9, 10), 1.0), (ts(9, 40), 2.0)],
        [(ts(13, 20), 4.0)],            # advances watermark to 12:20
        [(ts(9, 45), 8.0), (ts(13, 35), 16.0)],  # 9:45 late (end 10:00 <= 12:20)
    ]
    src = str(tmp_path / "src")
    out, st, aud = (str(tmp_path / d) for d in ("o", "s", "a"))
    sink = late_audit_sink("ts", "value", st, out, aud)

    spark.createDataFrame(batches[0], schema).write.parquet(src)
    native = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
    )
    q = (
        native.writeStream.outputMode("update")
        .format("memory")
        .queryName("native_wm")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        sink(spark.createDataFrame(batches[0], schema), 0)
        for i, b in enumerate(batches[1:], 1):
            spark.createDataFrame(b, schema).write.mode("append").parquet(src)
            q.processAllAvailable()
            sink(spark.createDataFrame(b, schema), i)
    finally:
        q.stop()
    # native update-mode: the row with the highest n per window is the
    # final state for that window (counts only grow)
    nat = {}
    for r in spark.sql("SELECT w.start AS s, n, v FROM native_wm").collect():
        cur = nat.get(r["s"])
        if cur is None or r["n"] > cur[0]:
            nat[r["s"]] = (r["n"], r["v"])
    mine = {
        r["window_start"]: (r["sum(n_events)"], r["sum(total_value)"])
        for r in spark.read.parquet(out)
        .groupBy("window_start")
        .sum("n_events", "total_value")
        .collect()
    }
    assert mine == nat
    dropped = (
        spark.read.parquet(aud).groupBy().sum("n_late_dropped").collect()[0][0]
    )
    assert dropped == 1  # the 9:45 row — and only it — was dropped by both


def test_late_audit_native_agreement_nondefault_window(spark, tmp_path):
    """The review case: window='30 minutes'. An event late by less than
    its 30-min window's remaining life must be KEPT (its window end is
    still above the watermark) — the old hour-truncated form wrongly
    dropped it. Asserted against Spark's own withWatermark output."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from de_polars_spark.streaming.late_audit import late_audit_sink

    schema = "ts timestamp, value double"

    def ts(h, m):
        return datetime(2025, 1, 1, h, m)

    batches = [
        [(ts(10, 40), 1.0)],
        [(ts(11, 45), 2.0)],  # watermark -> 10:45
        # 10:44 sits in window [10:30, 11:00): end 11:00 > 10:45 -> KEPT
        # 10:10 sits in [10:00, 10:30): end 10:30 <= 10:45 -> DROPPED
        [(ts(10, 44), 4.0), (ts(10, 10), 8.0)],
    ]
    src = str(tmp_path / "src")
    out, st, aud = (str(tmp_path / d) for d in ("o", "s", "a"))
    sink = late_audit_sink("ts", "value", st, out, aud, window="30 minutes")

    spark.createDataFrame(batches[0], schema).write.parquet(src)
    native = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
    )
    q = (
        native.writeStream.outputMode("update")
        .format("memory")
        .queryName("native_wm30")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        sink(spark.createDataFrame(batches[0], schema), 0)
        for i, b in enumerate(batches[1:], 1):
            spark.createDataFrame(b, schema).write.mode("append").parquet(src)
            q.processAllAvailable()
            sink(spark.createDataFrame(b, schema), i)
    finally:
        q.stop()
    nat = {}
    for r in spark.sql("SELECT w.start AS s, n, v FROM native_wm30").collect():
        cur = nat.get(r["s"])
        if cur is None or r["n"] > cur[0]:
            nat[r["s"]] = (r["n"], r["v"])
    mine = {
        r["window_start"]: (r["sum(n_events)"], r["sum(total_value)"])
        for r in spark.read.parquet(out)
        .groupBy("window_start")
        .sum("n_events", "total_value")
        .collect()
    }
    assert mine == nat
    assert ts(10, 30) in mine and mine[ts(10, 30)][1] == 5.0  # 1.0 + 4.0 kept
    dropped = (
        spark.read.parquet(aud).groupBy().sum("n_late_dropped").collect()[0][0]
    )
    assert dropped == 1  # only the 10:10 row
