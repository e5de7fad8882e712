"""Unit + plan tests for the extended operators: as-of join, range join,
text ranking, salted aggregation.

Correctness vs DuckDB is covered by test_inventory_correctness; these
tests pin the *physical plan* properties that matter at scale — the
as-of join must never degrade into a nested-loop/cartesian pair space,
and the bounded range join must plan as an equi-join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from de_polars_spark.operators.asof import asof_join_backward, range_count_join
from de_polars_spark.operators.skew import salted_sum_count
from de_polars_spark.operators.textrank import bm25_topk, tfidf_top_terms
from de_polars_spark.sources.registry import register_testdata


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_join_no_nested_loop(spark, sf_dir):
    t = register_testdata(spark, sf_dir)
    ev = t["events"]
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    j = asof_join_backward(
        purch, views, ["user_id"], "ts", "ts", {"view_event_id": "view_event_id"}
    )
    plan = _plan(j)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the match is a running window over the unioned stream, not a join
    assert "Window" in plan and "Union" in plan


def test_asof_backward_is_inclusive_and_latest(spark):
    left = spark.createDataFrame(
        [(1, 100), (1, 205), (2, 50)], "k int, t int"
    ).selectExpr("k", "timestamp_micros(t) AS ts", "t AS lt")
    right = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b"), (2, 60, "c")], "k int, t int, v string"
    ).selectExpr("k", "timestamp_micros(t) AS ts", "v")
    out = asof_join_backward(
        left, right, ["k"], "ts", "ts", {"v": "v"}
    ).select("k", "lt", "v").collect()
    got = {(r.k, r.lt): r.v for r in out}
    assert got[(1, 100)] == "a"  # equal timestamps match (inclusive)
    assert got[(1, 205)] == "b"  # latest prior, not first
    assert got[(2, 50)] is None  # nothing at-or-before -> left join NULL


def test_range_count_join_plans_equi_join(spark, sf_dir):
    t = register_testdata(spark, sf_dir)
    ev = t["events"]
    rc = range_count_join(
        ev.where(F.col("event_type") == "signup").select("event_id", "user_id", "ts"),
        ev.where(F.col("event_type") == "error").select("user_id", "ts"),
        ["user_id"], "ts", "ts", 86400, "n",
    )
    plan = _plan(rc)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_count_window_boundaries(spark):
    left = spark.createDataFrame([(1, 1, 0)], "id int, k int, t long").selectExpr(
        "id", "k", "timestamp_micros(t) AS ts"
    )
    # window [0s, 10s): 0 in, 9.999999s in, 10s out, -1us out
    right = spark.createDataFrame(
        [(1, 0), (1, 9_999_999), (1, 10_000_000), (1, -1)], "k int, t long"
    ).selectExpr("k", "timestamp_micros(t) AS ts")
    out = range_count_join(left, right, ["k"], "ts", "ts", 10, "n").collect()
    assert out[0].n == 2


def test_tfidf_rare_term_outscores_common(spark, sf_dir):
    t = register_testdata(spark, sf_dir)
    top = tfidf_top_terms(t["documents"], "doc_id", "text", k=3).toPandas()
    assert (top.groupby("doc_id").size() <= 3).all()
    assert (top["tfidf"] > 0).all()


def test_bm25_returns_requested_k_with_hits(spark, sf_dir):
    t = register_testdata(spark, sf_dir)
    out = bm25_topk(
        t["documents"], "doc_id", "text", ["spark", "merge"], k=5
    ).toPandas()
    assert len(out) == 5
    assert out["bm25"].is_monotonic_decreasing
    assert (out["n_terms_hit"] >= 1).all()


def test_merge_snapshot_version_conflicts(spark):
    from de_polars_spark.operators.merge import merge_snapshot

    base = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "k int, v string"
    )
    changes = spark.createDataFrame(
        [
            (1, "one-v2", "upsert", 1),
            (1, "one-v3", "upsert", 2),   # higher version wins
            (2, None, "delete", 1),
            (2, "two-v2", "upsert", 1),   # delete beats upsert at same version
            (4, "four", "upsert", 1),     # insert
        ],
        "k int, v string, op string, version int",
    )
    out = {
        r.k: r.v
        for r in merge_snapshot(base, changes, ["k"], "op", "version").collect()
    }
    assert out == {1: "one-v3", 3: "three", 4: "four"}


def test_salted_agg_equals_direct(spark, sf_dir):
    t = register_testdata(spark, sf_dir)
    ev = t["events"]
    salted = salted_sum_count(
        ev, ["event_type"], F.col("value"), F.col("event_id"), n_salts=8
    ).toPandas().sort_values("event_type", ignore_index=True)
    direct = (
        ev.groupBy("event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("total"),
            F.count("*").alias("n_rows"),
        )
        .toPandas()
        .sort_values("event_type", ignore_index=True)
    )
    assert (salted["total"] == direct["total"]).all()
    assert (salted["n_rows"] == direct["n_rows"]).all()


def test_pagerank_star_center_dominates(spark):
    from de_polars_spark.operators.graph import pagerank

    # star: 0 joined to 1..4 -> center must out-rank every leaf, and all
    # leaves tie exactly (decimal-exact iteration)
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "id_a long, id_b long"
    )
    pr = {r.node: r.pr for r in pagerank(pairs, iterations=4).collect()}
    assert set(pr) == {0, 1, 2, 3, 4}
    leaves = {pr[i] for i in range(1, 5)}
    assert len(leaves) == 1
    assert pr[0] > pr[1]


def test_kmeans_separates_obvious_clusters(spark):
    from de_polars_spark.operators.kmeans import kmeans_iterations

    # two tight 2-D blobs; seeds one point from each
    pts = [(i, [0.0 + i * 0.01, 0.0]) for i in range(5)] + [
        (10 + i, [10.0 + i * 0.01, 10.0]) for i in range(5)
    ]
    df = spark.createDataFrame(pts, "vec_id int, embedding array<double>")
    assigned, cents = kmeans_iterations(
        df, "vec_id", "embedding", seeds=[[0.0, 0.0], [10.0, 10.0]], iterations=2
    )
    got = {r.vec_id: r.cid for r in assigned.collect()}
    assert {got[i] for i in range(5)} == {0}
    assert {got[10 + i] for i in range(5)} == {1}
    assert abs(cents[0][1] - 0.0) < 1e-9 and abs(cents[1][1] - 10.0) < 1e-9


def test_range_count_join_preserves_duplicate_left_rows(spark):
    # fully-duplicate left rows must each produce their own output row
    # (not collapse into one row whose count sums the duplicates' hits)
    left = spark.createDataFrame(
        [(1, 0), (1, 0), (1, 0)], "k int, t long"
    ).selectExpr("k", "timestamp_micros(t) AS ts")
    right = spark.createDataFrame(
        [(1, 1_000_000), (1, 2_000_000)], "k int, t long"
    ).selectExpr("k", "timestamp_micros(t) AS ts")
    out = range_count_join(left, right, ["k"], "ts", "ts", 10, "n").collect()
    assert len(out) == 3
    assert [r.n for r in out] == [2, 2, 2]


def test_merge_snapshot_rejects_unknown_op(spark):
    from de_polars_spark.operators.merge import merge_snapshot

    base = spark.createDataFrame([(1, "one")], "k int, v string")
    changes = spark.createDataFrame(
        [(1, "one-v2", "upssert")], "k int, v string, op string"  # typo'd op
    )
    with pytest.raises(ValueError, match="unknown 'op' value 'upssert'"):
        merge_snapshot(base, changes, ["k"], "op")
