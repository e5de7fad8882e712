"""Bucketed co-located join: plan shape + layout semantics.

The correctness of the join result is covered by the inventory oracle
(`bucketed_colocated_join`); these tests pin the reason the operator
exists — the physical plan over the bucketed layouts must contain no
Exchange (the shuffle was paid at write time) — and the artifact
life-cycle (idempotent per session, clearable for honest benchmarks).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from de_polars_spark.operators import bucketing
from de_polars_spark.sources.registry import register_testdata


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_colocated_join_plan_has_no_exchange(spark, sf_dir):
    t = register_testdata(spark, sf_dir)
    j = bucketing.colocated_join(
        spark,
        t["orders"].select("o_orderkey", "o_orderpriority"),
        t["lineitem"].select("l_orderkey", "l_extendedprice"),
        "orders_plan",
        "lineitem_plan",
        "o_orderkey",
        "l_orderkey",
        sf_dir,
    )
    # disable broadcast so the planner must choose between shuffle and
    # bucket co-location — the bucketed scans make SortMergeJoin free
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_write_is_idempotent_per_session(spark, sf_dir):
    t = register_testdata(spark, sf_dir)
    df = t["orders"].select("o_orderkey", "o_orderpriority")
    n1 = bucketing.ensure_bucketed(spark, df, "orders_idem", "o_orderkey", sf_dir)
    n2 = bucketing.ensure_bucketed(spark, df, "orders_idem", "o_orderkey", sf_dir)
    assert n1 == n2
    assert spark.catalog.tableExists(n1)
    assert spark.table(n1).count() == df.count()


def test_clear_bucketed_artifacts_drops_tables(spark, sf_dir):
    t = register_testdata(spark, sf_dir)
    df = t["orders"].select("o_orderkey", "o_orderpriority")
    name = bucketing.ensure_bucketed(spark, df, "orders_clear", "o_orderkey", sf_dir)
    assert spark.catalog.tableExists(name)
    bucketing.clear_bucketed_artifacts(spark, sf_dir)
    assert not spark.catalog.tableExists(name)
    # and a rebuild works from the cleared state
    name2 = bucketing.ensure_bucketed(spark, df, "orders_clear", "o_orderkey", sf_dir)
    assert spark.table(name2).count() == df.count()


def test_zorder_buckets_are_tighter_than_natural(spark, sf_dir):
    """The z-order scheme's whole purpose: per-bucket min/max extents
    (row-group stats) shrink vs the natural key layout, so point/range
    scans on (partkey, suppkey) prune more."""
    from de_polars_spark.inventory.scale_ops import QUERIES

    rows = {
        r["scheme"]: r
        for r in QUERIES["zorder_clustering_stats"](spark, sf_dir).collect()
    }
    z, nat = rows["zorder"], rows["natural"]
    assert z["sum_bbox_area"] < nat["sum_bbox_area"]
    assert z["avg_extent_partkey"] < nat["avg_extent_partkey"]


def test_table_fingerprint_is_order_insensitive(spark, sf_dir):
    """Same rows, any order/partitioning -> same fingerprint (the
    property that lets two clusters verify a copy cheaply)."""
    from de_polars_spark.inventory.scale_ops import QUERIES

    base = {
        r["table_name"]: r["fingerprint"]
        for r in QUERIES["table_fingerprint"](spark, sf_dir).collect()
    }
    t = register_testdata(spark, sf_dir)
    shuffled = t["supplier"].repartition(7).sortWithinPartitions(F.desc("s_name"))
    fp = (
        shuffled.select(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.col("s_suppkey").cast("string"),
                            "s_name",
                            F.col("s_nationkey").cast("string"),
                            F.col("s_acctbal").cast("decimal(18,2)").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("decimal(38,0)")
            .alias("fp")
        )
        .agg(F.sum("fp").cast("decimal(38,0)").cast("string"))
        .collect()[0][0]
    )
    assert fp == base["supplier"]


# ------------------------------------------------------------------ #
# external-path bucketing primitives (sources/bucketing.py)           #
# ------------------------------------------------------------------ #
import pytest

from de_polars_spark.sources.bucketing import cobucketed_join, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    orders = spark.range(0, 1000).select(
        F.col("id").alias("o_id"),
        (F.col("id") % 97).alias("custkey"),
        (F.col("id") * 3).cast("double").alias("amount"),
    )
    cust = spark.range(0, 97).select(
        F.col("id").alias("custkey"), F.concat(F.lit("c"), F.col("id")).alias("name")
    )
    write_bucketed(orders, "b_orders", str(tmp_path / "o"), ["custkey"], 4, ["custkey"])
    write_bucketed(cust, "b_cust", str(tmp_path / "c"), ["custkey"], 4, ["custkey"])
    yield "b_orders", "b_cust"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")


def test_cobucketed_join_has_no_shuffle(spark, bucketed_pair):
    left, right = bucketed_pair
    # disable auto-broadcast so the small side can't hide the shuffle the
    # bucketing is supposed to eliminate
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucketed_join(spark, left, right, ["custkey"])
        agg = joined.groupBy("name").agg(F.sum("amount").alias("total"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        assert "SortMergeJoin" in plan
        # correctness: totals match the plain (shuffled) join
        got = {r["name"]: r["total"] for r in agg.collect()}
        plain = {
            r["name"]: r["total"]
            for r in spark.table(left)
            .join(spark.table(right), "custkey")
            .groupBy("name")
            .agg(F.sum("amount").alias("total"))
            .collect()
        }
        assert got == plain and len(got) == 97
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_runtime_bloom_filter_prunes_shuffle_join(spark, sf_dir):
    """Spark's runtime bloom filter injects a might_contain prune on the
    fact side of a selective shuffle join — at 100 TB this is the
    row-level skipping that keeps a selective dim filter from paying a
    full fact shuffle. (With a broadcastable dim the broadcast join
    already prunes, so the test pins the shuffle-join path.)"""
    from de_polars_spark.sources.registry import register_testdata

    register_testdata(spark, sf_dir)
    keys = [
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    try:
        spark.conf.set(keys[0], "true")
        spark.conf.set(keys[1], "0")
        spark.conf.set(keys[2], "-1")
        spark.conf.set(keys[3], "-1")
        df = spark.sql(
            "SELECT l.l_orderkey, l.l_extendedprice FROM lineitem l "
            "JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "WHERE o.o_orderpriority = '1-URGENT'"
        )
        plan = df._jdf.queryExecution().executedPlan().toString().lower()
        assert "bloom" in plan or "might_contain" in plan
        # and the result is still correct vs the unfiltered-plan count
        n = df.count()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    expect = spark.sql(
        "SELECT COUNT(*) FROM lineitem l JOIN orders o "
        "ON l.l_orderkey = o.o_orderkey WHERE o.o_orderpriority = '1-URGENT'"
    ).collect()[0][0]
    assert n == expect
