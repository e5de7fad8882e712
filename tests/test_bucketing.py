"""Bucketed co-located joins: the shuffle really disappears."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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
