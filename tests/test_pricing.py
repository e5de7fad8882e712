"""Pricing manager + joinable pricing views (sources/pricing.py;
reference aws_pricing_manager.py surface)."""

from __future__ import annotations

import pytest

from de_polars_spark.sources.pricing import (
    AWSPricingManager,
    POPULAR_INSTANCE_TYPES,
    build_pricing_tables,
    ondemand_price,
    pricing_values_sql,
    register_pricing_views,
)


class TestManager:
    def test_ondemand_deterministic(self):
        p1 = ondemand_price("m5.large", "us-east-1", "Linux")
        assert p1 == ondemand_price("m5.large", "us-east-1", "Linux")
        assert p1 is not None and p1 > 0
        # Windows costs more, bigger sizes cost more, unknown family -> None
        assert ondemand_price("m5.large", "us-east-1", "Windows") > p1
        assert ondemand_price("m5.xlarge") == pytest.approx(
            2 * ondemand_price("m5.large"), rel=1e-6
        )
        assert ondemand_price("z99.mega") is None

    def test_pricing_ladder(self):
        mgr = AWSPricingManager()
        od = mgr.get_ondemand_price("us-east-1", "m5.large")
        assert mgr.get_current_spot_price("us-east-1", "m5.large") < od
        assert (
            mgr.get_reserved_instance_price("us-east-1", "m5.large", 3)
            < mgr.get_reserved_instance_price("us-east-1", "m5.large", 1)
            < od
        )
        assert mgr.get_savings_plan_rate("m5.large", "us-east-1") < od

    def test_compare_and_cheapest(self):
        mgr = AWSPricingManager()
        out = mgr.compare_all_pricing_options("us-east-1", "m5.large")
        assert out["cheapest_option"] == "spot"
        assert out["max_savings_pct"] == 70.0
        assert set(out["pricing_options"]) == {
            "ondemand", "reserved_1yr", "reserved_3yr", "spot", "savings_plan",
        }

    def test_bulk_fanout(self):
        mgr = AWSPricingManager()
        rows = mgr.get_bulk_pricing_comparison(["m5.large", "t3.micro", "c5.xlarge"])
        assert [r["instance_type"] for r in rows] == [
            "m5.large", "t3.micro", "c5.xlarge",
        ]

    def test_metadata_cached(self):
        mgr = AWSPricingManager()
        meta = mgr.get_instance_metadata("r5.xlarge")
        assert meta["vcpu"] == 4 and meta["memory_gb"] == 32
        assert mgr.get_instance_metadata("r5.xlarge") is meta  # cache hit


class TestViews:
    def test_build_tables(self, spark):
        tables = build_pricing_tables(spark)
        assert set(tables) == {
            "aws_pricing", "aws_rds_pricing",
            "aws_savings_plans", "aws_savings_plans_rates",
        }
        pricing = tables["aws_pricing"]
        n = pricing.count()
        # popular types x 3 regions x 2 OS, minus unknown-family misses
        assert n >= len(POPULAR_INSTANCE_TYPES) * 3
        assert pricing.filter("price_per_hour_usd <= 0").count() == 0
        assert tables["aws_savings_plans"].count() == 5

    def test_register_and_join(self, spark):
        from de_polars_spark.engine.core import SparkEngine

        engine = SparkEngine(spark)
        names = register_pricing_views(engine)
        assert "aws_pricing" in names
        row = spark.sql(
            "SELECT price_per_hour_usd FROM aws_pricing "
            "WHERE instance_type='m5.large' AND region_code='us-east-1' "
            "AND operating_system='Linux'"
        ).collect()
        assert row and abs(row[0][0] - 0.096) < 1e-9

    def test_values_sql_matches_dataframe(self, spark):
        import duckdb

        tables = build_pricing_tables(spark)
        spark_rows = {
            tuple(r)
            for r in tables["aws_pricing"]
            .select("instance_type", "region_code", "operating_system",
                    "price_per_hour_usd")
            .collect()
        }
        duck_rows = set(
            map(tuple, duckdb.connect().execute(pricing_values_sql()).fetchall())
        )
        assert spark_rows == duck_rows
