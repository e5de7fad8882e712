"""Close the loop between the oracle-checked SQL re-expressions
(inventory/driver_math.py) and the shipped Python driver-side math
(analytics/ai.py, analytics/spend.py, analytics/discounts.py, mcp
router): same inputs -> same numbers."""

from __future__ import annotations

import pytest

from de_polars_spark.analytics.ai import AIRecommendations
from de_polars_spark.analytics.mcp import parse_query_intent
from de_polars_spark.inventory.driver_math import NL_QUERIES, QUERIES


@pytest.fixture(scope="module")
def cur_ready(spark, sf_dir):
    from de_polars_spark.inventory.kpi_views import _ensure_cur_ext

    _ensure_cur_ext(spark, sf_dir)
    return spark


def test_forecast_sql_matches_python(cur_ready, sf_dir):
    spark = cur_ready
    sql_rows = {
        (r["service"], r["month_ahead"]): r.asDict()
        for r in QUERIES["forecast_linear_seasonal"](spark, sf_dir).collect()
    }
    # monthly history exactly as the SQL sees it
    hist_rows = spark.sql(
        """
        SELECT product_servicecode AS service,
               date_format(bill_billing_period_start_date, 'yyyy-MM') AS month,
               CAST(SUM(CAST(line_item_unblended_cost AS DECIMAL(38,6))) AS DOUBLE)
                   AS cost
        FROM cur_ext
        WHERE product_servicecode <> 'AWSDataTransfer'
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).collect()
    hist: dict[str, list[dict]] = {}
    for r in hist_rows:
        hist.setdefault(r["service"], []).append(
            {"month": r["month"], "cost": r["cost"]}
        )
    checked = 0
    for service, months in hist.items():
        if len(months) < 3:
            continue
        py = AIRecommendations._generate_ml_forecast(service, months, 6)
        for m in py["monthly_forecasts"]:
            row = sql_rows[(service, m["month"])]
            assert row["forecasted_cost"] == pytest.approx(
                m["forecasted_cost"], rel=1e-9, abs=1e-3
            )
            assert row["ci_upper"] == pytest.approx(
                m["confidence_interval"]["upper"], rel=1e-9, abs=1e-3
            )
            checked += 1
        first = sql_rows[(service, 1)]
        assert first["confidence"] == pytest.approx(py["confidence"], abs=0.05)
        assert first["trend"] == py["trend"]
    assert checked >= 18  # several services x 6 months


def test_roi_sql_matches_python(cur_ready, sf_dir):
    spark = cur_ready
    row = QUERIES["commitment_roi_sim"](spark, sf_dir).collect()[0].asDict()
    annual = row["annual_spend_baseline"]
    commitment = 50000.0
    covered = min(commitment, annual)
    # analytics/discounts.py simulate_commitment_roi constants
    assert row["annual_savings"] == pytest.approx(covered * 0.28, abs=0.01)
    assert row["upfront_cost"] == pytest.approx(commitment * 0.10, abs=0.005)
    assert row["payback_months"] == pytest.approx(
        (commitment * 0.10) / (covered * 0.28 / 12), abs=0.05
    )
    assert row["roi_percentage"] == pytest.approx(
        ((covered * 0.28 * 3) - commitment * 0.10) / (commitment * 0.10) * 100,
        abs=0.05,
    )


def test_volatility_classes(cur_ready, sf_dir):
    rows = QUERIES["volatility_classification"](cur_ready, sf_dir).collect()
    assert rows
    for r in rows:
        ratio = r["stddev_monthly_cost"] / r["avg_monthly_cost"]
        expected = (
            "stable" if ratio < 0.2 else "moderate" if ratio < 0.5 else "volatile"
        )
        assert r["usage_pattern"] == expected


def test_nl_router_corpus_covers_all_branches():
    intents = {parse_query_intent(q)["intent"] for q in NL_QUERIES}
    assert intents == {
        "cost_breakdown", "cost_summary", "trend_analysis",
        "optimization", "forecasting", "anomaly_detection", "general",
    }
    periods = {parse_query_intent(q)["time_period"] for q in NL_QUERIES}
    assert periods == {"last_month", "last_week", "last_3_months", "last_year"}
    all_services = set()
    for q in NL_QUERIES:
        all_services.update(parse_query_intent(q)["services"])
    assert all_services == {"EC2", "RDS", "S3", "LAMBDA", "DYNAMODB"}
