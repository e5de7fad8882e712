"""Oracle checks for the SURVEY §2.9 driver-side computations that were
"runs but untested" in round 1: linear forecast + seasonality, naive
next-month forecast, usage-volatility classification, commitment-ROI
simulator, and the NL intent router.

Strategy per entry:
- the math is re-expressed in two-dialect SQL over the synthetic CUR
  (pinned ``now``), so the driver hash-compares Spark vs DuckDB running
  the identical computation;
- ``tests/test_driver_math.py`` additionally asserts the SQL results
  agree with the live Python module outputs (analytics/ai.py,
  analytics/spend.py, analytics/discounts.py), closing the loop between
  the checked SQL and the shipped driver code;
- the NL router is checked exactly: the Spark side runs the REAL Python
  parser (analytics/mcp.parse_query_intent) over a canned query corpus
  and the oracle re-implements the ladder as SQL CASE — string logic, so
  the match is exact, and a hash mismatch means the Python router drifted.

Seasonality constants: the reference multiplies by
``1 + 0.1*sin(m*pi/6)`` (ai_recommendations.py:653-689). ``sin`` is
evaluated ONCE here in Python and baked into both dialect renderings as
literals — Java's Math.sin and DuckDB's libm sin are not guaranteed
bit-identical, literals are.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from de_polars_spark.analytics.mcp import parse_query_intent
from de_polars_spark.functions.local_relation import values_df
from de_polars_spark.inventory.dialect_macros import render
from de_polars_spark.inventory.kpi_views import CUR_EXT_CTE, _ensure_cur_ext

QUERIES: dict = {}
ORACLES: dict = {}

_FORECAST_MONTHS = 6

_SEASON_CASE = "CASE fm " + " ".join(
    f"WHEN {m} THEN {1 + 0.1 * math.sin(m * math.pi / 6)!r}"
    for m in range(1, _FORECAST_MONTHS + 1)
) + " END"

_MONTH_ROWS = ", ".join(f"({m})" for m in range(1, _FORECAST_MONTHS + 1))

#: monthly per-service spend — shared history CTE
_MONTHLY = """
monthly AS (
    SELECT product_servicecode AS service,
           MONTH_STR(bill_billing_period_start_date) AS month,
           DSUM(line_item_unblended_cost) AS cost
    FROM cur
    WHERE product_servicecode <> 'AWSDataTransfer'
    GROUP BY 1, 2
)
"""

#: linear forecast + seasonality (ai_recommendations.py:653-689 /
#: analytics/ai.py _generate_ml_forecast): avg_change over the last 6
#: months (telescoped: (last-first)/(n-1)), base = latest month,
#: cost_m = (base + avg_change*m) * season(m), CI = +/-15%.
_FORECAST_SQL = f"""
, recent AS (
    SELECT service, month, cost,
           ROW_NUMBER() OVER (PARTITION BY service ORDER BY month DESC) AS rn,
           LEAST(6, COUNT(*) OVER (PARTITION BY service)) AS n_recent,
           COUNT(*) OVER (PARTITION BY service) AS n_hist
    FROM monthly
)
, params AS (
    SELECT service,
           MAX(CASE WHEN rn = 1 THEN cost END) AS base,
           (MAX(CASE WHEN rn = 1 THEN cost END)
            - MAX(CASE WHEN rn = n_recent THEN cost END))
               / (MAX(n_recent) - 1) AS avg_change
    FROM recent
    WHERE rn <= 6
    GROUP BY service
    HAVING MIN(n_hist) >= 3
)
SELECT p.service,
       m.fm AS month_ahead,
       CAST(ROUND(GREATEST(0.0, (p.base + p.avg_change * m.fm) * {_SEASON_CASE}), 4)
           AS DOUBLE) AS forecasted_cost,
       CAST(ROUND(GREATEST(0.0, (p.base + p.avg_change * m.fm) * {_SEASON_CASE} * 0.85), 4)
           AS DOUBLE) AS ci_lower,
       CAST(ROUND((p.base + p.avg_change * m.fm) * {_SEASON_CASE} * 1.15, 4)
           AS DOUBLE) AS ci_upper,
       CAST(ROUND(GREATEST(60.0, 90.0 - ABS(p.avg_change) / p.base * 100.0), 1)
           AS DOUBLE) AS confidence,
       CASE WHEN p.avg_change > 0 THEN 'increasing' ELSE 'decreasing' END AS trend
FROM params p
CROSS JOIN (SELECT * FROM (VALUES {_MONTH_ROWS}) AS t(fm)) m
ORDER BY p.service, m.fm
"""

#: naive next-month forecast (spend_analytics.py:338-357 /
#: analytics/spend.py _calculate_forecast): trend of the two most recent
#: months, confidence fixed at 75.
_NAIVE_FORECAST_SQL = """
, ordered AS (
    SELECT month, CAST(SUM(CAST(cost AS DECIMAL(38,6))) AS DOUBLE) AS spend,
           ROW_NUMBER() OVER (ORDER BY month DESC) AS rn
    FROM monthly
    GROUP BY month
)
SELECT CAST(ROUND(MAX(CASE WHEN rn = 1 THEN spend END)
            * (1 + (MAX(CASE WHEN rn = 1 THEN spend END)
                    - MAX(CASE WHEN rn = 2 THEN spend END))
                   / MAX(CASE WHEN rn = 2 THEN spend END)), 2) AS DOUBLE)
           AS next_month,
       75 AS confidence
FROM ordered
WHERE rn <= 2
"""

#: usage-volatility classification (discounts.py:283-287 /
#: analytics/discounts.py get_usage_forecasting CASE)
_VOLATILITY_SQL = """
SELECT service,
       CAST(ROUND(AVG(cost), 4) AS DOUBLE) AS avg_monthly_cost,
       CAST(ROUND(STDDEV(cost), 4) AS DOUBLE) AS stddev_monthly_cost,
       CASE WHEN STDDEV(cost) / AVG(cost) < 0.2 THEN 'stable'
            WHEN STDDEV(cost) / AVG(cost) < 0.5 THEN 'moderate'
            ELSE 'volatile' END AS usage_pattern
FROM monthly
GROUP BY service
HAVING COUNT(*) >= 3
ORDER BY service
"""

#: commitment ROI simulator (discounts.py:359-431 /
#: analytics/discounts.py simulate_commitment_roi): upfront = 10%,
#: discount = 28%, 3-year term
_ROI_COMMITMENT = 50000.0
_ROI_SQL = f"""
, annual AS (
    SELECT DSUM(line_item_unblended_cost) AS annual_spend FROM cur
)
SELECT CAST(ROUND(annual_spend, 2) AS DOUBLE) AS annual_spend_baseline,
       CAST(ROUND(LEAST({_ROI_COMMITMENT}, annual_spend), 2) AS DOUBLE) AS covered_spend,
       CAST(ROUND(GREATEST(0.0, annual_spend - LEAST({_ROI_COMMITMENT}, annual_spend)), 2)
           AS DOUBLE) AS uncovered_spend,
       CAST(ROUND(LEAST({_ROI_COMMITMENT}, annual_spend) * 0.28, 2) AS DOUBLE)
           AS annual_savings,
       CAST(ROUND({_ROI_COMMITMENT} * 0.10, 2) AS DOUBLE) AS upfront_cost,
       CAST(ROUND(({_ROI_COMMITMENT} * 0.10)
            / (LEAST({_ROI_COMMITMENT}, annual_spend) * 0.28 / 12), 1) AS DOUBLE)
           AS payback_months,
       CAST(ROUND(((LEAST({_ROI_COMMITMENT}, annual_spend) * 0.28 * 3)
             - {_ROI_COMMITMENT} * 0.10) / ({_ROI_COMMITMENT} * 0.10) * 100, 1)
           AS DOUBLE) AS roi_percentage
FROM annual
"""

#: canned corpus exercising every intent branch, every service entity,
#: and every time-period rule of the router
NL_QUERIES = [
    "show me the cost breakdown by service",
    "what is my total spend",
    "monthly spend trend over time",
    "how can I optimize and reduce waste",
    "forecast next month usage",
    "any unusual spike or anomaly this week",
    "hello there",
    "ec2 and rds bill for the year",
    "s3 expense per service breakdown",
    "predict future lambda and dynamodb usage for 3 months",
    "efficient savings please",
    "alert me about billing spikes",
]

_NL_VALUES = ",\n    ".join(f"('{q}')" for q in NL_QUERIES)

#: the router ladder as SQL (the oracle side of the exact check)
_NL_SQL = f"""
SELECT q AS query,
  CASE WHEN q LIKE '%cost%' OR q LIKE '%spend%' OR q LIKE '%bill%'
            OR q LIKE '%expense%' THEN
            CASE WHEN q LIKE '%breakdown%' OR q LIKE '%by service%'
                      OR q LIKE '%per service%' THEN 'cost_breakdown'
                 WHEN q LIKE '%trend%' OR q LIKE '%over time%'
                      OR q LIKE '%monthly%' OR q LIKE '%historical%'
                      THEN 'trend_analysis'
                 ELSE 'cost_summary' END
       WHEN q LIKE '%optimize%' OR q LIKE '%save%' OR q LIKE '%reduce%'
            OR q LIKE '%efficient%' THEN 'optimization'
       WHEN q LIKE '%forecast%' OR q LIKE '%predict%' OR q LIKE '%future%'
            OR q LIKE '%next month%' THEN 'forecasting'
       WHEN q LIKE '%anomaly%' OR q LIKE '%unusual%' OR q LIKE '%spike%'
            OR q LIKE '%alert%' THEN 'anomaly_detection'
       ELSE 'general' END AS intent,
  concat_ws(',',
      CASE WHEN q LIKE '%ec2%' THEN 'EC2' END,
      CASE WHEN q LIKE '%rds%' THEN 'RDS' END,
      CASE WHEN q LIKE '%s3%' THEN 'S3' END,
      CASE WHEN q LIKE '%lambda%' THEN 'LAMBDA' END,
      CASE WHEN q LIKE '%dynamodb%' THEN 'DYNAMODB' END) AS services,
  CASE WHEN q LIKE '%week%' THEN 'last_week'
       WHEN q LIKE '%3 month%' THEN 'last_3_months'
       WHEN q LIKE '%year%' THEN 'last_year'
       ELSE 'last_month' END AS time_period
FROM (SELECT * FROM (VALUES\n    {_NL_VALUES}\n) AS t(q))
ORDER BY q
"""


def _bind_sql(name: str, body: str, with_monthly: bool = True) -> None:
    prefix = "WITH cur AS (SELECT * FROM cur_ext)"
    if with_monthly:
        common = ",\n" + _MONTHLY.strip() + "\n" + body
    else:
        common = "\n" + body
    spark_sql = render(prefix + common, "spark")
    oracle_sql = render(CUR_EXT_CTE + common, "duckdb")

    def fn(spark: SparkSession, sf_dir: str, _sql: str = spark_sql) -> DataFrame:
        _ensure_cur_ext(spark, sf_dir)
        return spark.sql(_sql)

    fn.__name__ = f"q_{name}"
    QUERIES[name] = fn
    ORACLES[name] = oracle_sql


#: distributed OLS forecast: the §2.9 "per-service fan-out grows" upgrade
#: path (SURVEY §2.10 note). Slope/intercept from explicit decimal-exact
#: sums — NOT regr_slope — so Spark and DuckDB accumulate identically
#: regardless of row order; x is a small int, so per-row x*cost products
#: are the same IEEE double in both engines. Fully distributed: one
#: window + one groupBy, no driver math at all.
_REGRESSION_SQL = """
, idx AS (
    SELECT service, cost,
           ROW_NUMBER() OVER (PARTITION BY service ORDER BY month) AS x
    FROM monthly
),
fit AS (
    SELECT service, COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx,
           DSUM(cost) AS sy, DSUM(x * cost) AS sxy
    FROM idx
    GROUP BY service
    HAVING COUNT(*) >= 3
),
ab AS (
    SELECT service, n, sx, sy,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
    FROM fit
)
SELECT service,
       CAST(ROUND(slope, 6) AS DOUBLE) AS slope,
       CAST(ROUND((sy - slope * sx) / n, 6) AS DOUBLE) AS intercept,
       CAST(ROUND((sy - slope * sx) / n + slope * (n + 1), 4) AS DOUBLE)
           AS next_month_forecast
FROM ab
ORDER BY service
"""

_bind_sql("forecast_linear_seasonal", _FORECAST_SQL)
_bind_sql("forecast_naive_next_month", _NAIVE_FORECAST_SQL)
_bind_sql("forecast_regression", _REGRESSION_SQL)
_bind_sql("volatility_classification", _VOLATILITY_SQL)
_bind_sql("commitment_roi_sim", _ROI_SQL, with_monthly=False)


def _nl_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of the NL-router check: the REAL Python parser."""
    rows = []
    for q in sorted(NL_QUERIES):
        parsed = parse_query_intent(q)
        rows.append(
            (q, parsed["intent"], ",".join(parsed["services"]), parsed["time_period"])
        )
    return values_df(
        spark, rows, "query string, intent string, services string, time_period string"
    )


_nl_router.__name__ = "q_nl_intent_router"
QUERIES["nl_intent_router"] = _nl_router
ORACLES["nl_intent_router"] = render(_NL_SQL, "duckdb")
