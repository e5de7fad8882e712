"""FinOps analytics parity inventory.

The reference's semantics live on a CUR 2.0 fact table; the testdata is
TPC-H-ish, so each query derives a CUR-shaped relation from ``lineitem``
with a deterministic mapping (the ``_CUR_CTE`` below — identical SQL text
runs in Spark and DuckDB). On top of it we reproduce, operator-for-
operator, the reference's hardest computations:

- the amortized-cost CASE ladder        (kpi_instance_all.sql:37-38)
- the kpi_tracker composite-key spine   (kpi_tracker.sql:96-205)
- monthly spend trend + forecast inputs (spend_analytics.py:30-60)
- idle detection & savings              (optimization.py:56-70)
- rightsizing string-rewrite            (optimization.py:134-148)
- negotiation discount tiers            (discounts.py:149-163)
- tagging-compliance scoring            (allocation.py:132-228)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from de_polars_spark.inventory.dialect_macros import MACROS, render
from de_polars_spark.sources.registry import register_testdata

MACROS.setdefault(
    "TO_STR",
    {"spark": "CAST({0} AS STRING)", "duckdb": "CAST({0} AS VARCHAR)"},
)

QUERIES: dict = {}
ORACLES: dict = {}

#: deterministic lineitem -> CUR 2.0 mapping; the CASE order is part of the
#: contract (first match wins in both engines). Columns mirror FIXTURES.md §1.
_CUR_CTE = """
WITH cur AS (
    SELECT
        MONTH_STR(l_shipdate)                          AS billing_period,
        l_shipdate                                     AS line_item_usage_start_date,
        concat('payer_', TO_STR(l_suppkey % 2))        AS bill_payer_account_id,
        concat('acct_', TO_STR(l_suppkey % 7))         AS line_item_usage_account_id,
        CASE WHEN l_orderkey % 97 = 0 THEN ''
             ELSE concat('res-', TO_STR(l_orderkey % 500)) END
                                                       AS line_item_resource_id,
        CASE WHEN l_returnflag = 'A' AND l_discount > 0.06 THEN 'SavingsPlanCoveredUsage'
             WHEN l_returnflag = 'N' AND l_discount > 0.06 THEN 'DiscountedUsage'
             WHEN l_returnflag = 'R' AND l_linenumber % 3 = 0 THEN 'RIFee'
             WHEN l_linenumber % 7 = 0 THEN 'Fee'
             WHEN l_tax = 0 AND l_discount = 0 THEN 'Credit'
             ELSE 'Usage' END                          AS line_item_line_item_type,
        CASE l_partkey % 5
             WHEN 0 THEN 'AmazonEC2' WHEN 1 THEN 'AmazonRDS'
             WHEN 2 THEN 'AmazonS3'  WHEN 3 THEN 'AWSLambda'
             ELSE 'AmazonDynamoDB' END                 AS line_item_product_code,
        CASE l_partkey % 4
             WHEN 0 THEN 'm5.xlarge' WHEN 1 THEN 'm5.2xlarge'
             WHEN 2 THEN 'r5.xlarge' ELSE 'c6g.large' END
                                                       AS product_instance_type,
        CASE WHEN l_orderkey % 3 = 0 THEN '{"Environment":"prod","Team":"platform"}'
             WHEN l_orderkey % 3 = 1 THEN '{"Team":"data"}'
             ELSE '' END                               AS resource_tags,
        l_quantity                                     AS line_item_usage_amount,
        l_extendedprice * (1 - l_discount)             AS line_item_unblended_cost,
        l_extendedprice                                AS pricing_public_on_demand_cost,
        l_extendedprice * (1 - l_discount) * 0.9       AS savings_plan_effective_cost,
        l_extendedprice * l_tax * 0.5                  AS savings_plan_unused_commitment,
        l_extendedprice * (1 - l_discount) * 0.95      AS reservation_effective_cost,
        l_extendedprice * l_tax * 0.3                  AS reservation_unused_fee
    FROM lineitem
)
"""

#: the amortized-cost ladder, cited from kpi_instance_all.sql:37-38 —
#: SP-covered usage uses effective cost, recurring SP fees contribute the
#: unused commitment, negation/upfront rows zero out, RI discounted usage
#: uses reservation effective cost, RIFee contributes unused fees, plain
#: Fee rows are zero, everything else keeps unblended cost.
_AMORTIZED = """
CASE line_item_line_item_type
     WHEN 'SavingsPlanCoveredUsage' THEN savings_plan_effective_cost
     WHEN 'SavingsPlanRecurringFee' THEN savings_plan_unused_commitment
     WHEN 'SavingsPlanNegation'     THEN 0
     WHEN 'SavingsPlanUpfrontFee'   THEN 0
     WHEN 'DiscountedUsage'         THEN reservation_effective_cost
     WHEN 'RIFee'                   THEN reservation_unused_fee
     WHEN 'Fee'                     THEN 0
     ELSE line_item_unblended_cost END
"""


def _common(name: str, sql: str) -> None:
    full = _CUR_CTE + sql

    def fn(spark: SparkSession, sf_dir: str, _sql: str = full) -> DataFrame:
        register_testdata(spark, sf_dir)
        return spark.sql(render(_sql, "spark"))

    fn.__name__ = f"q_{name}"
    QUERIES[name] = fn
    ORACLES[name] = render(full, "duckdb")


# line-item-type profile of the derived CUR (sanity anchor for the ladder)
_common(
    "finops_line_item_types",
    """
    SELECT billing_period, line_item_line_item_type AS line_item_type,
           COUNT(*) AS n_rows,
           DSUM(line_item_unblended_cost) AS unblended_cost
    FROM cur
    GROUP BY 1, 2
    """,
)

# the amortized-cost ladder per (billing_period, service)
_common(
    "finops_amortized_ladder",
    f"""
    SELECT billing_period, line_item_product_code AS service,
           DSUM(line_item_unblended_cost) AS unblended_cost,
           DSUM({_AMORTIZED}) AS amortized_cost,
           DSUM(line_item_unblended_cost) - DSUM({_AMORTIZED}) AS amortization_adjustment,
           DSUM(CASE WHEN line_item_line_item_type = 'SavingsPlanCoveredUsage'
                     THEN pricing_public_on_demand_cost - savings_plan_effective_cost
                     ELSE 0 END) AS sp_savings,
           DSUM(CASE WHEN line_item_line_item_type = 'DiscountedUsage'
                     THEN pricing_public_on_demand_cost - reservation_effective_cost
                     ELSE 0 END) AS ri_savings
    FROM cur
    GROUP BY 1, 2
    """,
)

# kpi_tracker spine: per-period/payer/account totals LEFT JOIN per-service
# sub-aggregates on the composite key (kpi_tracker.sql:96-205 shape)
_common(
    "finops_kpi_spine",
    f"""
    , spend_all AS (
        SELECT billing_period, bill_payer_account_id AS payer_account_id,
               line_item_usage_account_id AS linked_account_id,
               DSUM(line_item_unblended_cost) AS unblended_cost,
               DSUM({_AMORTIZED}) AS amortized_cost,
               DSUM(line_item_usage_amount) AS usage_quantity
        FROM cur
        GROUP BY 1, 2, 3
    ),
    ec2 AS (
        SELECT billing_period, bill_payer_account_id AS payer_account_id,
               line_item_usage_account_id AS linked_account_id,
               DSUM(line_item_unblended_cost) AS ec2_cost,
               COUNT(DISTINCT line_item_resource_id) AS ec2_resources
        FROM cur WHERE line_item_product_code = 'AmazonEC2'
        GROUP BY 1, 2, 3
    ),
    storage AS (
        SELECT billing_period, bill_payer_account_id AS payer_account_id,
               line_item_usage_account_id AS linked_account_id,
               DSUM(line_item_unblended_cost) AS s3_cost
        FROM cur WHERE line_item_product_code = 'AmazonS3'
        GROUP BY 1, 2, 3
    )
    SELECT s.billing_period, s.payer_account_id, s.linked_account_id,
           s.unblended_cost, s.amortized_cost, s.usage_quantity,
           COALESCE(e.ec2_cost, 0.0) AS ec2_cost,
           COALESCE(e.ec2_resources, 0) AS ec2_resources,
           COALESCE(st.s3_cost, 0.0) AS s3_cost
    FROM spend_all s
    LEFT JOIN ec2 e
      ON s.billing_period = e.billing_period
     AND s.payer_account_id = e.payer_account_id
     AND s.linked_account_id = e.linked_account_id
    LEFT JOIN storage st
      ON s.billing_period = st.billing_period
     AND s.payer_account_id = st.payer_account_id
     AND s.linked_account_id = st.linked_account_id
    """,
)

# monthly spend trend (spend_analytics.py:30-60: month series + deltas)
_common(
    "finops_spend_mom",
    """
    SELECT billing_period,
           DSUM(line_item_unblended_cost) AS monthly_cost,
           LAG(DSUM(line_item_unblended_cost))
               OVER (ORDER BY billing_period) AS prev_month_cost,
           ROUND((DSUM(line_item_unblended_cost)
                  - LAG(DSUM(line_item_unblended_cost)) OVER (ORDER BY billing_period))
                 / NULLIF(LAG(DSUM(line_item_unblended_cost))
                          OVER (ORDER BY billing_period), 0) * 100, 6) AS mom_change_pct
    FROM cur
    GROUP BY 1
    """,
)

# idle detection & savings estimate (optimization.py:56-70: avg-usage CASE)
_common(
    "finops_idle_detection",
    """
    SELECT line_item_resource_id AS resource_id,
           line_item_product_code AS service,
           DAVG(line_item_usage_amount) AS avg_usage,
           DSUM(line_item_unblended_cost) AS total_cost,
           CASE WHEN DAVG(line_item_usage_amount) < 10 THEN 'idle'
                WHEN DAVG(line_item_usage_amount) < 20 THEN 'underutilized'
                ELSE 'optimized' END AS utilization_status,
           ROUND(CASE WHEN DAVG(line_item_usage_amount) < 10
                      THEN DSUM(line_item_unblended_cost) * 0.9
                      WHEN DAVG(line_item_usage_amount) < 20
                      THEN DSUM(line_item_unblended_cost) * 0.3
                      ELSE 0 END, 6) AS potential_savings
    FROM cur
    WHERE line_item_resource_id <> ''
      AND line_item_line_item_type = 'Usage'
    GROUP BY 1, 2
    HAVING COUNT(*) >= 3
    """,
)

# rightsizing recommender (optimization.py:134-148: size-string rewrite)
_common(
    "finops_rightsizing",
    """
    SELECT product_instance_type AS instance_type,
           CASE WHEN DAVG(line_item_usage_amount) < 15
                     AND product_instance_type LIKE '%xlarge%'
                THEN replace(product_instance_type, '2xlarge', 'xlarge')
                ELSE product_instance_type END AS initial_downsize,
           CASE WHEN DAVG(line_item_usage_amount) < 15
                     AND product_instance_type LIKE '%xlarge%'
                THEN replace(replace(product_instance_type, '2xlarge', 'xlarge'),
                             '.xlarge', '.large')
                ELSE product_instance_type END AS recommended_type,
           DAVG(line_item_usage_amount) AS avg_usage,
           DSUM(line_item_unblended_cost) AS current_cost,
           ROUND(CASE WHEN DAVG(line_item_usage_amount) < 15
                           AND product_instance_type LIKE '%xlarge%'
                      THEN DSUM(line_item_unblended_cost) * 0.5
                      ELSE 0 END, 6) AS estimated_savings
    FROM cur
    WHERE line_item_product_code = 'AmazonEC2'
    GROUP BY 1
    """,
)

# negotiation discount tiers (discounts.py:149-163: spend-tier CASE)
_common(
    "finops_negotiation_tiers",
    """
    , acct AS (
        SELECT line_item_usage_account_id AS account_id,
               DSUM(line_item_unblended_cost) AS total_spend
        FROM cur
        GROUP BY 1
    )
    SELECT account_id, total_spend,
           CASE WHEN total_spend >= 10000000 THEN 20
                WHEN total_spend >= 5000000 THEN 15
                WHEN total_spend >= 1000000 THEN 10
                ELSE 5 END AS discount_tier_pct,
           ROUND(total_spend *
                 CASE WHEN total_spend >= 10000000 THEN 0.20
                      WHEN total_spend >= 5000000 THEN 0.15
                      WHEN total_spend >= 1000000 THEN 0.10
                      ELSE 0.05 END, 6) AS potential_discount
    FROM acct
    """,
)

# tagging compliance (allocation.py:132-228: LIKE buckets + score rollup)
_common(
    "finops_tag_compliance",
    """
    SELECT line_item_product_code AS service,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN resource_tags LIKE '%Environment%' THEN 1 ELSE 0 END)
               AS BIGINT) AS env_tagged,
           CAST(SUM(CASE WHEN resource_tags LIKE '%Team%' THEN 1 ELSE 0 END)
               AS BIGINT) AS team_tagged,
           CAST(SUM(CASE WHEN resource_tags = '' OR resource_tags IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS untagged,
           CAST(ROUND(SUM(CASE WHEN resource_tags LIKE '%Environment%' THEN 1 ELSE 0 END)
                 * 100.0 / COUNT(*), 6) AS DOUBLE) AS env_compliance_pct,
           DSUM(CASE WHEN resource_tags = '' OR resource_tags IS NULL
                     THEN line_item_unblended_cost ELSE 0 END) AS untagged_cost
    FROM cur
    GROUP BY 1
    """,
)
