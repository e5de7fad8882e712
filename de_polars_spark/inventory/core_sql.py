"""Core SQL operator inventory (SURVEY.md §2.2–§2.8).

Each query exercises one operator family the reference uses, re-targeted
at the TPC-H-ish testdata tables. Queries are written once in the
common dialect (de_polars_spark.inventory.dialect_macros) and rendered
for Spark and for the DuckDB oracle, so both engines run the same
computation. A few entries use the DataFrame API directly to pin the
idiomatic Spark plan (broadcast star join, map-typed column access).

Reference patterns covered (file:line cites are to /root/reference):
- hash agg + GROUP BY ordinals        de_polars/analytics/spend_analytics.py:41
- SUM(CASE WHEN) conditional agg      cur2_views/level_2_dependent/kpi_instance_all.sql:37-115
- COUNT(DISTINCT), STDDEV             spend_analytics.py:185; ai_recommendations.py:53
- HAVING                              optimization.py:127
- composite-key LEFT JOIN spine       cur2_views/level_3_final/kpi_tracker.sql:96-205
- broadcast dim join                  kpi_instance_all.sql:116-118
- current-vs-prev self-join           spend_analytics.py:112-144
- pct-of-total                        spend_analytics.py:143,196-202
- z-score anomaly join                ai_recommendations.py:35-93
- LAG / LAG-over-agg / RANK           spend_analytics.py:48-49; tests/test_14_sql_query_endpoint.py:237-282
- top-k ORDER BY DESC LIMIT           spend_analytics.py:146-147
- DISTINCT projection                 tests/test_1_query_s3.py:40
- scalar function surface             SURVEY.md §2.8
- interval arithmetic                 kpi_instance_all.sql:42
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from de_polars_spark.inventory.dialect_macros import MACROS, render
from de_polars_spark.sources.registry import register_testdata

MACROS.setdefault(
    "HOUR_STR",
    {
        "spark": "date_format({0}, 'yyyy-MM-dd HH')",
        "duckdb": "strftime({0}, '%Y-%m-%d %H')",
    },
)

QUERIES: dict = {}
ORACLES: dict = {}


def _common(name: str, sql: str) -> None:
    """Register a query whose Spark and oracle forms render from one text."""

    def fn(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        register_testdata(spark, sf_dir)
        return spark.sql(render(_sql, "spark"))

    fn.__name__ = f"q_{name}"
    QUERIES[name] = fn
    ORACLES[name] = render(sql, "duckdb")


# --------------------------------------------------------------------- #
# §2.4 hash aggregate — TPC-H Q1 shape (8 aggs, 2 group cols)            #
# --------------------------------------------------------------------- #
_common(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           DSUM(l_quantity) AS sum_qty,
           DSUM(l_extendedprice) AS sum_base_price,
           DSUM(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
           DSUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
           DAVG(l_quantity) AS avg_qty,
           DAVG(l_extendedprice) AS avg_price,
           DAVG(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)

# §2.6 top-k with tiebreak (top-10 services by cost analog)
_common(
    "top_brands_by_revenue",
    """
    SELECT p.p_brand AS brand,
           DSUM(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    ORDER BY revenue DESC, brand
    LIMIT 10
    """,
)

# §2.4 conditional aggregation — the amortized-cost idiom shape
_common(
    "conditional_cost_ladder",
    """
    SELECT MONTH_STR(l_shipdate) AS month,
           DSUM(CASE WHEN l_returnflag = 'R'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END) AS returned_cost,
           DSUM(CASE WHEN l_returnflag = 'A' AND l_linestatus = 'F'
                     THEN l_extendedprice ELSE 0 END) AS af_base_cost,
           DSUM(CASE WHEN l_discount > 0.05
                     THEN l_extendedprice * l_discount ELSE 0 END) AS high_discount_amount,
           DSUM(CASE WHEN l_tax = 0 THEN 0
                     ELSE l_extendedprice * l_tax END) AS tax_amount,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY 1
    """,
)

# §2.2 computed projection (CASE bucketing), GROUP BY ordinals
_common(
    "priority_bucketing",
    """
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'expedite'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'standard'
                ELSE 'low' END AS priority_class,
           CASE WHEN o_totalprice >= 200000 THEN 'large'
                WHEN o_totalprice >= 50000 THEN 'medium'
                ELSE 'small' END AS size_class,
           COUNT(*) AS n_orders,
           DSUM(o_totalprice) AS total_price
    FROM orders
    GROUP BY 1, 2
    """,
)

# §2.2 predicate surface: IN + LIKE + NOT LIKE + <> '' + IS NOT NULL + BETWEEN
_common(
    "predicate_gauntlet",
    """
    SELECT COUNT(*) AS n_rows,
           DSUM(l.l_extendedprice) AS total_price,
           COUNT(DISTINCT p.p_brand) AS n_brands
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type IN ('ECONOMY', 'SMALL', 'STANDARD')
      AND p.p_name LIKE '%a%'
      AND p.p_name NOT LIKE '%zz%'
      AND p.p_brand <> ''
      AND p.p_brand IS NOT NULL
      AND l.l_quantity BETWEEN 5 AND 45
    """,
)

# §2.4 COUNT(DISTINCT ...) ×2
_common(
    "count_distinct_profile",
    """
    SELECT c.c_mktsegment AS segment,
           COUNT(DISTINCT o.o_custkey) AS n_customers,
           COUNT(DISTINCT o.o_orderkey) AS n_orders,
           COUNT(*) AS n_rows
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)

# §2.4 HAVING
_common(
    "having_active_suppliers",
    """
    SELECT l_suppkey AS suppkey,
           COUNT(*) AS n_items,
           DSUM(l_quantity) AS total_qty
    FROM lineitem
    GROUP BY 1
    HAVING COUNT(*) > 10
    """,
)

# §2.4 multi-level aggregation (agg of agg)
_common(
    "multi_level_agg",
    """
    WITH per_cust AS (
        SELECT MONTH_STR(o_orderdate) AS month, o_custkey,
               DSUM(o_totalprice) AS cust_spend
        FROM orders
        GROUP BY 1, 2
    )
    SELECT month,
           COUNT(*) AS n_customers,
           DSUM(cust_spend) AS month_spend,
           MAX(cust_spend) AS max_cust_spend
    FROM per_cust
    GROUP BY 1
    """,
)

# §2.3 composite-key LEFT JOIN spine (kpi_tracker.sql:96-205 shape)
_common(
    "spine_left_join",
    """
    WITH spine AS (
        SELECT MONTH_STR(o_orderdate) AS month, o_orderstatus AS status,
               DSUM(o_totalprice) AS total_spend
        FROM orders
        GROUP BY 1, 2
    ),
    items AS (
        SELECT MONTH_STR(o.o_orderdate) AS month, o.o_orderstatus AS status,
               DSUM(l.l_extendedprice) AS item_spend,
               COUNT(*) AS n_items
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_returnflag <> 'R'
        GROUP BY 1, 2
    )
    SELECT s.month, s.status, s.total_spend,
           COALESCE(i.item_spend, 0.0) AS item_spend,
           COALESCE(i.n_items, 0) AS n_items
    FROM spine s
    LEFT JOIN items i ON s.month = i.month AND s.status = i.status
    """,
)

# §2.3 current-vs-previous-month self-join (spend_analytics.py:112-144)
_common(
    "mom_self_join",
    """
    WITH monthly AS (
        SELECT n.n_name AS nation, MONTH_STR(o.o_orderdate) AS month,
               DSUM(o.o_totalprice) AS spend
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
    )
    SELECT cur.nation, cur.month,
           cur.spend AS current_spend,
           prev.spend AS previous_spend,
           ROUND((cur.spend - prev.spend) / NULLIF(prev.spend, 0) * 100, 6) AS change_pct
    FROM monthly cur
    LEFT JOIN monthly prev
      ON cur.nation = prev.nation
     AND prev.month = MONTH_STR(CAST(CAST(cur.month || '-01' AS DATE)
                                     - INTERVAL '1' MONTH AS TIMESTAMP))
    """,
)

# §2.4 pct-of-total via empty-frame window (spend_analytics.py:196-202)
_common(
    "pct_of_total",
    """
    WITH nat AS (
        SELECT n.n_name AS nation, DSUM(o.o_totalprice) AS spend
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1
    )
    SELECT nation, spend,
           ROUND(spend * 100.0 /
                 CAST(SUM(CAST(spend AS DECIMAL(38,6))) OVER () AS DOUBLE),
                 6) AS pct_of_total
    FROM nat
    """,
)

# §2.9 z-score anomaly detection (ai_recommendations.py:35-93) —
# stddev re-derived from exact decimal sums so both engines agree bit-for-bit
_common(
    "anomaly_zscore",
    """
    WITH daily AS (
        SELECT event_type, DAY_STR(ts) AS day,
               DSUM(value) AS daily_value,
               COUNT(*) AS n_events
        FROM events
        GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type,
               DSUM(daily_value) / COUNT(*) AS mean_value,
               SQRT((DSUM(daily_value * daily_value)
                     - DSUM(daily_value) * DSUM(daily_value) / COUNT(*))
                    / (COUNT(*) - 1)) AS std_value
        FROM daily
        GROUP BY 1
    )
    SELECT d.event_type, d.day, d.daily_value,
           ROUND(s.mean_value, 6) AS mean_value,
           ROUND(s.std_value, 6) AS std_value,
           ROUND(ABS(d.daily_value - s.mean_value) / NULLIF(s.std_value, 0), 6) AS z_score,
           CASE WHEN ABS(d.daily_value - s.mean_value) > 2 * s.std_value
                THEN CASE WHEN d.daily_value > s.mean_value
                          THEN 'high_anomaly' ELSE 'low_anomaly' END
                ELSE 'normal' END AS classification
    FROM daily d JOIN stats s ON d.event_type = s.event_type
    """,
)

# §2.5 LAG(1) / LAG(12) over month order (spend_analytics.py:48-49)
_common(
    "lag_mom_yoy",
    """
    WITH monthly AS (
        SELECT MONTH_STR(o_orderdate) AS month, DSUM(o_totalprice) AS spend
        FROM orders
        GROUP BY 1
    )
    SELECT month, spend,
           LAG(spend, 1) OVER (ORDER BY month) AS prev_month_spend,
           LAG(spend, 12) OVER (ORDER BY month) AS prev_year_spend,
           ROUND((spend - LAG(spend, 1) OVER (ORDER BY month))
                 / NULLIF(LAG(spend, 1) OVER (ORDER BY month), 0) * 100, 6) AS mom_pct
    FROM monthly
    """,
)

# §2.5 LAG over PARTITION BY (ai_recommendations.py:380-381)
_common(
    "lag_partitioned",
    """
    WITH daily AS (
        SELECT event_type, DAY_STR(ts) AS day, DSUM(value) AS daily_value
        FROM events
        GROUP BY 1, 2
    )
    SELECT event_type, day, daily_value,
           LAG(daily_value, 1) OVER (PARTITION BY event_type ORDER BY day) AS prev_value
    FROM daily
    """,
)

# §2.5 LAG over aggregate in one block + NULLIF pct change (test_14:237-249)
_common(
    "lag_over_agg",
    """
    SELECT event_type, DAY_STR(ts) AS day,
           DSUM(value) AS current_value,
           LAG(DSUM(value)) OVER (PARTITION BY event_type ORDER BY DAY_STR(ts)) AS previous_value,
           ROUND((DSUM(value)
                  - LAG(DSUM(value)) OVER (PARTITION BY event_type ORDER BY DAY_STR(ts)))
                 / NULLIF(LAG(DSUM(value)) OVER (PARTITION BY event_type ORDER BY DAY_STR(ts)), 0)
                 * 100, 6) AS change_pct
    FROM events
    GROUP BY 1, 2
    """,
)

# §2.5 RANK() OVER (ORDER BY agg DESC) (test_14:276)
_common(
    "rank_event_types",
    """
    SELECT event_type,
           DSUM(value) AS total_value,
           RANK() OVER (ORDER BY DSUM(value) DESC) AS value_rank
    FROM events
    GROUP BY 1
    """,
)

# §2.6 top-k per group (window row_number)
_common(
    "topk_days_per_type",
    """
    WITH daily AS (
        SELECT event_type, DAY_STR(ts) AS day, DSUM(value) AS daily_value
        FROM events
        GROUP BY 1, 2
    )
    SELECT event_type, day, daily_value
    FROM (
        SELECT daily.*,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY daily_value DESC, day) AS rn
        FROM daily
    ) ranked
    WHERE rn <= 2
    """,
)

# §2.2 DISTINCT projection (billing-period discovery shape)
_common(
    "distinct_months",
    "SELECT DISTINCT MONTH_STR(o_orderdate) AS billing_period FROM orders",
)

# §2.8 scalar function surface in one projection
_common(
    "scalar_functions_showcase",
    """
    SELECT doc_id,
           split_part(source, 'c', 2) AS source_num,
           lower(lang) AS lang_lower,
           concat(lang, '-', source) AS lang_source,
           replace(source, 'src', 'origin_') AS renamed_source,
           regexp_extract(text, '(table|row|scan)', 1) AS first_kw,
           CAST(ROUND(n_chars / 100.0, 2) AS DOUBLE) AS hundreds,
           ABS(n_chars - 250) AS dist_from_250,
           COALESCE(NULLIF(lang, 'en'), 'english') AS lang_normalized,
           substring(text, 1, 10) AS prefix10
    FROM documents
    """,
)

# §2.8 interval arithmetic + date_trunc window filter (anchored "now")
_common(
    "recent_orders_interval",
    """
    SELECT MONTH_STR(o_orderdate) AS month,
           COUNT(*) AS n_orders,
           DSUM(o_totalprice) AS spend
    FROM orders
    WHERE o_orderdate >= CAST(DATE_TRUNC('month', DATE '2001-08-01')
                              - INTERVAL '3' MONTH AS TIMESTAMP)
      AND o_orderdate < TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY 1
    """,
)

# §2.6 mixed-direction deterministic sort + LIMIT
_common(
    "ordered_limit_sample",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)

# §2.7 UNION ALL + DISTINCT dedup
_common(
    "union_distinct_statuses",
    """
    SELECT status, COUNT(*) AS n_pairs
    FROM (
        SELECT DISTINCT * FROM (
            SELECT o_orderstatus AS status, o_custkey AS custkey
            FROM orders WHERE o_totalprice > 150000
            UNION ALL
            SELECT o_orderstatus AS status, o_custkey AS custkey
            FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        ) unioned
    ) deduped
    GROUP BY 1
    """,
)

# §2.8 JSON string extraction (tags-like handling)
_common(
    "json_props_extract",
    """
    SELECT CAST(JSON_STR(props, '$.k') AS BIGINT) % 10 AS k_mod,
           COUNT(*) AS n_events,
           DSUM(value) AS total_value
    FROM events
    GROUP BY 1
    """,
)

# sessionization (common OLAP pattern; lag + gap + running sum)
_common(
    "sessionization",
    """
    WITH seq AS (
        SELECT user_id, event_id, ts, value,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL '30' MINUTE
                    THEN 1 ELSE 0 END AS is_new_session
        FROM seq
    ),
    sessions AS (
        SELECT user_id, value,
               SUM(is_new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS session_id
        FROM flagged
    )
    SELECT user_id,
           CAST(MAX(session_id) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events,
           DSUM(value) AS total_value
    FROM sessions
    GROUP BY 1
    """,
)

# tumbling hourly rollup (batch form; streaming variant in streaming/)
_common(
    "hourly_rollup",
    """
    SELECT HOUR_STR(ts) AS hour, event_type,
           COUNT(*) AS n_events,
           DSUM(value) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)


# --------------------------------------------------------------------- #
# DataFrame-API implementations (plan pinned by hand)                    #
# --------------------------------------------------------------------- #
def q_star_join_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dims star join with explicit broadcast of every dim side
    (reference: tiny instance_map dim join, kpi_instance_all.sql:116-118).
    supplier/nation/region are orders-of-magnitude smaller than lineitem —
    at 100 TB the fact table shuffle is avoided entirely."""
    t = register_testdata(spark, sf_dir)
    revenue = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast(T.DecimalType(38, 6))
    return (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


QUERIES["star_join_regions"] = q_star_join_regions
ORACLES["star_join_regions"] = render(
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           DSUM(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
    "duckdb",
)


def q_map_column_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType column access — the reference reads CUR's ``product['region']``
    map column (kpi_instance_all.sql:23,28-35). Testdata has no map column,
    so build one from the events JSON props, then access by key."""
    t = register_testdata(spark, sf_dir)
    with_map = t["events"].withColumn(
        "props_map", F.from_json(F.col("props"), T.MapType(T.StringType(), T.LongType()))
    )
    return (
        with_map
        .withColumn("k_value", F.col("props_map")["k"])
        .groupBy((F.col("k_value") % 7).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(T.DecimalType(38, 6))).cast("double").alias("total_value"),
        )
    )


QUERIES["map_column_access"] = q_map_column_access
ORACLES["map_column_access"] = render(
    """
    SELECT CAST(JSON_STR(props, '$.k') AS BIGINT) % 7 AS k_bucket,
           COUNT(*) AS n_events,
           DSUM(value) AS total_value
    FROM events
    GROUP BY 1
    """,
    "duckdb",
)
