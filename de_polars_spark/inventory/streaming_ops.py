"""Oracle check for the streaming window-aggregation semantics
(streaming/cost_alerts.py) in its batch form.

Structured Streaming's contract is that the same logical query runs
batch or streaming (tests/test_streaming.py asserts stream == batch);
this entry pins the batch side against DuckDB: Spark ``window()``
tumbling buckets == DuckDB ``time_bucket`` (both epoch-aligned), plus
the alert severity projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from de_polars_spark.inventory.dialect_macros import MACROS, render
from de_polars_spark.inventory.kpi_views import CUR_EXT_CTE, _ensure_cur_ext

QUERIES: dict = {}
ORACLES: dict = {}

MACROS.setdefault(
    "DAY_BUCKET",
    {
        "spark": "window({0}, '1 day').start",
        "duckdb": "time_bucket(INTERVAL '1 day', {0})",
    },
)

_WINDOWED_SQL = """
SELECT CAST(DAY_BUCKET(line_item_usage_start_date) AS TIMESTAMP) AS window_start,
       line_item_product_code AS service,
       DSUM(line_item_unblended_cost) AS current_cost,
       COUNT(*) AS line_items,
       CASE WHEN DSUM(line_item_unblended_cost) / 500000.0 >= 4 THEN 'critical'
            WHEN DSUM(line_item_unblended_cost) / 500000.0 >= 2 THEN 'high'
            WHEN DSUM(line_item_unblended_cost) / 500000.0 >= 1.2 THEN 'medium'
            ELSE 'low' END AS severity
FROM cur
GROUP BY 1, 2
ORDER BY 1, 2
"""


def _fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_cur_ext(spark, sf_dir)
    return spark.sql(
        render("WITH cur AS (SELECT * FROM cur_ext)\n" + _WINDOWED_SQL, "spark")
    )


_fn.__name__ = "q_streaming_windowed_costs"
QUERIES["streaming_windowed_costs"] = _fn
ORACLES["streaming_windowed_costs"] = render(CUR_EXT_CTE + "\n" + _WINDOWED_SQL, "duckdb")


def q_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` (the streaming sessionizer's batch form,
    streaming/sessionize.py) over the events table."""
    from de_polars_spark.sources.registry import register_testdata
    from de_polars_spark.streaming.sessionize import session_agg

    t = register_testdata(spark, sf_dir)
    return session_agg(t["events"], "user_id", "ts", "value", gap="30 minutes")


QUERIES["session_window_agg"] = q_session_window_agg
# Spark merges two windows iff the next event is STRICTLY inside the
# previous window [t, t+gap), so an event at exactly prev+gap opens a new
# session — hence >= in the oracle's gap test.
ORACLES["session_window_agg"] = render(
    """
    WITH seq AS (
        SELECT user_id, event_id, ts, value,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN prev_ts IS NULL
                         OR ts >= prev_ts + INTERVAL '30' MINUTE
                    THEN 1 ELSE 0 END AS is_new_session
        FROM seq
    ),
    sess AS (
        SELECT user_id, ts, value,
               SUM(is_new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS sid
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30' MINUTE AS session_end,
           COUNT(*) AS n_events,
           DSUM(value) AS total_value
    FROM sess
    GROUP BY user_id, sid
    """,
    "duckdb",
)


# --------------------------------------------------------------------- #
# Stream-stream interval join, batch form: views within 24h BEFORE each  #
# purchase (streaming/interval_join.py; stream == batch asserted in      #
# tests/test_streaming.py)                                               #
# --------------------------------------------------------------------- #
def q_interval_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from de_polars_spark.sources.registry import register_testdata
    from de_polars_spark.streaming.interval_join import interval_join_backward

    t = register_testdata(spark, sf_dir)
    ev = t["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts")
    )
    j = interval_join_backward(
        purchases, views, ["user_id"], "p_ts", "v_ts", 86400
    )
    return j.groupBy("event_id", "user_id").agg(
        F.count("*").alias("n_views_24h"),
        F.max(F.unix_micros(F.col("v_ts").cast("timestamp"))).alias(
            "last_view_us"
        ),
    )


QUERIES["interval_join_attribution"] = q_interval_join_attribution
ORACLES["interval_join_attribution"] = """
    SELECT p.event_id, p.user_id,
           COUNT(*) AS n_views_24h,
           MAX(epoch_us(v.ts)) AS last_view_us
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
      ON v.user_id = p.user_id
     AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 24 HOUR
    GROUP BY 1, 2
"""


# --------------------------------------------------------------------- #
# Late-arrival audit: what a watermark would have dropped                #
# (streaming/late_audit.py — the batch twin of late_audit_sink; same    #
# pairing as neardup_admission / neardup_ingest)                         #
# --------------------------------------------------------------------- #
_LATE_B = 500


def q_streaming_late_arrival_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de_polars_spark.sources.registry import register_testdata
    from de_polars_spark.streaming.late_audit import late_arrival_audit

    t = register_testdata(spark, sf_dir)
    return late_arrival_audit(
        t["events"], "event_id", "ts", _LATE_B, window="1 hour", delay="1 hour"
    )


_H_US = 3_600_000_000  # 1 hour in microseconds (window AND delay)
QUERIES["streaming_late_arrival_audit"] = q_streaming_late_arrival_audit
ORACLES["streaming_late_arrival_audit"] = f"""
    WITH ev AS (
        SELECT (event_id // {_LATE_B}) AS batch_id,
               epoch_us(ts) AS us
        FROM events
    ),
    bmax AS (SELECT batch_id, MAX(us) AS mx FROM ev GROUP BY 1),
    wm AS (
        SELECT batch_id,
               MAX(mx) OVER (ORDER BY batch_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) - {_H_US} AS wmk
        FROM bmax
    )
    SELECT ev.batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN wm.wmk IS NOT NULL
                          AND (ev.us // {_H_US} + 1) * {_H_US} <= wm.wmk
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late_dropped,
           ROUND(SUM(CASE WHEN wm.wmk IS NOT NULL
                           AND (ev.us // {_H_US} + 1) * {_H_US} <= wm.wmk
                          THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6)
               AS dropped_pct,
           COALESCE(strftime(make_timestamp(MIN(wm.wmk)),
                             '%Y-%m-%d %H:%M:%S'), '')
               AS watermark
    FROM ev JOIN wm ON ev.batch_id = wm.batch_id
    GROUP BY ev.batch_id
"""
