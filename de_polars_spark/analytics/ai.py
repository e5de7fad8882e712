"""AI recommendations — anomaly detection, insights, NL analysis, forecast.

Capability parity with the reference's AIRecommendations
(de_polars/analytics/ai_recommendations.py:22-745). Two documented
reference defects NOT replicated (SURVEY.md §3.2): ai_recommendations.py
:204 and :387 execute an undefined variable ``sql`` (the queries were
built as ``patterns_sql``/``historical_sql``), so get_optimization_insights
and get_forecasting could only ever return their exception envelopes —
here they run their intended queries.
"""

from __future__ import annotations

import math
from typing import Any

from de_polars_spark.analytics.base import AnalyticsModule

_ANOMALY_SQL = """
WITH daily_spend AS (
    SELECT DATE(line_item_usage_start_date) AS usage_date,
           product_servicecode, product_region,
           SUM(line_item_unblended_cost) AS daily_cost
    FROM {table}
    WHERE line_item_unblended_cost > 0
      AND line_item_usage_start_date >= {now} - INTERVAL '{lookback_days}' DAY
    GROUP BY 1, 2, 3
),
spend_statistics AS (
    SELECT product_servicecode, product_region,
           AVG(daily_cost) AS avg_daily_cost,
           STDDEV(daily_cost) AS stddev_daily_cost,
           COUNT(*) AS days_of_data
    FROM daily_spend
    GROUP BY 1, 2
    HAVING COUNT(*) >= 7
),
anomaly_detection AS (
    SELECT ds.usage_date, ds.product_servicecode, ds.product_region, ds.daily_cost,
           ss.avg_daily_cost, ss.stddev_daily_cost,
           CASE WHEN ss.stddev_daily_cost > 0
                THEN ABS(ds.daily_cost - ss.avg_daily_cost) / ss.stddev_daily_cost
                ELSE 0 END AS z_score,
           CASE WHEN ds.daily_cost > ss.avg_daily_cost + (ss.stddev_daily_cost * {sensitivity})
                     THEN 'high_spend_anomaly'
                WHEN ds.daily_cost < ss.avg_daily_cost - (ss.stddev_daily_cost * {sensitivity})
                     AND ds.daily_cost > 0 THEN 'low_spend_anomaly'
                ELSE 'normal' END AS anomaly_type
    FROM daily_spend ds
    JOIN spend_statistics ss
      ON ds.product_servicecode = ss.product_servicecode
     AND ds.product_region = ss.product_region
)
SELECT usage_date, product_servicecode, product_region, daily_cost,
       avg_daily_cost, z_score, anomaly_type,
       (daily_cost - avg_daily_cost) AS cost_deviation
FROM anomaly_detection
WHERE anomaly_type != 'normal'
ORDER BY ABS(cost_deviation) DESC, usage_date, product_servicecode, product_region
LIMIT 20
"""

_PATTERNS_SQL = """
WITH monthly_patterns AS (
    SELECT DATE_TRUNC('month', line_item_usage_start_date) AS month,
           product_servicecode,
           SUM(line_item_unblended_cost) AS monthly_spend,
           COUNT(DISTINCT line_item_resource_id) AS resource_count,
           AVG(line_item_unblended_cost) AS avg_resource_cost
    FROM {table}
    WHERE line_item_unblended_cost > 0
      AND line_item_usage_start_date >= {now} - INTERVAL '6' MONTH
    GROUP BY 1, 2
),
growth_analysis AS (
    SELECT product_servicecode,
           AVG(monthly_spend) AS avg_monthly_spend,
           STDDEV(monthly_spend) AS spend_volatility,
           (MAX(monthly_spend) - MIN(monthly_spend)) / MIN(monthly_spend) * 100 AS growth_rate,
           COUNT(*) AS months_data
    FROM monthly_patterns
    GROUP BY 1
    HAVING COUNT(*) >= 3
)
SELECT product_servicecode AS service, avg_monthly_spend, spend_volatility,
       growth_rate, months_data,
       CASE WHEN growth_rate > 50 THEN 'rapid_growth'
            WHEN growth_rate > 20 THEN 'growing'
            WHEN growth_rate > -10 THEN 'stable'
            ELSE 'declining' END AS pattern_type
FROM growth_analysis
WHERE avg_monthly_spend > {min_spend}
ORDER BY avg_monthly_spend DESC, service
"""

_HISTORICAL_SQL = """
WITH monthly_spend AS (
    SELECT DATE_TRUNC('month', line_item_usage_start_date) AS month,
           product_servicecode,
           SUM(line_item_unblended_cost) AS monthly_cost
    FROM {table}
    WHERE line_item_unblended_cost > 0
      AND line_item_usage_start_date >= {now} - INTERVAL '12' MONTH
    GROUP BY 1, 2
)
SELECT month, product_servicecode, monthly_cost,
       LAG(monthly_cost, 1) OVER (PARTITION BY product_servicecode ORDER BY month)
           AS prev_month_cost,
       LAG(monthly_cost, 12) OVER (PARTITION BY product_servicecode ORDER BY month)
           AS year_ago_cost
FROM monthly_spend
ORDER BY product_servicecode, month
"""


class AIRecommendations(AnalyticsModule):
    def get_anomaly_detection(
        self, sensitivity: float = 2.0, lookback_days: int = 30
    ) -> dict[str, Any]:
        """GET /api/v1/finops/ai/anomaly-detection
        (ai_recommendations.py:22-151): z-score per (service, region)."""
        rows = self._rows(
            self._sql(
                _ANOMALY_SQL,
                sensitivity=float(sensitivity),
                lookback_days=int(lookback_days),
            )
        )
        anomalies = []
        for r in rows:
            deviation = float(r["cost_deviation"])
            z = float(r["z_score"])
            anomalies.append(
                {
                    "date": str(r["usage_date"]),
                    "service": r["product_servicecode"],
                    "region": r["product_region"],
                    "daily_cost": float(r["daily_cost"]),
                    "expected_cost": float(r["avg_daily_cost"]),
                    "cost_deviation": round(deviation, 2),
                    "z_score": round(z, 2),
                    "anomaly_type": r["anomaly_type"],
                    "severity": "critical" if z > 4 else "high" if z > 3 else "medium",
                    "confidence": min(99, round(50 + z * 12, 0)),
                    "root_cause": self._analyze_anomaly_root_cause(
                        r["product_servicecode"], r["anomaly_type"], deviation
                    ),
                }
            )
        return {
            "anomalies": anomalies,
            "anomaly_count": len(anomalies),
            "predictions": self._generate_anomaly_predictions(anomalies),
            "root_cause_summary": self._summarize_root_causes(anomalies),
        }

    def get_optimization_insights(self, min_spend: float = 1000.0) -> dict[str, Any]:
        """GET /api/v1/finops/ai/optimization-insights
        (ai_recommendations.py:153-242, NameError at :204 fixed)."""
        rows = self._rows(self._sql(_PATTERNS_SQL, min_spend=float(min_spend)))
        insights = []
        for r in rows:
            insight = self._generate_service_insights(
                r["service"], r["pattern_type"],
                float(r["avg_monthly_spend"]), float(r["growth_rate"]),
            )
            insights.append(
                {
                    "service": r["service"],
                    "pattern_type": r["pattern_type"],
                    "avg_monthly_spend": float(r["avg_monthly_spend"]),
                    "growth_rate": round(float(r["growth_rate"]), 1),
                    "ai_insights": insight["insights"],
                    "optimization_opportunities": insight["opportunities"],
                    "priority_score": insight["priority"],
                    "confidence": insight["confidence"],
                }
            )
        return {
            "insights": insights,
            "pattern_summary": self._analyze_spending_patterns(insights),
            "recommendations": self._generate_ai_recommendations(insights),
        }

    def analyze_custom_query(
        self, query_text: str, analysis_type: str = "cost_analysis"
    ) -> dict[str, Any]:
        """POST /api/v1/finops/ai/custom-analysis
        (ai_recommendations.py:244-351): keyword → canned SQL template."""
        q = query_text.lower()
        if "highest cost" in q or "most expensive" in q:
            sql = """
            SELECT product_servicecode,
                   SUM(line_item_unblended_cost) AS total_cost,
                   COUNT(DISTINCT line_item_resource_id) AS resource_count
            FROM {table}
            WHERE line_item_unblended_cost > 0
              AND DATE_TRUNC('month', line_item_usage_start_date) = DATE_TRUNC('month', {now})
            GROUP BY 1 ORDER BY total_cost DESC, product_servicecode LIMIT 5
            """
            focus = "highest_cost_services"
        elif "trend" in q or "over time" in q:
            sql = """
            SELECT DATE_TRUNC('month', line_item_usage_start_date) AS month,
                   SUM(line_item_unblended_cost) AS monthly_cost
            FROM {table}
            WHERE line_item_unblended_cost > 0
              AND line_item_usage_start_date >= {now} - INTERVAL '6' MONTH
            GROUP BY 1 ORDER BY 1
            """
            focus = "cost_trends"
        elif "region" in q:
            sql = """
            SELECT product_region,
                   SUM(line_item_unblended_cost) AS total_cost,
                   COUNT(DISTINCT product_servicecode) AS service_count
            FROM {table}
            WHERE line_item_unblended_cost > 0
              AND DATE_TRUNC('month', line_item_usage_start_date) = DATE_TRUNC('month', {now})
            GROUP BY 1 ORDER BY total_cost DESC, product_region
            """
            focus = "regional_analysis"
        else:
            sql = """
            SELECT 'total_spend' AS metric, SUM(line_item_unblended_cost) AS value
            FROM {table}
            WHERE line_item_unblended_cost > 0
              AND DATE_TRUNC('month', line_item_usage_start_date) = DATE_TRUNC('month', {now})
            """
            focus = "general_summary"
        results = self._rows(self._sql(sql))
        return {
            "query": query_text,
            "analysis_type": analysis_type,
            "analysis_focus": focus,
            "results": results,
            "narrative_insights": self._generate_narrative_insights(results, focus),
            "visualizations": self._suggest_visualizations(focus),
            "confidence": 85,
        }

    def get_forecasting(self, forecast_months: int = 6) -> dict[str, Any]:
        """GET /api/v1/finops/ai/forecasting
        (ai_recommendations.py:353-432, NameError at :387 fixed)."""
        rows = self._rows(self._sql(_HISTORICAL_SQL))
        service_data: dict[str, list[dict]] = {}
        for r in rows:
            service_data.setdefault(r["product_servicecode"], []).append(
                {"month": str(r["month"]), "cost": float(r["monthly_cost"])}
            )
        forecasts, total = [], 0.0
        for service, hist in service_data.items():
            if len(hist) >= 3:
                f = self._generate_ml_forecast(service, hist, int(forecast_months))
                forecasts.append(f)
                total += sum(m["forecasted_cost"] for m in f["monthly_forecasts"])
        scenarios = self._generate_forecast_scenarios(total)
        return {
            "forecasts": forecasts,
            "scenarios": scenarios,
            "business_impact": {
                "budget_risk": "high" if total > 0 and any(
                    f["trend"] == "increasing" for f in forecasts
                ) else "low",
                "total_at_stake": round(total, 2),
            },
            "summary": {
                "total_services_forecasted": len(forecasts),
                "forecast_period_months": int(forecast_months),
                "total_forecasted_cost": round(total, 2),
                "forecast_confidence": self._overall_confidence(forecasts),
            },
        }

    # ---- driver-side math (ai_recommendations.py:434-745) ------------- #
    @staticmethod
    def _generate_ml_forecast(service: str, hist: list[dict], months: int) -> dict:
        """Linear trend + sinusoidal seasonality ±15% CI
        (ai_recommendations.py:653-689)."""
        recent = [d["cost"] for d in hist[-6:]]
        if len(recent) < 2:
            return {"service": service, "monthly_forecasts": [], "confidence": 0,
                    "trend": "flat", "total_forecasted": 0}
        avg_change = sum(
            recent[i] - recent[i - 1] for i in range(1, len(recent))
        ) / (len(recent) - 1)
        base = recent[-1]
        monthly = []
        for month in range(1, months + 1):
            cost = (base + avg_change * month) * (1 + 0.1 * math.sin(month * math.pi / 6))
            monthly.append(
                {
                    "month": month,
                    "forecasted_cost": max(0, cost),
                    "confidence_interval": {
                        "lower": max(0, cost * 0.85),
                        "upper": cost * 1.15,
                    },
                }
            )
        confidence = max(60, 90 - abs(avg_change) / base * 100) if base > 0 else 60
        return {
            "service": service,
            "monthly_forecasts": monthly,
            "confidence": round(confidence, 1),
            "trend": "increasing" if avg_change > 0 else "decreasing",
            "total_forecasted": sum(m["forecasted_cost"] for m in monthly),
        }

    @staticmethod
    def _generate_forecast_scenarios(total_cost: float) -> list[dict]:
        return [
            {"scenario": "optimistic", "description": "Best case with cost optimizations",
             "total_cost": total_cost * 0.85, "probability": 25},
            {"scenario": "baseline", "description": "Current trajectory",
             "total_cost": total_cost, "probability": 50},
            {"scenario": "pessimistic", "description": "Accelerated growth, no optimization",
             "total_cost": total_cost * 1.20, "probability": 25},
        ]

    @staticmethod
    def _overall_confidence(forecasts: list[dict]) -> float:
        if not forecasts:
            return 0.0
        return round(sum(f["confidence"] for f in forecasts) / len(forecasts), 1)

    @staticmethod
    def _analyze_anomaly_root_cause(service: str, anomaly_type: str, deviation: float) -> dict:
        if anomaly_type == "high_spend_anomaly":
            causes = ["usage spike", "new resources launched", "pricing change"]
        else:
            causes = ["resources terminated", "workload migrated", "reporting gap"]
        return {"probable_causes": causes, "service": service,
                "impact": round(abs(deviation), 2)}

    @staticmethod
    def _generate_anomaly_predictions(anomalies: list[dict]) -> list[dict]:
        by_service: dict[str, int] = {}
        for a in anomalies:
            by_service[a["service"]] = by_service.get(a["service"], 0) + 1
        return [
            {"service": s, "recurrence_risk": "high" if n >= 3 else "medium" if n == 2 else "low",
             "observed_anomalies": n}
            for s, n in sorted(by_service.items(), key=lambda kv: -kv[1])
        ]

    @staticmethod
    def _summarize_root_causes(anomalies: list[dict]) -> list[dict]:
        counts: dict[str, int] = {}
        for a in anomalies:
            counts[a["anomaly_type"]] = counts.get(a["anomaly_type"], 0) + 1
        return [{"anomaly_type": t, "count": n} for t, n in sorted(counts.items())]

    @staticmethod
    def _generate_service_insights(
        service: str, pattern: str, spend: float, growth: float
    ) -> dict:
        opportunities = []
        if pattern in ("rapid_growth", "growing"):
            opportunities.append("negotiate committed-use discounts before growth compounds")
        if spend > 10000:
            opportunities.append("evaluate savings plans coverage")
        if pattern == "declining":
            opportunities.append("release unused reservations")
        priority = 90 if pattern == "rapid_growth" else 70 if pattern == "growing" else 40
        return {
            "insights": [f"{service} spend is {pattern} ({growth:.0f}% range over window)"],
            "opportunities": opportunities or ["monitor"],
            "priority": priority,
            "confidence": 80,
        }

    @staticmethod
    def _analyze_spending_patterns(insights: list[dict]) -> dict:
        dist: dict[str, int] = {}
        for i in insights:
            dist[i["pattern_type"]] = dist.get(i["pattern_type"], 0) + 1
        return {"pattern_distribution": dist, "services_analyzed": len(insights)}

    @staticmethod
    def _generate_ai_recommendations(insights: list[dict]) -> list[dict]:
        return [
            {
                "service": i["service"],
                "action": i["optimization_opportunities"][0],
                "priority_score": i["priority_score"],
            }
            for i in sorted(insights, key=lambda x: -x["priority_score"])[:5]
        ]

    @staticmethod
    def _generate_narrative_insights(results: list[dict], focus: str) -> list[str]:
        if not results:
            return ["No data matched the analysis window."]
        if focus == "highest_cost_services":
            top = results[0]
            return [f"Top cost driver: {top.get('product_servicecode')} at "
                    f"${float(top.get('total_cost') or 0):,.2f} this month."]
        if focus == "cost_trends":
            return [f"{len(results)} months of trend data analyzed."]
        if focus == "regional_analysis":
            return [f"Spend observed in {len(results)} regions."]
        return [f"Total spend this month: ${float(results[0].get('value') or 0):,.2f}."]

    @staticmethod
    def _suggest_visualizations(focus: str) -> list[dict]:
        mapping = {
            "highest_cost_services": {"type": "bar", "x": "product_servicecode", "y": "total_cost"},
            "cost_trends": {"type": "line", "x": "month", "y": "monthly_cost"},
            "regional_analysis": {"type": "bar", "x": "product_region", "y": "total_cost"},
            "general_summary": {"type": "stat", "value": "value"},
        }
        return [mapping.get(focus, {"type": "table"})]
