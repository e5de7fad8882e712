"""Discount tracking — agreements, negotiation, usage forecasting, ROI.

Capability parity with the reference's DiscountTracking
(de_polars/analytics/discounts.py:23-570). Documented reference defect
NOT replicated (SURVEY.md §3.2): discounts.py:38-49 selects columns that
don't exist in CUR 2.0 (``pricing_term``, ``reservation_arn``, bare
``linked_account_id``) so get_current_agreements could only return its
exception envelope. Here the pricing-model classification derives from
``line_item_line_item_type`` and the real ARN columns, and the account
count uses ``line_item_usage_account_id``.
"""

from __future__ import annotations

import math
from typing import Any

from de_polars_spark.analytics.base import AnalyticsModule

_AGREEMENTS_SQL = """
WITH discount_usage AS (
    SELECT product_servicecode,
           CASE WHEN line_item_line_item_type IN ('DiscountedUsage', 'RIFee')
                     OR reservation_reservation_a_r_n <> '' THEN 'Reserved Instance'
                WHEN line_item_line_item_type LIKE 'SavingsPlan%'
                     OR savings_plan_savings_plan_a_r_n <> '' THEN 'Savings Plan'
                WHEN line_item_usage_type LIKE '%Spot%' THEN 'Spot Instance'
                ELSE 'On-Demand' END AS pricing_model,
           SUM(line_item_unblended_cost) AS total_cost,
           SUM(line_item_usage_amount) AS total_usage,
           COUNT(DISTINCT line_item_resource_id) AS resource_count
    FROM {table}
    WHERE line_item_unblended_cost > 0
      AND DATE_TRUNC('month', line_item_usage_start_date) = DATE_TRUNC('month', {now})
    GROUP BY 1, 2
)
SELECT pricing_model AS agreement_type,
       product_servicecode AS service,
       SUM(total_cost) AS monthly_cost,
       SUM(total_usage) AS monthly_usage,
       SUM(resource_count) AS total_resources,
       SUM(total_cost) * 12 AS annual_commitment
FROM discount_usage
WHERE pricing_model IN ('Reserved Instance', 'Savings Plan')
GROUP BY 1, 2
ORDER BY monthly_cost DESC, service
"""

_NEGOTIATION_SQL = """
WITH service_spend AS (
    SELECT product_servicecode AS service,
           SUM(line_item_unblended_cost) AS annual_spend,
           COUNT(DISTINCT line_item_usage_account_id) AS account_count,
           COUNT(DISTINCT line_item_resource_id) AS resource_count
    FROM {table}
    WHERE line_item_unblended_cost > 0
      AND line_item_usage_start_date >= {now} - INTERVAL '12' MONTH
    GROUP BY 1
),
high_spend_services AS (
    SELECT service, annual_spend, account_count, resource_count,
           CASE WHEN annual_spend > 500000 THEN 20
                WHEN annual_spend > 100000 THEN 15
                WHEN annual_spend > 50000 THEN 10
                ELSE 5 END AS potential_discount_pct
    FROM service_spend
    WHERE annual_spend > {min_spend}
)
SELECT service, annual_spend AS current_spend, potential_discount_pct,
       (annual_spend * potential_discount_pct / 100) AS estimated_savings,
       CASE WHEN annual_spend > 500000 THEN 'high'
            WHEN annual_spend > 100000 THEN 'medium'
            ELSE 'low' END AS negotiation_priority,
       account_count, resource_count
FROM high_spend_services
ORDER BY estimated_savings DESC, service
"""

_FORECAST_SQL = """
WITH monthly_usage AS (
    SELECT DATE_TRUNC('month', line_item_usage_start_date) AS month,
           product_servicecode, product_instance_type,
           SUM(line_item_usage_amount) AS monthly_usage,
           SUM(line_item_unblended_cost) AS monthly_cost
    FROM {table}
    WHERE line_item_unblended_cost > 0
      AND line_item_usage_start_date >= {now} - INTERVAL '6' MONTH
    GROUP BY 1, 2, 3
),
usage_trends AS (
    SELECT product_servicecode, product_instance_type,
           AVG(monthly_usage) AS avg_monthly_usage,
           STDDEV(monthly_usage) AS usage_stddev,
           AVG(monthly_cost) AS avg_monthly_cost,
           COUNT(*) AS months_of_data
    FROM monthly_usage
    GROUP BY 1, 2
    HAVING COUNT(*) >= {min_months}
)
SELECT product_servicecode AS service, product_instance_type AS instance_type,
       avg_monthly_usage, usage_stddev, avg_monthly_cost, months_of_data,
       CASE WHEN usage_stddev / avg_monthly_usage < 0.2 THEN 'stable'
            WHEN usage_stddev / avg_monthly_usage < 0.5 THEN 'moderate'
            ELSE 'volatile' END AS usage_pattern
FROM usage_trends
WHERE avg_monthly_usage > 0
ORDER BY avg_monthly_cost DESC, service, instance_type
LIMIT 20
"""

_MONTHLY_BASELINE_SQL = """
SELECT SUM(line_item_unblended_cost) * 12 AS annual_spend
FROM {table}
WHERE DATE_TRUNC('month', line_item_usage_start_date) = DATE_TRUNC('month', {now})
"""


class DiscountTracking(AnalyticsModule):
    def get_current_agreements(self) -> dict[str, Any]:
        """GET /api/v1/finops/discounts/current-agreements
        (discounts.py:23-126)."""
        rows = self._rows(self._sql(_AGREEMENTS_SQL))
        agreements, total_annual = [], 0.0
        for r in rows:
            annual = float(r["annual_commitment"])
            total_annual += annual
            utilization = min(95, max(65, 80 + (hash(r["service"]) % 30)))
            agreements.append(
                {
                    "agreement_id": f"{r['agreement_type']}-{r['service']}-{hash(r['service']) % 1000}",
                    "type": r["agreement_type"],
                    "service": r["service"],
                    "monthly_cost": float(r["monthly_cost"]),
                    "annual_commitment": annual,
                    "utilization_rate": utilization,
                    "coverage_percentage": min(100, utilization + 10),
                    "renewal_recommendation": "review" if utilization < 75 else "renew",
                    "term_length": "1_year",
                }
            )
        n = len(agreements)
        avg_util = sum(a["utilization_rate"] for a in agreements) / n if n else 0
        return {
            "agreements": agreements,
            "utilization": [
                {
                    "average_utilization": round(avg_util, 1),
                    "total_annual_commitment": round(total_annual, 2),
                    "agreements_count": n,
                    "underutilized_agreements": len(
                        [a for a in agreements if a["utilization_rate"] < 75]
                    ),
                }
            ],
            "renewals": self._generate_renewal_timeline(agreements),
            "summary": {
                "total_commitments": n,
                "annual_value": round(total_annual, 2),
                "avg_utilization": round(avg_util, 1),
            },
        }

    def get_negotiation_opportunities(self, min_spend: float = 10000.0) -> dict[str, Any]:
        """GET /api/v1/finops/discounts/negotiation-opportunities
        (discounts.py:128-238)."""
        rows = self._rows(self._sql(_NEGOTIATION_SQL, min_spend=float(min_spend)))
        benchmarks = {
            "AmazonEC2": {"average_discount": 12, "top_quartile": 18},
            "AmazonRDS": {"average_discount": 10, "top_quartile": 15},
            "AmazonS3": {"average_discount": 8, "top_quartile": 12},
            "AWSLambda": {"average_discount": 5, "top_quartile": 8},
        }
        opportunities, total_savings = [], 0.0
        for r in rows:
            spend = float(r["current_spend"])
            savings = float(r["estimated_savings"])
            total_savings += savings
            opportunities.append(
                {
                    "service": r["service"],
                    "current_spend": spend,
                    "potential_discount": float(r["potential_discount_pct"]),
                    "estimated_savings": savings,
                    "commitment_required": self._determine_commitment_requirement(spend),
                    "negotiation_priority": r["negotiation_priority"],
                    "market_benchmark": benchmarks.get(
                        r["service"], {"average_discount": 8, "top_quartile": 12}
                    ),
                    "account_coverage": int(r["account_count"]),
                    "resource_scale": int(r["resource_count"]),
                    "recommendation": self._generate_negotiation_recommendation(
                        spend, float(r["potential_discount_pct"])
                    ),
                }
            )
        market_rates = [
            {
                "service": svc,
                "industry_average": b["average_discount"],
                "top_tier_discount": b["top_quartile"],
                "our_potential": next(
                    (o["potential_discount"] for o in opportunities if o["service"] == svc), 0
                ),
            }
            for svc, b in benchmarks.items()
        ]
        return {
            "opportunities": opportunities,
            "savings_potential": round(total_savings, 2),
            "market_rates": market_rates,
            "negotiation_summary": {
                "high_priority_services": len(
                    [o for o in opportunities if o["negotiation_priority"] == "high"]
                ),
                "total_annual_spend": sum(o["current_spend"] for o in opportunities),
                "potential_annual_savings": round(total_savings, 2),
            },
        }

    def get_usage_forecasting(
        self, forecast_months: int = 12, min_months: int = 3
    ) -> dict[str, Any]:
        """GET /api/v1/finops/discounts/usage-forecasting
        (discounts.py:240-357): per-service seasonal+growth projection
        with risk scoring and commitment recommendations."""
        rows = self._rows(self._sql(_FORECAST_SQL, min_months=int(min_months)))
        forecasts, recommendations = [], []
        for r in rows:
            avg_usage = float(r["avg_monthly_usage"])
            avg_cost = float(r["avg_monthly_cost"])
            stddev = float(r["usage_stddev"]) if r["usage_stddev"] else 0.0
            pattern = r["usage_pattern"]
            monthly = []
            for month in range(1, int(forecast_months) + 1):
                seasonal = 1 + 0.1 * math.sin(month * math.pi / 6)
                growth = (1 + 0.02) ** month
                usage = avg_usage * seasonal * growth
                monthly.append(
                    {
                        "month": month,
                        "forecasted_usage": round(usage, 2),
                        "forecasted_cost": round(usage * (avg_cost / avg_usage), 2),
                    }
                )
            risk = self._calculate_forecast_risk(pattern, stddev, avg_usage)
            forecasts.append(
                {
                    "service": r["service"],
                    "instance_type": r["instance_type"],
                    "current_avg_usage": avg_usage,
                    "current_avg_cost": avg_cost,
                    "usage_pattern": pattern,
                    "risk_score": risk,
                    "monthly_forecasts": monthly,
                }
            )
            rec = self._generate_commitment_recommendation(
                r["service"], avg_cost * 12, pattern, risk
            )
            if rec:
                recommendations.append(rec)
        return {
            "forecasts": forecasts,
            "commitment_recommendations": recommendations,
            "portfolio_risk": self._analyze_portfolio_risk(forecasts),
            "confidence_metrics": self._calculate_forecast_confidence(forecasts),
        }

    def simulate_commitment_roi(
        self, commitment_amount: float, term_years: int = 3, discount_rate: float = 0.28
    ) -> dict[str, Any]:
        """Commitment/ROI simulator (discounts.py:359-431): covered vs
        uncovered spend, upfront = 10%, payback months, N-year ROI."""
        baseline_rows = self._rows(self._sql(_MONTHLY_BASELINE_SQL))
        annual_spend = (
            float(baseline_rows[0]["annual_spend"])
            if baseline_rows and baseline_rows[0]["annual_spend"] is not None
            else 0.0
        )
        covered = min(commitment_amount, annual_spend)
        uncovered = max(0.0, annual_spend - covered)
        annual_savings = covered * discount_rate
        upfront = commitment_amount * 0.10
        payback_months = (upfront / (annual_savings / 12)) if annual_savings > 0 else None
        roi = (
            ((annual_savings * term_years) - upfront) / upfront * 100
            if upfront > 0
            else None
        )
        return {
            "annual_spend_baseline": round(annual_spend, 2),
            "covered_spend": round(covered, 2),
            "uncovered_spend": round(uncovered, 2),
            "annual_savings": round(annual_savings, 2),
            "upfront_cost": round(upfront, 2),
            "payback_months": round(payback_months, 1) if payback_months else None,
            "roi_percentage": round(roi, 1) if roi is not None else None,
            "term_years": term_years,
            "coverage_risk": self._assess_commitment_risk(
                "savings_plan", covered / annual_spend * 100 if annual_spend else 0
            ),
        }

    # ---- driver-side helpers (discounts.py:433-570) ------------------- #
    @staticmethod
    def _generate_renewal_timeline(agreements: list[dict]) -> list[dict]:
        return [
            {
                "agreement_id": a["agreement_id"],
                "service": a["service"],
                "action": a["renewal_recommendation"],
                "priority": "high" if a["utilization_rate"] < 70 else "normal",
            }
            for a in agreements
        ]

    @staticmethod
    def _determine_commitment_requirement(annual_spend: float) -> str:
        if annual_spend > 500000:
            return "enterprise_agreement"
        if annual_spend > 100000:
            return "3_year_commitment"
        if annual_spend > 50000:
            return "1_year_commitment"
        return "no_commitment"

    @staticmethod
    def _generate_negotiation_recommendation(spend: float, discount: float) -> str:
        if spend > 500000:
            return "Engage AWS enterprise sales for custom EDP terms"
        if spend > 100000:
            return f"Negotiate {discount:.0f}% volume discount at renewal"
        return "Consolidate spend before negotiating"

    @staticmethod
    def _calculate_forecast_risk(pattern: str, stddev: float, avg_usage: float) -> str:
        if pattern == "volatile":
            return "high"
        if pattern == "moderate":
            return "medium"
        return "low"

    @staticmethod
    def _generate_commitment_recommendation(
        service: str, annual_cost: float, pattern: str, risk: str
    ) -> dict | None:
        if annual_cost < 1000 or risk == "high":
            return None
        commitment_pct = 0.8 if pattern == "stable" else 0.5
        return {
            "service": service,
            "recommended_commitment": round(annual_cost * commitment_pct, 2),
            "commitment_type": "savings_plan" if pattern == "stable" else "partial_ri",
            "rationale": f"{pattern} usage, {risk} risk",
        }

    @staticmethod
    def _analyze_portfolio_risk(forecasts: list[dict]) -> dict[str, Any]:
        dist = {"low": 0, "medium": 0, "high": 0}
        for f in forecasts:
            dist[f["risk_score"]] += 1
        n = len(forecasts) or 1
        return {
            "risk_distribution": dist,
            "high_risk_share": round(dist["high"] / n * 100, 1),
            "overall": "high" if dist["high"] > dist["low"] else "balanced",
        }

    @staticmethod
    def _calculate_forecast_confidence(forecasts: list[dict]) -> dict[str, float]:
        scores = {"stable": 90.0, "moderate": 70.0, "volatile": 40.0}
        if not forecasts:
            return {"overall_confidence": 0.0}
        avg = sum(scores[f["usage_pattern"]] for f in forecasts) / len(forecasts)
        return {"overall_confidence": round(avg, 1)}

    @staticmethod
    def _assess_commitment_risk(commitment_type: str, coverage: float) -> str:
        if coverage > 90:
            return "high"
        if coverage > 70:
            return "medium"
        return "low"
