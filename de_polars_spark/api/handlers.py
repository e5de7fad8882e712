"""Framework-free endpoint handlers (reference de_polars/api/endpoints/*,
8 routers + health/root: fastapi_app.py:36-117).

Each handler returns a JSON-serializable dict; errors raise ``ApiError``
with an HTTP status. The FastAPI wrapper (fastapi_app.py here) maps these
1:1 onto routes; tests drive the handlers directly so the full serving
contract is exercised without the optional web dependency.
"""

from __future__ import annotations

import io
import re
import time
from typing import Any, Optional

from de_polars_spark.client import FinOpsEngine

DEFAULT_LIMIT = 1000
MAX_LIMIT = 10_000
MAX_SQL_LENGTH = 10_000


class ApiError(Exception):
    """Carries an HTTP status + structured detail (FastAPI HTTPException
    equivalent for the framework-free core)."""

    def __init__(self, status_code: int, detail: Any):
        super().__init__(str(detail))
        self.status_code = status_code
        self.detail = detail


def _classify_error(message: str) -> str:
    """Error taxonomy by message sniffing (sql_endpoints.py:214-233),
    extended with Spark's analyzer vocabulary."""
    lowered = message.lower()
    if (
        "not found" in lowered
        or "does not exist" in lowered
        or "table_or_view_not_found" in lowered
    ):
        return "TABLE_NOT_FOUND"
    if (
        "syntax error" in lowered
        or "parser error" in lowered
        or "parse_syntax_error" in lowered
    ):
        return "SQL_SYNTAX_ERROR"
    if "bind" in lowered or "unresolved_column" in lowered or "cannot be resolved" in lowered:
        return "COLUMN_NOT_FOUND"
    return "EXECUTION_ERROR"


class FinOpsHandlers:
    """All routes over one FinOpsEngine (the app factory's engine)."""

    def __init__(self, engine: FinOpsEngine):
        self.engine = engine

    # ------------------------------------------------------------------ #
    # health / root (fastapi_app.py:95-115)                               #
    # ------------------------------------------------------------------ #
    def health(self) -> dict:
        return {
            "status": "healthy",
            "version": "1.0.0",
            "engine_status": "operational",
            "data_source": "local" if self.engine.has_local_data() else "s3",
        }

    def root(self) -> dict:
        return {
            "message": "FinOps Cost Analytics API",
            "version": "1.0.0",
            "docs": "/docs",
            "health": "/health",
            "api_base": "/api/v1/finops",
        }

    # ------------------------------------------------------------------ #
    # SQL router (sql_endpoints.py:89-325)                                #
    # ------------------------------------------------------------------ #
    def _table_suggestions(self) -> list[str]:
        return [
            self.engine.config.table_name,
            "summary_view",
            "kpi_instance_all",
            "kpi_ebs_storage_all",
            "kpi_ebs_snap",
            "kpi_s3_storage_all",
            "kpi_instance_mapping",
        ]

    def sql_query(
        self,
        sql: str,
        limit: Optional[int] = DEFAULT_LIMIT,
        force_s3: bool = False,
        format: str = "json",
    ) -> dict:
        """POST /sql/query — guarded ad-hoc SQL (sql_endpoints.py:89-233).

        Validation is the engine's parser-based allow-list
        (SparkEngine.validate_select_only) instead of the reference's
        keyword regex; LIMIT injection applies the row cap via a real
        ``.limit()`` when the text has none (default 1000, max 10000)."""
        started = time.time()
        if not sql or not sql.strip():
            raise ApiError(400, "sql must be a non-empty string")
        if len(sql) > MAX_SQL_LENGTH:
            raise ApiError(400, f"sql exceeds {MAX_SQL_LENGTH} characters")
        if limit is not None:
            limit = int(limit)
            if limit < 1 or limit > MAX_LIMIT:
                raise ApiError(
                    400, f"limit must be between 1 and {MAX_LIMIT}"
                )
        try:
            self.engine.engine.validate_select_only(sql)
        except PermissionError as exc:
            raise ApiError(400, str(exc))
        except Exception as exc:  # parse failure
            raise ApiError(
                400,
                {
                    "success": False,
                    "error": str(exc)[:500],
                    "error_type": "SQL_SYNTAX_ERROR",
                    "query_metadata": self._error_metadata(sql, started),
                },
            )

        try:
            df = self.engine.query(sql, force_s3=force_s3)
            has_limit = re.search(r"\bLIMIT\b", sql, re.IGNORECASE)
            if limit and not has_limit:
                df = df.limit(limit)
            pdf = df.toPandas()
        except ApiError:
            raise
        except Exception as exc:
            message = str(exc)
            raise ApiError(
                400,
                {
                    "success": False,
                    "error": message[:500],
                    "error_type": _classify_error(message),
                    "query_metadata": self._error_metadata(sql, started),
                },
            )

        if format.lower() == "csv":
            buf = io.StringIO()
            pdf.to_csv(buf, index=False)
            data: Any = buf.getvalue()
        else:
            import json

            data = json.loads(pdf.to_json(orient="records", date_format="iso"))
        schema = {c: str(t) for c, t in zip(pdf.columns, pdf.dtypes)}
        return {
            "success": True,
            "query_metadata": {
                "query_timestamp": time.strftime(
                    "%Y-%m-%d %H:%M:%S UTC", time.gmtime()
                ),
                "data_source": "local_parquet"
                if self.engine.has_local_data()
                else "s3_parquet",
                "data_export_type": self.engine.config.export_type.value,
                "table_name": self.engine.config.table_name,
                "available_tables": self._table_suggestions(),
                "query_length": len(sql),
                "format": format,
                "limit_applied": limit,
            },
            "data": data,
            "schema": schema,
            "row_count": len(pdf),
            "execution_time_ms": round((time.time() - started) * 1000, 2),
        }

    def _error_metadata(self, sql: str, started: float) -> dict:
        return {
            "query_timestamp": time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime()),
            "table_name": self.engine.config.table_name,
            "available_tables": self._table_suggestions(),
            "query_length": len(sql),
            "execution_time_ms": round((time.time() - started) * 1000, 2),
        }

    def sql_schema(self) -> dict:
        """GET /sql/schema (sql_endpoints.py:236-285)."""
        table = self.engine.config.table_name
        try:
            schema = self.engine.schema()
            try:
                sample = self.engine.sample(3).toPandas().to_dict("records")
            except Exception:
                sample = []
            return {
                "main_table": {
                    "name": table,
                    "schema": schema,
                    "sample_data": sample,
                    "row_count_estimate": "Run: SELECT COUNT(*) FROM table_name",
                },
                "available_tables": self._table_suggestions(),
                "data_export_type": self.engine.config.export_type.value,
                "query_examples": [
                    {
                        "name": "Top Services by Cost",
                        "sql": (
                            "SELECT product_servicecode, SUM(line_item_unblended_cost)"
                            f" AS total_cost FROM {table} GROUP BY 1"
                            " ORDER BY total_cost DESC LIMIT 10"
                        ),
                    },
                    {
                        "name": "Monthly Cost Trends",
                        "sql": (
                            "SELECT billing_period, SUM(line_item_unblended_cost)"
                            f" AS monthly_cost FROM {table} GROUP BY 1 ORDER BY 1"
                        ),
                    },
                ],
            }
        except Exception as exc:
            raise ApiError(500, f"Error retrieving schema: {exc}")

    def sql_tables(self) -> dict:
        """GET /sql/tables (sql_endpoints.py:288-325)."""
        export = self.engine.config.export_type.value
        return {
            "available_tables": [
                {
                    "name": self.engine.config.table_name,
                    "type": "main_table",
                    "description": f"Main {export} cost data export",
                    "suggested_columns": [
                        "product_servicecode", "line_item_unblended_cost",
                        "billing_period", "line_item_usage_account_id",
                    ],
                },
                {
                    "name": "summary_view",
                    "type": "view",
                    "description": "Pre-aggregated cost summary data",
                    "suggested_columns": [
                        "billing_period", "unblended_cost", "amortized_cost",
                    ],
                },
                {
                    "name": "kpi_instance_all",
                    "type": "view",
                    "description": "Instance-level cost metrics and optimization opportunities",
                    "suggested_columns": [
                        "ec2_all_cost", "rds_all_cost", "compute_all_cost",
                    ],
                },
            ],
            "data_export_type": export,
            "main_table": self.engine.config.table_name,
        }

    # ------------------------------------------------------------------ #
    # KPI router (kpi_endpoints.py:25-115)                                #
    # ------------------------------------------------------------------ #
    def kpi_summary(
        self,
        billing_period: Optional[str] = None,
        payer_account_id: Optional[str] = None,
        linked_account_id: Optional[str] = None,
    ) -> dict:
        return self.engine.kpi.get_comprehensive_summary(
            billing_period=billing_period,
            payer_account_id=payer_account_id,
            linked_account_id=linked_account_id,
        )

    def kpi_health_check(self) -> dict:
        return self.engine.run_cost_health_check()

    def kpi_executive_summary(self) -> dict:
        return self.engine.generate_executive_summary()

    def kpi_dashboard_data(self) -> dict:
        return self.engine.get_dashboard_data()

    # ------------------------------------------------------------------ #
    # Spend router (spend_endpoints.py:33-113)                            #
    # ------------------------------------------------------------------ #
    def spend_invoice_summary(self, months_back: int = 12) -> dict:
        return self.engine.spend.get_invoice_summary(months_back=months_back)

    def spend_top_regions(self, limit: int = 10) -> dict:
        return self.engine.spend.get_top_regions(limit=limit)

    def spend_top_services(self, limit: int = 10) -> dict:
        return self.engine.spend.get_top_services(limit=limit)

    def spend_breakdown(self, dimensions: Optional[str] = None) -> dict:
        dims = dimensions.split(",") if dimensions else None
        return self.engine.spend.get_spend_breakdown(dimensions=dims)

    # ------------------------------------------------------------------ #
    # Optimization router (optimization_endpoints.py:28-120)              #
    # ------------------------------------------------------------------ #
    def optimization_idle_resources(self, utilization_threshold: float = 5.0) -> dict:
        return self.engine.optimization.get_idle_resources(
            utilization_threshold=utilization_threshold
        )

    def optimization_rightsizing(self) -> dict:
        return self.engine.optimization.get_rightsizing_recommendations()

    def optimization_cross_service_migration(self) -> dict:
        return self.engine.optimization.get_cross_service_migration_opportunities()

    def optimization_vpc_charges(self, min_cost: float = 100.0) -> dict:
        return self.engine.optimization.get_vpc_optimization_recommendations(
            min_cost=min_cost
        )

    # ------------------------------------------------------------------ #
    # Allocation router (allocation_endpoints.py:14-115)                  #
    # ------------------------------------------------------------------ #
    def allocation_account_hierarchy(self) -> dict:
        return self.engine.allocation.get_account_hierarchy()

    def allocation_tagging_compliance(self) -> dict:
        return self.engine.allocation.get_tagging_compliance()

    def allocation_cost_center_breakdown(self, period: Optional[str] = None) -> dict:
        return self.engine.allocation.get_cost_center_breakdown(period=period)

    def allocation_third_party_integration(self) -> dict:
        return self.engine.allocation.get_third_party_integration_status()

    # ------------------------------------------------------------------ #
    # Discounts router (discounts_endpoints.py:14-110)                    #
    # ------------------------------------------------------------------ #
    def discounts_current_agreements(self) -> dict:
        return self.engine.discounts.get_current_agreements()

    def discounts_negotiation_opportunities(self, min_spend: float = 10000.0) -> dict:
        return self.engine.discounts.get_negotiation_opportunities(min_spend=min_spend)

    def discounts_usage_forecasting(self, forecast_months: int = 12) -> dict:
        return self.engine.discounts.get_usage_forecasting(
            forecast_months=forecast_months
        )

    def discounts_commitment_planning(
        self, commitment_amount: float, term_years: int = 3
    ) -> dict:
        return self.engine.discounts.simulate_commitment_roi(
            commitment_amount=commitment_amount, term_years=term_years
        )

    # ------------------------------------------------------------------ #
    # AI router (ai_endpoints.py:14-110)                                  #
    # ------------------------------------------------------------------ #
    def ai_anomaly_detection(
        self, sensitivity: float = 2.0, lookback_days: int = 30
    ) -> dict:
        return self.engine.ai.get_anomaly_detection(
            sensitivity=sensitivity, lookback_days=lookback_days
        )

    def ai_optimization_insights(self, min_spend: float = 1000.0) -> dict:
        return self.engine.ai.get_optimization_insights(min_spend=min_spend)

    def ai_custom_analysis(self, query: str, focus: str = "cost") -> dict:
        return self.engine.ai.analyze_custom_query(query, focus=focus)

    def ai_forecasting(self, forecast_months: int = 6) -> dict:
        return self.engine.ai.get_forecasting(forecast_months=forecast_months)

    # ------------------------------------------------------------------ #
    # MCP router (mcp_endpoints.py:14-115)                                #
    # ------------------------------------------------------------------ #
    def mcp_resources(self) -> dict:
        return self.engine.mcp.get_mcp_resources()

    def mcp_tools(self) -> dict:
        return self.engine.mcp.get_mcp_tools()

    def mcp_query(self, query: str, query_type: str = "natural_language") -> dict:
        return self.engine.mcp.process_mcp_query(query, query_type=query_type)

    def mcp_stream_config(self) -> dict:
        return self.engine.mcp.get_mcp_stream_config()


#: (method, path) -> handler attribute; the FastAPI factory and tests
#: iterate this single source of truth (route census mirrors the
#: reference's 8 routers under /api/v1/finops, fastapi_app.py:85-92).
ROUTES: dict[tuple[str, str], str] = {
    ("GET", "/health"): "health",
    ("GET", "/"): "root",
    ("POST", "/api/v1/finops/sql/query"): "sql_query",
    ("GET", "/api/v1/finops/sql/schema"): "sql_schema",
    ("GET", "/api/v1/finops/sql/tables"): "sql_tables",
    ("GET", "/api/v1/finops/kpi/summary"): "kpi_summary",
    ("GET", "/api/v1/finops/kpi/health-check"): "kpi_health_check",
    ("GET", "/api/v1/finops/kpi/executive-summary"): "kpi_executive_summary",
    ("GET", "/api/v1/finops/kpi/dashboard-data"): "kpi_dashboard_data",
    ("GET", "/api/v1/finops/spend/invoice/summary"): "spend_invoice_summary",
    ("GET", "/api/v1/finops/spend/regions/top"): "spend_top_regions",
    ("GET", "/api/v1/finops/spend/services/top"): "spend_top_services",
    ("GET", "/api/v1/finops/spend/breakdown"): "spend_breakdown",
    ("GET", "/api/v1/finops/optimization/idle-resources"): "optimization_idle_resources",
    ("GET", "/api/v1/finops/optimization/rightsizing"): "optimization_rightsizing",
    ("GET", "/api/v1/finops/optimization/cross-service-migration"):
        "optimization_cross_service_migration",
    ("GET", "/api/v1/finops/optimization/vpc-charges"): "optimization_vpc_charges",
    ("GET", "/api/v1/finops/allocation/account-hierarchy"): "allocation_account_hierarchy",
    ("GET", "/api/v1/finops/allocation/tagging-compliance"): "allocation_tagging_compliance",
    ("GET", "/api/v1/finops/allocation/cost-center-breakdown"):
        "allocation_cost_center_breakdown",
    ("GET", "/api/v1/finops/allocation/third-party-integration"):
        "allocation_third_party_integration",
    ("GET", "/api/v1/finops/discounts/current-agreements"): "discounts_current_agreements",
    ("GET", "/api/v1/finops/discounts/negotiation-opportunities"):
        "discounts_negotiation_opportunities",
    ("GET", "/api/v1/finops/discounts/usage-forecasting"): "discounts_usage_forecasting",
    ("POST", "/api/v1/finops/discounts/commitment-planning"):
        "discounts_commitment_planning",
    ("GET", "/api/v1/finops/ai/anomaly-detection"): "ai_anomaly_detection",
    ("GET", "/api/v1/finops/ai/optimization-insights"): "ai_optimization_insights",
    ("POST", "/api/v1/finops/ai/custom-analysis"): "ai_custom_analysis",
    ("GET", "/api/v1/finops/ai/forecasting"): "ai_forecasting",
    ("GET", "/api/v1/finops/mcp/resources"): "mcp_resources",
    ("GET", "/api/v1/finops/mcp/tools"): "mcp_tools",
    ("POST", "/api/v1/finops/mcp/query"): "mcp_query",
    ("GET", "/api/v1/finops/mcp/stream-config"): "mcp_stream_config",
}
