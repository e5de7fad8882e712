"""MCP (Model Context Protocol) integration analytics (reference
de_polars/analytics/mcp_integration.py:12-480).

Resources / tools / stream-config are protocol descriptors (static
metadata in the reference too — SURVEY §2.10: stream parity = serving the
same config). The NL query path is real: intent parsing routes to the
live analytics modules, and the answers come from Spark queries, not
canned rows. ``now`` injection keeps session ids and timestamps
deterministic under test.
"""

from __future__ import annotations

from datetime import datetime
from typing import Any

from de_polars_spark.analytics.ai import AIRecommendations
from de_polars_spark.analytics.base import AnalyticsModule
from de_polars_spark.analytics.spend import SpendAnalytics

_RESOURCES = [
    {
        "name": "cost_summary", "type": "cost_data",
        "description": "Monthly cost summary by service and region",
        "uri": "cost://summary/monthly", "mimeType": "application/json",
        "capabilities": ["read", "filter", "aggregate"],
    },
    {
        "name": "spend_trends", "type": "time_series",
        "description": "Historical spending trends over time",
        "uri": "cost://trends/historical", "mimeType": "application/json",
        "capabilities": ["read", "forecast", "analyze"],
    },
    {
        "name": "optimization_opportunities", "type": "recommendations",
        "description": "Cost optimization recommendations and insights",
        "uri": "cost://optimization/recommendations",
        "mimeType": "application/json",
        "capabilities": ["read", "prioritize", "implement"],
    },
    {
        "name": "budget_tracking", "type": "budget_data",
        "description": "Budget vs actual spending tracking",
        "uri": "cost://budget/tracking", "mimeType": "application/json",
        "capabilities": ["read", "alert", "forecast"],
    },
    {
        "name": "resource_inventory", "type": "inventory",
        "description": "AWS resource inventory with cost allocation",
        "uri": "cost://resources/inventory", "mimeType": "application/json",
        "capabilities": ["read", "filter", "tag"],
    },
]

_TOOLS = [
    {
        "name": "analyze_cost_by_service",
        "description": "Analyze costs broken down by AWS service",
        "inputSchema": {
            "type": "object",
            "properties": {
                "time_period": {"type": "string"},
                "service_filter": {"type": "array", "items": {"type": "string"}},
            },
            "required": ["time_period"],
        },
    },
    {
        "name": "calculate_potential_savings",
        "description": "Calculate potential cost savings from optimization opportunities",
        "inputSchema": {
            "type": "object",
            "properties": {
                "optimization_types": {
                    "type": "array",
                    "items": {
                        "type": "string",
                        "enum": ["rightsizing", "scheduling", "storage", "commitment"],
                    },
                },
                "confidence_threshold": {
                    "type": "number", "minimum": 0, "maximum": 100,
                },
            },
        },
    },
    {
        "name": "forecast_monthly_costs",
        "description": "Forecast costs for upcoming months",
        "inputSchema": {
            "type": "object",
            "properties": {
                "forecast_months": {"type": "integer", "minimum": 1, "maximum": 12},
                "include_seasonality": {"type": "boolean"},
                "scenario": {
                    "type": "string",
                    "enum": ["baseline", "optimistic", "pessimistic"],
                },
            },
            "required": ["forecast_months"],
        },
    },
    {
        "name": "detect_cost_anomalies",
        "description": "Detect unusual spending patterns and cost anomalies",
        "inputSchema": {
            "type": "object",
            "properties": {
                "sensitivity": {"type": "number", "minimum": 1, "maximum": 5},
                "lookback_days": {"type": "integer", "minimum": 7, "maximum": 90},
            },
        },
    },
    {
        "name": "generate_cost_report",
        "description": "Generate comprehensive cost analysis report",
        "inputSchema": {
            "type": "object",
            "properties": {
                "report_type": {
                    "type": "string",
                    "enum": [
                        "executive_summary", "detailed_breakdown",
                        "optimization_focused",
                    ],
                },
                "include_recommendations": {"type": "boolean"},
                "format": {"type": "string", "enum": ["json", "markdown", "html"]},
            },
            "required": ["report_type"],
        },
    },
]


def parse_query_intent(query: str) -> dict[str, Any]:
    """Keyword intent router (mcp_integration.py:436-480 — same
    classification ladder and entity extraction). Pure function so the
    inventory can oracle-check it against a SQL re-expression."""
    q = query.lower()
    if any(w in q for w in ("cost", "spend", "bill", "expense")):
        if any(w in q for w in ("breakdown", "by service", "per service")):
            intent = "cost_breakdown"
        elif any(w in q for w in ("trend", "over time", "monthly", "historical")):
            intent = "trend_analysis"
        else:
            intent = "cost_summary"
    elif any(w in q for w in ("optimize", "save", "reduce", "efficient")):
        intent = "optimization"
    elif any(w in q for w in ("forecast", "predict", "future", "next month")):
        intent = "forecasting"
    elif any(w in q for w in ("anomaly", "unusual", "spike", "alert")):
        intent = "anomaly_detection"
    else:
        intent = "general"
    services = [
        s.upper() for s in ("ec2", "rds", "s3", "lambda", "dynamodb") if s in q
    ]
    time_period = "last_month"
    if "week" in q:
        time_period = "last_week"
    elif "3 month" in q:
        time_period = "last_3_months"
    elif "year" in q:
        time_period = "last_year"
    return {
        "intent": intent,
        "services": services,
        "time_period": time_period,
        "confidence": 80,
        "entities": {"services": services, "time_period": time_period},
    }


class MCPIntegration(AnalyticsModule):
    """engine.mcp — protocol catalog + NL query routing."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._ai = AIRecommendations(self.engine, now=self.now)
        self._spend = SpendAnalytics(self.engine, now=self.now)

    # ------------------------------------------------------------------ #
    # catalog endpoints                                                   #
    # ------------------------------------------------------------------ #
    def get_mcp_resources(self) -> dict[str, Any]:
        """GET /mcp/resources (mcp_integration.py:23-134)."""
        return {
            "resources": _RESOURCES,
            "schemas": {
                "cost_summary": {
                    "type": "object",
                    "properties": {
                        "service": {"type": "string"},
                        "region": {"type": "string"},
                        "monthly_cost": {"type": "number"},
                        "resource_count": {"type": "integer"},
                        "cost_trend": {
                            "type": "string",
                            "enum": ["increasing", "decreasing", "stable"],
                        },
                    },
                },
                "optimization_recommendation": {
                    "type": "object",
                    "properties": {
                        "recommendation_id": {"type": "string"},
                        "type": {
                            "type": "string",
                            "enum": ["rightsizing", "scheduling", "commitment"],
                        },
                        "service": {"type": "string"},
                        "potential_savings": {"type": "number"},
                        "confidence": {"type": "number", "minimum": 0, "maximum": 100},
                        "implementation_effort": {
                            "type": "string", "enum": ["low", "medium", "high"],
                        },
                    },
                },
            },
            "capabilities": [
                {"name": "cost_analysis",
                 "description": "Analyze cost data with natural language queries",
                 "input_types": ["text/plain", "application/json"],
                 "output_types": ["application/json", "text/plain"]},
                {"name": "optimization_planning",
                 "description": "Generate cost optimization plans",
                 "input_types": ["application/json"],
                 "output_types": ["application/json"]},
                {"name": "budget_forecasting",
                 "description": "Forecast future costs and budget requirements",
                 "input_types": ["application/json"],
                 "output_types": ["application/json"]},
                {"name": "alert_generation",
                 "description": "Generate cost alerts and notifications",
                 "input_types": ["application/json"],
                 "output_types": ["application/json"]},
            ],
            "mcp_version": "0.4.0",
            "supported_protocols": ["cost_data", "recommendations", "forecasting"],
        }

    def get_mcp_tools(self) -> dict[str, Any]:
        """GET /mcp/tools (mcp_integration.py:136-296)."""
        return {
            "tools": _TOOLS,
            "descriptions": [
                {"tool": "analyze_cost_by_service",
                 "example": "Analyze EC2 and RDS costs for the last 3 months",
                 "use_case": "Understanding service-level cost distribution"},
                {"tool": "calculate_potential_savings",
                 "example": "Find all high-confidence rightsizing opportunities",
                 "use_case": "Quantifying optimization opportunities"},
                {"tool": "forecast_monthly_costs",
                 "example": "Forecast next 6 months with seasonal patterns",
                 "use_case": "Budget planning and capacity forecasting"},
            ],
            "parameters": {
                "time_period_options": [
                    "last_week", "last_month", "last_3_months",
                    "last_6_months", "last_year", "custom",
                ],
                "optimization_types": [
                    "rightsizing", "scheduling", "storage_optimization",
                    "commitment_discounts", "idle_resource_cleanup",
                ],
                "supported_services": [
                    "EC2", "RDS", "S3", "Lambda", "DynamoDB",
                    "ElastiCache", "Redshift", "OpenSearch",
                ],
            },
            "total_tools": len(_TOOLS),
        }

    # ------------------------------------------------------------------ #
    # NL query                                                            #
    # ------------------------------------------------------------------ #
    def parse_query_intent(self, query: str) -> dict[str, Any]:
        return parse_query_intent(query)

    def process_mcp_query(
        self, query: str, query_type: str = "natural_language"
    ) -> dict[str, Any]:
        """POST /mcp/query (mcp_integration.py:298-352) — routed to the
        real analytics modules, unlike the reference's canned rows."""
        try:
            parsed = self.parse_query_intent(query)
            intent = parsed["intent"]
            if intent == "optimization":
                results = self._ai.get_optimization_insights()
            elif intent == "forecasting":
                results = self._ai.get_forecasting(forecast_months=3)
            elif intent == "anomaly_detection":
                results = self._ai.get_anomaly_detection()
            elif intent in ("cost_breakdown", "cost_summary", "trend_analysis"):
                results = self._spend.get_top_services(limit=10)
            else:
                results = self._spend.get_invoice_summary()
            stamp = self.now or datetime.now().strftime("%Y%m%d_%H%M%S")
            return {
                "query": query,
                "parsed_intent": parsed,
                "query_results": results,
                "confidence": parsed["confidence"],
                "mcp_session_id": f"mcp_{stamp}",
            }
        except Exception as exc:  # mirror the reference's error envelope
            return {
                "query": query,
                "error": str(exc),
                "error_type": "processing_error",
                "suggestions": [
                    "Try asking about specific services: 'What are my EC2 costs?'",
                    "Ask for time-based analysis: 'Show me cost trends over last 3 months'",
                    "Request optimization help: 'How can I reduce my AWS costs?'",
                ],
            }

    # ------------------------------------------------------------------ #
    # stream config (SURVEY §2.10 parity item)                            #
    # ------------------------------------------------------------------ #
    def get_mcp_stream_config(self) -> dict[str, Any]:
        """GET /mcp/stream-config (mcp_integration.py:353-434)."""
        return {
            "stream_config": {
                "websocket_url": "/api/v1/finops/mcp/stream",
                "supported_events": [
                    "cost_alert", "budget_threshold", "optimization_opportunity",
                    "anomaly_detected", "forecast_update",
                ],
                "stream_modes": ["real_time", "batched", "scheduled"],
                "authentication": {
                    "required": True,
                    "methods": ["jwt", "api_key"],
                    "session_timeout": 3600,
                },
            },
            "event_schemas": {
                "cost_alert": {
                    "type": "object",
                    "properties": {
                        "alert_id": {"type": "string"},
                        "alert_type": {
                            "type": "string",
                            "enum": [
                                "budget_exceeded", "unusual_spike",
                                "threshold_reached",
                            ],
                        },
                        "service": {"type": "string"},
                        "current_cost": {"type": "number"},
                        "threshold": {"type": "number"},
                        "severity": {
                            "type": "string",
                            "enum": ["low", "medium", "high", "critical"],
                        },
                        "timestamp": {"type": "string", "format": "date-time"},
                    },
                },
                "optimization_opportunity": {
                    "type": "object",
                    "properties": {
                        "opportunity_id": {"type": "string"},
                        "type": {"type": "string"},
                        "potential_savings": {"type": "number"},
                        "confidence": {"type": "number"},
                        "action_required": {"type": "boolean"},
                    },
                },
            },
            "rate_limits": {
                "max_connections": 100,
                "events_per_minute": 1000,
                "max_event_size_kb": 64,
            },
        }
