"""REST serving layer (reference de_polars/api/).

``handlers`` is the framework-free core: every endpoint is a plain
callable returning ``(status_code, payload)``, testable without any web
framework. ``fastapi_app`` wires the same handlers into FastAPI when the
optional dependency is installed (it is not part of this environment's
baseline, exactly as uvicorn/fastapi are optional extras in the
reference's requirements).
"""

from de_polars_spark.api.handlers import ApiError, FinOpsHandlers, ROUTES

try:  # optional dependency
    from de_polars_spark.api.fastapi_app import create_finops_app
except ImportError:  # pragma: no cover - fastapi not installed here
    create_finops_app = None  # type: ignore[assignment]

__all__ = ["FinOpsHandlers", "ApiError", "ROUTES", "create_finops_app"]
