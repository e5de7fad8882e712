"""FastAPI FinOps server module — uvicorn entry point.

Mirrors the reference's ``main.py`` (``/root/reference/main.py``): expose
an ``app`` built from environment variables, falling back to a local-path
configuration so the server starts out of the box.

Usage::

    uvicorn main:app --host 0.0.0.0 --port 8000        # production
    python start_api.py                                 # guided start
"""

from __future__ import annotations

import os

from de_polars_spark.api.fastapi_app import (
    create_finops_app,
    create_finops_app_from_env,
)

try:
    app = create_finops_app_from_env()
except Exception:
    # no FINOPS_* env set — serve the bundled sample data so /health and
    # the analytics routes work immediately (reference main.py:28-41
    # falls back to a default config the same way)
    app = create_finops_app(
        local_data_path=os.getenv(
            "FINOPS_LOCAL_PATH", "/root/testdata/sf0.001"
        ),
        data_export_type=os.getenv("FINOPS_DATA_TYPE", "GENERIC"),
    )
