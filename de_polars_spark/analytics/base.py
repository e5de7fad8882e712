"""Shared base for the 7 analytics modules.

The reference modules (de_polars/analytics/*) compose DuckDB SQL strings
around ``CURRENT_DATE`` and iterate Polars rows into JSON envelopes. The
Spark rebuild keeps the same method surface and envelopes but:

- every module takes an optional ``now`` ("YYYY-MM-DD") so the
  CURRENT_DATE-relative windows are deterministic under test
  (SURVEY.md §7 hard-part 4 — the reference is untestable on fixed
  fixtures because 'now' is baked into the SQL);
- SQL runs through ``SparkEngine.query`` (dialect shim included), stays a
  DataFrame until the envelope edge;
- filters are substituted as validated parameters, never raw string
  splicing of user input (reference spliced: kpi_summary.py:290-320).
"""

from __future__ import annotations

import re
from typing import Any, Optional

from pyspark.sql import DataFrame

from de_polars_spark.engine.core import SparkEngine

_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")


class AnalyticsModule:
    def __init__(self, engine: SparkEngine, now: Optional[str] = None):
        if now is not None and not _DATE_RE.match(now):
            raise ValueError(f"now={now!r} must be 'YYYY-MM-DD'")
        self.engine = engine
        self.now = now
        self.table = (
            engine.config.table_name if engine.config is not None else "CUR"
        )

    @property
    def now_expr(self) -> str:
        """SQL expression for 'today' — a literal under test, else real."""
        return f"DATE '{self.now}'" if self.now else "CURRENT_DATE"

    def _sql(self, template: str, **params: Any) -> DataFrame:
        return self.engine.query(
            template.format(table=self.table, now=self.now_expr, **params)
        )

    @staticmethod
    def _rows(df: DataFrame) -> list[dict]:
        """Collect a SMALL aggregated result to dicts (the API edge)."""
        return [r.asDict(recursive=True) for r in df.collect()]
