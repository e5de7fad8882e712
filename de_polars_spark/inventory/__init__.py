"""Operator inventory — the driver-checked query surface.

Each entry couples a Spark implementation (DataFrame API or Spark SQL)
with a DuckDB oracle SQL string over the same testdata views
(TESTDATA.md tables). Keys are stable names consumed by
``__spark_entry__.queries()`` / ``oracle_sql()``.

Determinism rules (FIXTURES.md "Determinism notes"):
- float SUMs go through ``CAST(x AS DECIMAL(38,6))`` so partial-agg order
  cannot change the result; final values cast back to DOUBLE;
- AVG/STDDEV are derived from exact decimal sums with the final division
  in double (identical inputs → identical IEEE results in both engines);
- month keys are formatted strings (``yyyy-MM``) — DuckDB's date_trunc
  returns DATE while Spark's returns TIMESTAMP;
- every top-k has a total-order tiebreak.
"""

from __future__ import annotations


def _load() -> tuple[dict, dict]:
    # deferred so that importing a submodule (e.g. views/kpi.py pulling in
    # inventory.dialect_macros) does not recursively import the whole query
    # inventory — kpi_views imports views.kpi, which would be circular.
    from de_polars_spark.inventory import (
        core_sql,
        corpus_ops,
        driver_math,
        finops,
        kpi_views,
        llm_ops,
        pricing,
        recall_clustered,
        relational_ext,
        scale_ops,
        streaming_ops,
        training_ops,
    )

    queries: dict = {}
    oracles: dict = {}
    for mod in (core_sql, llm_ops, finops, kpi_views, pricing, driver_math,
                streaming_ops, relational_ext, scale_ops, corpus_ops,
                training_ops, recall_clustered):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles


def __getattr__(name: str):
    # QUERIES: name -> callable(spark, sf_dir) -> DataFrame
    # ORACLES: name -> DuckDB oracle SQL (absent => driver rows-only check)
    if name in ("QUERIES", "ORACLES"):
        globals()["QUERIES"], globals()["ORACLES"] = _load()
        return globals()[name]
    raise AttributeError(name)
