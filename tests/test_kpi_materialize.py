"""KPI view materialization backends + sf_dir switching.

The checkpoint backend (local fast path) and the parquet backend (the
cluster-safe mode: survives executor loss, no block-storage pinning —
the reference's own artifact pattern, data_partitioner.py:105-142) must
serve identical rows. And switching sf_dir A -> B -> A in one session
must re-register cur_ext + rebuild the views each time, not serve the
previous dir's data from the session caches.
"""

from __future__ import annotations

import os

from de_polars_spark.inventory import QUERIES
from de_polars_spark.inventory import kpi_views as kv
from de_polars_spark.testing import compare

SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"


def _reset(spark):
    kv._KPI_VIEWS_READY.pop(spark.sparkContext.applicationId, None)
    kv._CUR_ACTIVE.pop(id(spark), None)


def test_kpi_materialize_modes_agree(spark):
    os.environ["SPARK_GRAFT_KPI_MATERIALIZE"] = "checkpoint"
    try:
        via_checkpoint = QUERIES["kpi_view_summary"](spark, SF_A).toPandas()
    finally:
        del os.environ["SPARK_GRAFT_KPI_MATERIALIZE"]
    _reset(spark)
    via_parquet = QUERIES["kpi_view_summary"](spark, SF_A).toPandas()  # default
    _reset(spark)
    problems = compare(via_parquet, via_checkpoint)
    assert not problems, "; ".join(problems)


def test_cur_ext_follows_sf_dir_switch(spark):
    _reset(spark)
    kv._ensure_cur_ext(spark, SF_A)
    n_a = spark.table("cur_ext").count()
    kv._ensure_cur_ext(spark, SF_B)
    n_b = spark.table("cur_ext").count()
    assert n_b != n_a, "cur_ext still serving the previous sf_dir"
    # switch BACK: the regression was an early-return that left cur_ext
    # registered over B and the materialized KPI views marked ready
    kv._ensure_cur_ext(spark, SF_A)
    assert spark.table("cur_ext").count() == n_a
    _reset(spark)


def test_kpi_views_rebuilt_on_sf_dir_switch(spark):
    _reset(spark)
    kv._ensure_kpi_views(spark, SF_A)
    app = spark.sparkContext.applicationId
    assert kv._KPI_VIEWS_READY.get(app) == SF_A
    # registering another dir's cur_ext must invalidate the ready marker
    # so the next KPI query rebuilds the views over the new data
    kv._ensure_cur_ext(spark, SF_B)
    assert kv._KPI_VIEWS_READY.get(app) is None
    _reset(spark)
