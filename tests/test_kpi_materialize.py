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


def test_rollup_is_incrementally_maintainable(spark):
    """The rollup grain's DECIMAL(38,8) partials merge EXACTLY: computing
    the rollup per billing_period and re-aggregating the partials equals
    the full-table rollup bit-for-bit (decimal addition is associative).

    This is the 100 TB refresh story: when a new month's CUR partition
    lands, the rollup artifact is updated by aggregating ONLY the new
    month and merging — never by rescanning history."""
    from pyspark.sql import functions as F

    from de_polars_spark.testing import compare

    kv._ensure_cur_ext(spark, SF_B)
    for vname, body in kv.VIEW_CHAIN:
        sql = kv.view_sql(vname, body, "cur_ext", kv.NOW, "spark")
        spark.sql(f"CREATE OR REPLACE TEMP VIEW {vname} AS {sql}")
    full = spark.table("kpi_instance_rollup")
    keys = [
        "billing_period", "payer_account_id", "linked_account_id",
        "tags_json", "product_code", "purchase_option", "adjusted_processor",
    ]
    measure_cols = [c for c in full.columns if c not in keys]

    months = [r[0] for r in spark.table("cur_ext")
              .select("billing_period").distinct().collect()]
    assert len(months) >= 2, "need multiple months for an incremental test"

    partials = []
    for m in months:
        spark.table("cur_ext").where(
            F.col("billing_period") == m
        ).createOrReplaceTempView("cur_month")
        for vname, body in kv.VIEW_CHAIN:
            if vname in ("cur_all", "joined", "kpi_prep",
                         "kpi_instance_all", "kpi_instance_rollup",
                         "kpi_instance_mapping"):
                sql = kv.view_sql(
                    vname, body,
                    "cur_month" if vname == "cur_all" else "cur_ext",
                    kv.NOW, "spark",
                )
                spark.sql(f"CREATE OR REPLACE TEMP VIEW {vname} AS {sql}")
        partials.append(spark.table("kpi_instance_rollup").toPandas())

    import pandas as pd

    merged_src = spark.createDataFrame(
        pd.concat(partials, ignore_index=True), schema=full.schema
    )
    merged = merged_src.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in measure_cols]
    )
    # restore the full-table chain for other tests
    for vname, body in kv.VIEW_CHAIN:
        sql = kv.view_sql(vname, body, "cur_ext", kv.NOW, "spark")
        spark.sql(f"CREATE OR REPLACE TEMP VIEW {vname} AS {sql}")

    full_pdf = full.toPandas()
    merged_pdf = merged.select(*full.columns).toPandas()
    problems = compare(merged_pdf, full_pdf)
    assert not problems, "; ".join(problems)
