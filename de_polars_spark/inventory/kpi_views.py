"""Oracle-checked bindings for the full KPI view chain (views/kpi.py).

An extended deterministic lineitem→CUR mapping gives every branch of the
chain real rows: all 7 line-item types, 8 product codes, Spot/SP/RI
purchase options, Graviton/AMD/Intel instance families, EBS gp2/gp3/
snapshot usage types, DynamoDB committed/on-demand throughput, Lambda
ARM, Windows/Linux platforms, and the excluded AWSDataTransfer /
DataXfer / Repl rows (FIXTURES.md §1 value-domain requirements).

``NOW`` is pinned to 1998-10-01 so the trailing-3-month windows select
the tail of the TPC-H shipdate range deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from de_polars_spark.inventory.dialect_macros import render
from de_polars_spark.sources.registry import register_testdata
from de_polars_spark.views.kpi import VIEW_CHAIN, chained_oracle, view_sql

QUERIES: dict = {}
ORACLES: dict = {}

NOW = "DATE '1998-10-01'"

#: every column kpi_instance_all.sql / the level-1 views read, derived
#: deterministically from lineitem (same SQL text in both engines)
CUR_EXT_CTE = """
WITH base AS (
    SELECT *,
        CASE l_partkey % 8
             WHEN 0 THEN 'AmazonEC2' WHEN 1 THEN 'AmazonRDS'
             WHEN 2 THEN 'AmazonS3'  WHEN 3 THEN 'AWSLambda'
             WHEN 4 THEN 'AmazonDynamoDB' WHEN 5 THEN 'AmazonElastiCache'
             WHEN 6 THEN 'AmazonES' ELSE 'AmazonRedshift' END AS svc,
        CASE WHEN l_returnflag = 'A' AND l_discount > 0.06 THEN 'SavingsPlanCoveredUsage'
             WHEN l_returnflag = 'N' AND l_discount > 0.06 THEN 'DiscountedUsage'
             WHEN l_returnflag = 'R' AND l_linenumber % 3 = 0 THEN 'RIFee'
             WHEN l_returnflag = 'R' AND l_linenumber % 3 = 1 THEN 'SavingsPlanRecurringFee'
             WHEN l_linenumber % 7 = 0 THEN 'Fee'
             WHEN l_tax = 0 AND l_discount = 0 THEN 'Credit'
             ELSE 'Usage' END AS li_type
    FROM lineitem
),
shaped AS (
    SELECT *,
        CASE WHEN svc = 'AmazonEC2' THEN
                  CASE l_partkey % 5 WHEN 0 THEN 'm5.xlarge' WHEN 1 THEN 'm6g.large'
                       WHEN 2 THEN 'm5a.large' WHEN 3 THEN 'r5.xlarge'
                       ELSE 'm4.large' END
             WHEN svc = 'AmazonRDS' THEN
                  CASE l_partkey % 3 WHEN 0 THEN 'db.r5.large'
                       WHEN 1 THEN 'db.r6g.large' ELSE 'db.m5.xlarge' END
             WHEN svc = 'AmazonElastiCache' THEN
                  CASE l_partkey % 2 WHEN 0 THEN 'cache.r6g.large'
                       ELSE 'cache.r5.large' END
             WHEN svc = 'AmazonES' THEN
                  CASE l_partkey % 2 WHEN 0 THEN 'r6g.large' ELSE 'm5.large' END
             WHEN svc = 'AmazonRedshift' THEN 'dc2.large'
             ELSE '' END AS itype,
        (svc = 'AmazonEC2' AND l_orderkey % 13 = 0) AS is_ebs
    FROM base
),
cur AS (
    SELECT
        MONTH_STR(l_shipdate) AS billing_period,
        CAST(date_trunc('month', l_shipdate) AS TIMESTAMP)
            AS bill_billing_period_start_date,
        CAST(l_shipdate AS TIMESTAMP) AS line_item_usage_start_date,
        concat('payer_', TO_STR(l_suppkey % 2)) AS bill_payer_account_id,
        concat('acct_', TO_STR(l_suppkey % 7)) AS line_item_usage_account_id,
        CASE WHEN l_orderkey % 97 = 0 THEN ''
             ELSE concat('res-', TO_STR(l_orderkey % 500)) END AS line_item_resource_id,
        li_type AS line_item_line_item_type,
        svc AS line_item_product_code,
        CASE WHEN l_partkey % 31 = 0 THEN 'AWSDataTransfer' ELSE svc END
            AS product_servicecode,
        CASE WHEN svc = 'AmazonEC2' AND NOT is_ebs THEN 'RunInstances'
             WHEN svc = 'AmazonEC2' THEN 'CreateVolume'
             WHEN svc = 'AmazonDynamoDB' THEN
                  CASE l_orderkey % 2 WHEN 0 THEN 'CommittedThroughput'
                       ELSE 'PayPerRequestThroughput' END
             ELSE '' END AS line_item_operation,
        CASE WHEN is_ebs THEN
                  CASE l_linenumber % 3 WHEN 0 THEN 'EBS:VolumeUsage.gp2'
                       WHEN 1 THEN 'EBS:VolumeUsage.gp3' ELSE 'EBS:SnapshotUsage' END
             WHEN svc = 'AmazonEC2' AND l_suppkey % 5 = 0
                  THEN concat('SpotUsage:', itype)
             WHEN svc = 'AmazonEC2' THEN concat('BoxUsage:', itype)
             WHEN svc = 'AmazonRDS' AND l_partkey % 29 = 0 THEN 'USE1-DataXfer-Out'
             WHEN svc = 'AmazonRDS' THEN concat('InstanceUsage:', itype)
             WHEN svc = 'AmazonS3' THEN
                  CASE l_linenumber % 2 WHEN 0 THEN 'TimedStorage-ByteHrs'
                       ELSE 'Requests-Tier1' END
             WHEN svc = 'AWSLambda' THEN
                  CASE l_linenumber % 3 WHEN 0 THEN 'Lambda-GB-Second'
                       WHEN 1 THEN 'Lambda-Provisioned-GB-Second'
                       ELSE 'ARM-Lambda-GB-Second' END
             WHEN svc = 'AmazonDynamoDB' THEN
                  CASE l_linenumber % 3 WHEN 0 THEN 'ReadCapacityUnit-Hrs'
                       WHEN 1 THEN 'WriteCapacityUnit-Hrs'
                       ELSE 'Repl-ReadCapacityUnit-Hrs' END
             WHEN svc = 'AmazonElastiCache' THEN concat('NodeUsage:', itype)
             ELSE concat('InstanceUsage:', itype) END AS line_item_usage_type,
        CASE WHEN l_orderkey % 17 = 0 THEN '' ELSE itype END AS product_instance_type,
        CASE l_suppkey % 3 WHEN 0 THEN 'us-east-1' WHEN 1 THEN 'us-west-2'
             ELSE 'eu-west-1' END AS product_region,
        CASE WHEN svc = 'AmazonEC2' AND l_orderkey % 11 = 0 THEN 'Windows'
             WHEN svc = 'AmazonEC2' THEN 'Linux' ELSE '' END
            AS product_operating_system,
        CASE WHEN itype LIKE '%6g%' THEN 'AWS Graviton2'
             WHEN itype LIKE '%5a%' THEN 'AMD EPYC 7571'
             WHEN itype <> '' THEN 'Intel Xeon Platinum 8175'
             ELSE '' END AS product_physical_processor,
        CASE WHEN svc = 'AmazonRDS' THEN
                  CASE l_linenumber % 5 WHEN 0 THEN 'PostgreSQL' WHEN 1 THEN 'MySQL'
                       WHEN 2 THEN 'Oracle' WHEN 3 THEN 'SQL Server'
                       ELSE 'Aurora MySQL' END
             ELSE '' END AS product_database_engine,
        CASE WHEN svc = 'AmazonRDS' THEN
                  CASE l_orderkey % 3 WHEN 0 THEN 'License included'
                       WHEN 1 THEN 'No license required'
                       ELSE 'Bring your own license' END
             ELSE '' END AS product_license_model,
        CASE WHEN svc = 'AmazonElastiCache' THEN 'Redis' ELSE '' END
            AS product_cache_engine,
        CASE WHEN svc = 'AmazonRDS' THEN
                  CASE l_orderkey % 2 WHEN 0 THEN 'Multi-AZ' ELSE 'Single-AZ' END
             ELSE '' END AS product_deployment_option,
        CASE WHEN svc = 'AmazonEC2' THEN 'Shared' ELSE '' END AS product_tenancy,
        CASE WHEN li_type LIKE 'SavingsPlan%'
             THEN concat('arn:sp/', TO_STR(l_suppkey % 5)) ELSE '' END
            AS savings_plan_savings_plan_a_r_n,
        CASE WHEN li_type LIKE 'SavingsPlan%' THEN
                  CASE l_suppkey % 2 WHEN 0 THEN 'ComputeSavingsPlans'
                       ELSE 'EC2InstanceSavingsPlans' END
             ELSE '' END AS savings_plan_offering_type,
        CASE WHEN li_type IN ('DiscountedUsage', 'RIFee')
             THEN concat('arn:ri/', TO_STR(l_suppkey % 5)) ELSE '' END
            AS reservation_reservation_a_r_n,
        CASE l_orderkey % 4
             WHEN 0 THEN ''
             WHEN 1 THEN '{"Environment":"prod"}'
             WHEN 2 THEN '{"Environment":"dev","Team":"data"}'
             ELSE '{"Project":"alpha"}' END AS resource_tags,
        l_quantity AS line_item_usage_amount,
        l_extendedprice * (1 - l_discount) AS line_item_unblended_cost,
        l_extendedprice AS pricing_public_on_demand_cost,
        l_extendedprice * (1 - l_discount) * 0.9
            AS savings_plan_savings_plan_effective_cost,
        l_extendedprice * 0.8 AS savings_plan_total_commitment_to_date,
        l_extendedprice * 0.7 AS savings_plan_used_commitment,
        l_extendedprice * (1 - l_discount) * 0.95 AS reservation_effective_cost,
        l_extendedprice * l_tax * 0.3
            AS reservation_unused_amortized_upfront_fee_for_billing_period,
        l_extendedprice * l_tax * 0.2 AS reservation_unused_recurring_fee
    FROM shaped
)
"""


#: On the Spark side the synthetic CUR is materialized ONCE per sf_dir as
#: a snappy-parquet table instead of being embedded as a CTE in every
#: query: the ~20-CASE synthesis projection otherwise fuses into each
#: view's aggregate stage (re-derived 5x per kpi_tracker run — once per
#: sub-aggregate) and pushed the generated hashAgg_doAggregateWithKeys
#: method past the JVM 64 KB limit (interpreted fallback; a cached temp
#: view did not survive the chained-CTE plan's cache lookup). The DuckDB
#: oracle keeps the full CTE — results are identical, and this mirrors
#: production, where CUR is a parquet table at rest, not a per-query
#: expression. The synthesis is deterministic, so the artifact is safe to
#: reuse across sessions.
#: id(spark) -> (sf_dir currently registered as ``cur_ext``, parquet path).
#: Keyed by the ACTIVE sf_dir, not an accumulating set: switching sf_dir
#: A -> B -> A in one session must re-register the temp view each time,
#: or cur_ext keeps serving the previous dir's data (registry.py handles
#: the base tables' switch-back; this cache must too).
_CUR_ACTIVE: dict[int, tuple[str, str]] = {}


def _ensure_cur_ext(spark: SparkSession, sf_dir: str) -> str:
    """Materialize + register the synthetic CUR; returns the parquet path."""
    active = _CUR_ACTIVE.get(id(spark))
    if active is not None and active[0] == sf_dir:
        return active[1]
    import hashlib
    import os

    register_testdata(spark, sf_dir)
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".cache")
    # content-addressed so editing the synthesis CTE invalidates the
    # artifact; "|layout=par" versions the FILE LAYOUT — the original
    # single-file write made every downstream view's 600k-row projection
    # run on ONE core (40 MB file < maxPartitionBytes = one scan task),
    # which WAS the KPI wave's critical path (cur_all stage 6.2s -> ~1s
    # after parallelizing the layout; r5 wave shave)
    tag = hashlib.md5((CUR_EXT_CTE + "|layout=par").encode()).hexdigest()[:8]
    path = os.path.join(
        cache_dir,
        f"cur_ext_{os.path.basename(os.path.normpath(sf_dir))}_{tag}.parquet",
    )
    if not os.path.exists(path):
        df = spark.sql(render(CUR_EXT_CTE, "spark") + "\nSELECT * FROM cur")
        # one file per core: downstream scans parallelize across the
        # session's full width instead of being a single-task stage.
        # Row order inside the artifact is irrelevant to every consumer
        # (all aggregates are decimal/order-free — the repo's
        # determinism contract), so the round-robin shuffle is safe.
        df.repartition(spark.sparkContext.defaultParallelism).write.mode(
            "overwrite"
        ).parquet(path)
    spark.read.parquet(path).createOrReplaceTempView("cur_ext")
    if active is not None:
        # sf_dir switched: the materialized KPI views were built over the
        # previous cur_ext and would serve stale data — force a rebuild
        _KPI_VIEWS_READY.pop(spark.sparkContext.applicationId, None)
    _CUR_ACTIVE[id(spark)] = (sf_dir, path)
    return path


_SPARK_CUR_PREFIX = "WITH cur AS (SELECT * FROM cur_ext)"

#: level-1/2 views materialized once per session (parquet artifacts by
#: default — see _kpi_materialize_mode): every final KPI query used to
#: re-embed the WHOLE chain as CTEs, so kpi_tracker re-derived the
#: kpi_instance_all CASE ladder from raw CUR on every run (and paid
#: driver-side analysis of ~700 lines of unused CTE text besides). A
#: layered view system materializes each layer once and serves the
#: finals from it — same rows (the downstream aggs are order-independent
#: decimal sums), and the materialization cost lands in the first KPI
#: query of the session, not in an unbenched warm-up.
_MATERIALIZED_VIEWS = (
    "summary_view",
    "kpi_ebs_storage_all",
    "kpi_ebs_snap",
    "kpi_s3_storage_all",
    # the instance layer is pinned at ROLLUP grain (views/kpi.py
    # KPI_INSTANCE_ROLLUP_BODY): every aggregate consumer (the tracker's
    # instance sub-query, kpi_view_instance_all) reads the small decimal-
    # partial cube instead of the 26-key detail, whose ~205k rows x ~70
    # columns (sf0.1) dominated both the artifact write and the tracker's
    # sub-aggregation. The detail view kpi_instance_all stays registered
    # (virtual) for ad-hoc API queries.
    "kpi_instance_rollup",
)
#: applicationId -> sf_dir whose views are CURRENTLY materialized (a dict,
#: not an accumulating set, so an sf_dir switch-back forces a rebuild)
_KPI_VIEWS_READY: dict[str, str] = {}


def _kpi_materialize_mode() -> str:
    """'parquet' (default) or 'checkpoint'.

    Parquet is the default on BOTH axes:

    - **Scale**: ``localCheckpoint`` pins blocks in executor storage and
      TRUNCATES lineage — on a real cluster with executor loss or
      dynamic allocation the blocks vanish unrecoverably, and a
      100 TB-derived view won't fit block storage. Parquet artifacts
      (the reference's own pattern: data_partitioner.py:105-142)
      survive executor loss and scale past cluster memory.
    - **Speed**: checkpoint scans deserialize full InternalRows — no
      column pruning, no vectorization. The tracker's five sub-
      aggregates each read a handful of the ~70 decimal columns, so
      over parquet they scan column-pruned vectorized batches: measured
      at sf0.1, tracker materialization 4.5s over parquet artifacts vs
      21-41s over localCheckpoints (and a COUNT over the checkpointed
      kpi_instance_all alone took 6s).

    Set SPARK_GRAFT_KPI_MATERIALIZE=checkpoint to keep everything in
    block storage (e.g. a read-only filesystem); both modes serve
    identical rows (tests/test_kpi_materialize.py).
    """
    import os

    return os.environ.get("SPARK_GRAFT_KPI_MATERIALIZE", "parquet")


def _kpi_artifact_dir(sf_dir: str) -> str:
    import hashlib
    import os

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".cache")
    # content-addressed over the whole chain: editing any view SQL (or the
    # CUR synthesis) invalidates the artifacts
    chain_text = CUR_EXT_CTE + NOW + "".join(
        view_sql(v, b, "cur_ext", NOW, "spark") for v, b in VIEW_CHAIN
    )
    tag = hashlib.md5(chain_text.encode()).hexdigest()[:8]
    return os.path.join(
        cache_dir,
        f"kpi_views_{os.path.basename(os.path.normpath(sf_dir))}_{tag}",
    )


def clear_kpi_artifacts(sf_dir: str) -> None:
    """Delete the parquet view artifacts for ``sf_dir``.

    bench.py calls this in its (untimed) warm-up so the materialization
    wave is paid — and measured — inside the benchmark run instead of
    being inherited from a previous session's artifacts."""
    import shutil

    shutil.rmtree(_kpi_artifact_dir(sf_dir), ignore_errors=True)


def _ensure_kpi_views(spark: SparkSession, sf_dir: str) -> None:
    _ensure_cur_ext(spark, sf_dir)
    app = spark.sparkContext.applicationId
    if _KPI_VIEWS_READY.get(app) == sf_dir:
        return
    # phase-1 registration: every view the MATERIALIZATION wave reads.
    # A view whose body directly references a to-be-materialized name
    # (only kpi_tracker in this chain) is deferred to the post-wave
    # re-registration — creating it here would be parsed twice for
    # nothing (~0.3s of driver analysis on the largest SQL in the repo)
    for vname, body in VIEW_CHAIN:
        if vname not in _MATERIALIZED_VIEWS and any(
            mv in body for mv in _MATERIALIZED_VIEWS
        ):
            continue
        sql = view_sql(vname, body, "cur_ext", NOW, "spark")
        spark.sql(f"CREATE OR REPLACE TEMP VIEW {vname} AS {sql}")

    import os

    parquet_mode = _kpi_materialize_mode() == "parquet"
    art_dir = _kpi_artifact_dir(sf_dir) if parquet_mode else None

    def _pin(vname: str):
        """Materialize one view via the configured backend."""
        if parquet_mode:
            path = os.path.join(art_dir, vname)
            if not os.path.exists(path):
                # write-then-rename so a concurrent session never reads a
                # half-committed directory (artifacts are content-addressed,
                # so any completed write is interchangeable)
                tmp = f"{path}.tmp-{os.getpid()}"
                spark.table(vname).write.mode("overwrite").parquet(tmp)
                try:
                    os.rename(tmp, path)
                except OSError:  # another session won the race
                    import shutil

                    shutil.rmtree(tmp, ignore_errors=True)
            return vname, spark.read.parquet(path)
        return vname, spark.table(vname).localCheckpoint(eager=True)

    # the five level-1/2 views are mutually independent (each reads only
    # cur_ext + virtual upstreams) — submit their jobs concurrently so
    # the cheap scans overlap the instance_all ladder instead of queuing
    # behind it. The two-barrier shape (all five, then the tracker) IS
    # the dependency graph: the tracker's five sub-aggregates read
    # summary_view (spend), kpi_instance_rollup, and the three storage
    # views — every wave-1 artifact — so per-dependency future chaining
    # cannot start it earlier. Measured critical path at sf0.1: the
    # rollup chain (~9s, dominated by cur_all's 206k-row 30-column
    # projection write, not the 26-key groupBy, which adds ~0.3s) then
    # the 1.3s tracker join over artifacts.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(len(_MATERIALIZED_VIEWS)) as ex:
        for vname, df in ex.map(_pin, _MATERIALIZED_VIEWS):
            df.createOrReplaceTempView(vname)
    # temp views capture their dependencies' plans at CREATE time, so
    # (re-)create the virtual views that TRANSITIVELY reference a
    # materialized name, now that those inputs resolve to the pinned
    # frames instead of the original full-recompute definitions. Views
    # with no materialized dependency keep their phase-1 registration —
    # re-parsing them here cost ~1s of driver analysis per session for
    # identical plans (r5 wave shave).
    affected = set(_MATERIALIZED_VIEWS)
    for vname, body in VIEW_CHAIN:
        if vname in _MATERIALIZED_VIEWS:
            continue
        if any(a in body for a in affected):
            sql = view_sql(vname, body, "cur_ext", NOW, "spark")
            spark.sql(f"CREATE OR REPLACE TEMP VIEW {vname} AS {sql}")
            affected.add(vname)
    # second wave: the final tracker view — its ~100-column savings
    # projection is the single biggest codegen unit in the repo, so pin
    # it down once here (over the wave-1 artifacts) instead of paying
    # a high-variance recompile per consumer; this also mirrors the
    # reference, where kpi_tracker is a materialized query artifact
    # (data_partitioner.py:105-142 writes view results to parquet)
    _, tracker = _pin("kpi_tracker")
    tracker.createOrReplaceTempView("kpi_tracker")
    _KPI_VIEWS_READY[app] = sf_dir


def _bind(name: str, final_select: str) -> None:
    spark_sql = render(final_select, "spark")
    oracle_sql = render(chained_oracle(final_select, CUR_EXT_CTE, NOW), "duckdb")

    def fn(spark: SparkSession, sf_dir: str, _sql: str = spark_sql) -> DataFrame:
        _ensure_kpi_views(spark, sf_dir)
        return spark.sql(_sql)

    fn.__name__ = f"q_{name}"
    QUERIES[name] = fn
    ORACLES[name] = oracle_sql


_bind("kpi_view_summary", "SELECT * FROM summary_view")
_bind(
    "kpi_view_instance_all",
    """
    SELECT billing_period, payer_account_id, linked_account_id, product_code,
           purchase_option, adjusted_processor,
           CAST(SUM(CAST(amortized_cost AS DECIMAL(38,8))) AS DOUBLE) AS amortized_cost,
           CAST(SUM(CAST(adjusted_amortized_cost AS DECIMAL(38,8))) AS DOUBLE)
               AS adjusted_amortized_cost,
           CAST(SUM(CAST(ec2_all_cost AS DECIMAL(38,8))) AS DOUBLE) AS ec2_all_cost,
           CAST(SUM(CAST(ec2_spot_cost AS DECIMAL(38,8))) AS DOUBLE) AS ec2_spot_cost,
           CAST(SUM(CAST(ec2_graviton_cost AS DECIMAL(38,8))) AS DOUBLE) AS ec2_graviton_cost,
           CAST(SUM(CAST(ec2_graviton_potential_savings AS DECIMAL(38,8))) AS DOUBLE)
               AS ec2_graviton_potential_savings,
           CAST(SUM(CAST(rds_all_cost AS DECIMAL(38,8))) AS DOUBLE) AS rds_all_cost,
           CAST(SUM(CAST(rds_graviton_eligible_cost AS DECIMAL(38,8))) AS DOUBLE)
               AS rds_graviton_eligible_cost,
           CAST(SUM(CAST(lambda_graviton_cost AS DECIMAL(38,8))) AS DOUBLE)
               AS lambda_graviton_cost,
           CAST(SUM(CAST(dynamodb_committed_cost AS DECIMAL(38,8))) AS DOUBLE)
               AS dynamodb_committed_cost
    FROM kpi_instance_rollup
    GROUP BY 1, 2, 3, 4, 5, 6
    """,
)
_bind("kpi_view_tracker", "SELECT * FROM kpi_tracker")
