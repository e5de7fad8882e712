"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the SURVEY.md §2 operator
inventory for the driver's DuckDB-oracle correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from de_polars_spark.inventory import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


# Round-8 head = the freshness flywheel output (tools/freshness.py):
# no never-sampled names remain, so the head is the 50 oldest-green
# re-certification names — the 4 whose newest green driver row is r3
# plus the 46 oldest r4 names (inventory-order tiebreak). The 3
# remaining r4 names (fk_integrity_report, negative_pair_sample,
# freshness_lag_report) spill to the r9 head. tests/test_entry.py
# asserts this tuple equals `python tools/freshness.py --check`.
_RECERTIFY_HEAD = (
    "unpivot_revenue_metrics",
    "asof_purchase_attribution",
    "range_join_error_burst",
    "tfidf_top_terms",
    "neardup_admission",
    "dedup_simhash_hamming",
    "sample_weighted_per_source",
    "dedup_keep_best",
    "chunk_documents",
    "embedding_truncate_norm",
    "chunk_boilerplate",
    "vocab_coverage",
    "text_normalize",
    "quality_by_source",
    "dedup_minhash_estimate",
    "ngram_dup_profile",
    "split_leakage_check",
    "pii_density_by_source",
    "ann_ivf_index_build",
    "ann_ivf_index_query",
    "ann_ivf_index_append",
    "ann_pq_topk",
    "ann_pq_recall_eval",
    "ann_ivfpq_topk",
    "finops_tag_compliance",
    "bm25_search",
    "approx_distinct_hll",
    "heavy_hitters_cms",
    "histogram_price",
    "corr_qty_price",
    "merge_upsert_snapshot",
    "skew_salted_agg",
    "data_quality_report",
    "column_stats_profile",
    "incremental_agg_maintenance",
    "snapshot_diff",
    "funnel_view_click_purchase",
    "topk_with_ties",
    "median_abs_deviation",
    "histogram_median_mergeable",
    "dedup_incremental_batch",
    "cohort_retention",
    "rfm_segmentation",
    "basket_copurchase_lift",
    "ship_latency_profile",
    "bloom_join_prefilter",
    "scd2_history",
    "bucketed_colocated_join",
    "zorder_clustering_stats",
    "table_fingerprint",
)
_NEVER_SAMPLED = _RECERTIFY_HEAD


def _ordered(mapping: dict) -> dict:
    head = {n: mapping[n] for n in _NEVER_SAMPLED if n in mapping}
    return head | {n: v for n, v in mapping.items() if n not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL for each query (same tables, same names)."""
    return _ordered(dict(ORACLES))
