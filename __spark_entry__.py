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


# Round-10 head = the freshness flywheel output (tools/freshness.py)
# cut from the r01..r09 driver record: the 3 remaining r5 names
# (sequence_packing_plan, matryoshka_recall_eval,
# dedup_longest_shared_span) plus the 47 oldest r6 names
# (inventory-order tiebreak). _HEAD_BASIS_ROUND pins the record the
# head was computed from, so a CORRECTNESS_r*.json the driver writes
# AFTER this commit cannot invalidate the committed head (r8 verdict
# #1: the unpinned guard failed on every as-judged tree).
# tests/test_inventory_correctness.py asserts this tuple equals
# `python tools/freshness.py --check` at this basis.
_HEAD_BASIS_ROUND = 9
_RECERTIFY_HEAD = (
    "sequence_packing_plan",
    "matryoshka_recall_eval",
    "dedup_longest_shared_span",
    "anomaly_zscore",
    "lag_mom_yoy",
    "lag_partitioned",
    "lag_over_agg",
    "rank_event_types",
    "topk_days_per_type",
    "distinct_months",
    "scalar_functions_showcase",
    "recent_orders_interval",
    "ordered_limit_sample",
    "union_distinct_statuses",
    "json_props_extract",
    "sessionization",
    "hourly_rollup",
    "star_join_regions",
    "map_column_access",
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_components",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "text_lang_id",
    "text_quality",
    "text_token_stats",
    "text_fingerprint",
    "multimodal_resize",
    "multimodal_features",
    "multimodal_frame_sample",
    "sample_hash_bernoulli",
    "sample_stratified",
    "sample_train_split",
    "corpus_length_quantiles",
    "sample_weighted",
    "pipeline_corpus_curation",
    "dedup_pagerank",
    "benchmark_contamination",
    "finops_line_item_types",
    "finops_amortized_ladder",
    "finops_kpi_spine",
    "finops_spend_mom",
    "finops_idle_detection",
    "finops_rightsizing",
)


def _ordered(mapping: dict) -> dict:
    head = {n: mapping[n] for n in _RECERTIFY_HEAD if n in mapping}
    return head | {n: v for n, v in mapping.items() if n not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL for each query (same tables, same names)."""
    return _ordered(dict(ORACLES))
