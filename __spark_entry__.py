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


# Round-9 head = the freshness flywheel output (tools/freshness.py) cut
# from the r01..r08 driver record: the 3 remaining r4 names
# (fk_integrity_report, negative_pair_sample, freshness_lag_report) plus
# the 47 oldest r5 names (inventory-order tiebreak). _HEAD_BASIS_ROUND
# pins the record the head was computed from, so a CORRECTNESS_r*.json
# the driver writes AFTER this commit cannot invalidate the committed
# head (r8 verdict #1: the unpinned guard failed on every as-judged
# tree). tests/test_inventory_correctness.py asserts this tuple equals
# `python tools/freshness.py --check` at this basis.
_HEAD_BASIS_ROUND = 8
_RECERTIFY_HEAD = (
    "fk_integrity_report",
    "negative_pair_sample",
    "freshness_lag_report",
    "pricing_summary",
    "top_brands_by_revenue",
    "conditional_cost_ladder",
    "priority_bucketing",
    "predicate_gauntlet",
    "count_distinct_profile",
    "having_active_suppliers",
    "multi_level_agg",
    "spine_left_join",
    "mom_self_join",
    "pct_of_total",
    "multimodal_image_decode",
    "multimodal_pixel_stats",
    "multimodal_audio_decode",
    "multimodal_video_frames",
    "multimodal_resize_real",
    "multimodal_features_real",
    "ann_ivf_index_compact",
    "dsir_importance_select",
    "bpe_phrase_merges",
    "token_entropy_by_source",
    "psi_drift_report",
    "cluster_aware_split",
    "mixture_token_budget_plan",
    "jsonl_source_roundtrip",
    "streaming_late_arrival_audit",
    "inverted_index",
    "user_overlap_theta_sketch",
    "cross_source_overlap_matrix",
    "quality_prune_plan",
    "zipf_token_slope",
    "embedding_centroid_shift",
    "k_anonymity_report",
    "qi_uniqueness_ladder",
    "dedup_containment",
    "hard_negative_mining",
    "hard_negative_mining_ivf",
    "embedding_int8_quant",
    "embedding_centroid_silhouette",
    "tokenizer_fertility",
    "curriculum_phase_plan",
    "timeseries_gapfill",
    "consistent_subset_sample",
    "retrieval_mrr_ndcg",
    "bitext_margin_mining",
    "bitext_margin_mining_ivf",
    "entity_resolution",
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
