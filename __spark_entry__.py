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


# Round-7 head (50 names = the full driver sample budget), per the r6
# verdict: every query with NO driver row in any round goes first —
# the 6 round-6 additions plus this round's 2 additions — then the
# oldest-green re-certification tail: the 42 oldest names whose newest
# green row in CORRECTNESS_r01..r06 is r3 (inventory-order tiebreak).
# The remaining 4 r3 names (unpivot_revenue_metrics,
# asof_purchase_attribution, range_join_error_burst, tfidf_top_terms)
# plus the 49 r4 names form the r8 head (53 names -> 3 spill to r9).
_RECERTIFY_HEAD = (
    # never driver-sampled (added in round 6)
    "dedup_minhash_lsh_capped",
    "multimodal_png_decode",
    "ann_recall_eval_clustered",
    "ann_pq_recall_eval_clustered",
    "ann_pq_recall_eval_neardup",
    "bitext_ivf_pair_recall_clustered",
    # never driver-sampled (added in round 7)
    "multimodal_jpeg_decode",
    "dedup_simhash_hamming_capped",
    # newest green row = r3 (42 oldest in inventory order)
    "text_repetition_stats",
    "text_pii_scrub",
    "shard_packing",
    "kmeans_embeddings",
    "text_unigram_logprob",
    "mixture_resample_sqrt",
    "dedup_semantic",
    "gopher_quality_filter",
    "token_diversity_profile",
    "quality_logreg_score",
    "embedding_pool_chunks",
    "ann_recall_eval",
    "per_source_cap",
    "ann_multiprobe_topk",
    "ann_ivf_kmeans_topk",
    "embedding_norm_profile",
    "fuzzy_part_names",
    "join_key_skew_report",
    "histogram_equidepth_price",
    "dedup_graph_stats",
    "dedup_cluster_size_histogram",
    "kpi_view_tracker",
    "pricing_efficiency_join",
    "pricing_sp_coverage",
    "pricing_cheapest_option",
    "forecast_linear_seasonal",
    "forecast_naive_next_month",
    "forecast_regression",
    "volatility_classification",
    "commitment_roi_sim",
    "nl_intent_router",
    "streaming_windowed_costs",
    "session_window_agg",
    "interval_join_attribution",
    "rollup_returnflag_status",
    "cube_orders_status_priority",
    "grouping_sets_lineitem",
    "quantile_price_profile",
    "rolling_frame_avg",
    "semi_anti_open_only_customers",
    "window_rank_suite",
    "pivot_orders_status",
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
