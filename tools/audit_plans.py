"""Physical-plan audit: the scale-design evidence behind every query.

For each ``queries()`` entry, render the formatted plan and extract the
facts that matter at 100 TB:

- scan width (ReadSchema column count) and pushed filters — is column
  pruning / predicate pushdown reaching the parquet scan?
- join strategies (broadcast vs sort-merge vs nested-loop/cartesian)
- shuffle count (Exchange nodes)
- whole-stage-codegen coverage (interpreted spans are a scale cliff)

Writes PLANS.md (markdown table + flag list). Run after plan-affecting
changes: ``python tools/audit_plans.py``.

Flags raised:
- ``cartesian``/``bnl-join`` on anything not whitelisted as an
  intentional scalar cross join
- a scan reading >30 columns (projection pruning failure)
- zero WholeStageCodegen spans (fully interpreted plan)
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

#: queries whose scalar / tiny-literal cross join is the intended plan
#: (single-row totals or a VALUES list of forecast horizons)
CROSS_JOIN_OK = {
    "pct_of_total",
    "finops_negotiation_tiers",
    "forecast_linear_seasonal",
    # brute-force exact ANN baseline: broadcast query set x full corpus
    # scan IS the algorithm (a BroadcastNestedLoopJoin on a non-equi
    # predicate); the scale paths are ann_lsh_topk / ann_ivf_topk
    "ann_cosine_topk",
    # corpus-scalar broadcasts (1-row N/avgdl aggregates crossJoined into
    # the scored relation) — BuildRight on a single row, scale-safe
    "tfidf_top_terms",
    "bm25_search",
    # k-means assignment: every vector scores against all k centroids by
    # construction — broadcast of the k-row centroid frame, scale-safe
    "kmeans_embeddings",
    # two 1-row scalar broadcasts (corpus token total + vocab size)
    # crossJoined into the <=max(K)-row top-k frame — scale-safe
    "vocab_coverage",
    # 1-row distinct-order-count scalar crossJoined into the pair-support
    # frame for the lift denominator — scale-safe
    "basket_copurchase_lift",
    # 1-row corpus scalars (total token count, vocab size) crossJoined
    # into the scored relation — BuildRight on a single row, scale-safe
    "text_unigram_logprob",
    # k-means-style assignment: 1-row broadcast of the k x dim centroid
    # array crossJoined into the map-side argmin (operators/kmeans.py
    # _with_assignment); the pair join itself is a cid SortMergeJoin
    "dedup_semantic",
    # 1-row broadcast of the model weight vector crossJoined into the
    # per-doc scoring projection — data, not recompiled literals
    "quality_logreg_score",
    # composes the intentional brute-force baseline (ann_cosine_topk's
    # BroadcastNestedLoopJoin) with the IVF path to measure its recall
    "ann_recall_eval",
    # k-means fit feeding the IVF index: same centroid-broadcast shape
    # as kmeans_embeddings (1-row k x dim array crossJoin, scale-safe)
    "ann_ivf_kmeans_topk",
    # final assembly of three 1-row aggregates (node stats x edge count
    # x triangle count) — scalar cross joins, scale-safe
    "dedup_graph_stats",
    # 1-row min/max bounds (key + z-value ranges) crossJoined into the
    # map-only bucket assignment — scalar broadcast, scale-safe
    "zorder_clustering_stats",
    # 1-row global-max-timestamp scalar crossJoined into the per-stream
    # lag projection (pct_of_total pattern)
    "freshness_lag_report",
    # PQ: the m x ksub x dsub codebook rides in as ONE broadcast row
    # (operators/pq.py _codebook_row — data, not recompiled literals),
    # and un-pruned ADC is by design a full-corpus scoring pass (the
    # compressed analogue of ann_cosine_topk's brute baseline: that is
    # what PQ without an IVF in front IS)
    "ann_pq_topk",
    # recall eval composes BOTH intentional BNL shapes: the exact
    # brute-force baseline and the un-pruned ADC ranking it grades
    "ann_pq_recall_eval",
    # IVF-PQ: the candidate join is a broadcast HASH join on the cell
    # key (visible in the broadcast column); remaining BNLs are the
    # 1-row codebook/centroid broadcasts from fit + index + probe
    "ann_ivfpq_topk",
    # 1-row corpus/target token-total scalars crossJoined into the
    # per-bucket log-ratio projection (pct_of_total pattern); the
    # bucket-score and per-doc joins are broadcast HASH joins
    "dsir_importance_select",
    # 1-row expected/actual grand-total scalar crossJoined into the
    # 10-row per-bucket PSI term projection (pct_of_total pattern)
    "psi_drift_report",
    # two 1-row scalar crossJoins (grand totals, then the pass-1
    # usage/uncapped-weight aggregate) into the 20-row per-source
    # allocation — the whole plan runs on the tiny source aggregate
    "mixture_token_budget_plan",
    # hard-negative mining is ann_cosine_topk's brute baseline with the
    # label-inequality as the (non-equi) join predicate: broadcast
    # anchor set x map-only corpus scan; the scale path filters the
    # persisted IVF probe output instead (similarity.hard_negative_topk)
    "hard_negative_mining",
    # centroid-affinity scoring: the labels-row centroid-array frame
    # rides a broadcast crossJoin into the map-side fold (same shape as
    # kmeans_embeddings' assignment) — scale-safe
    "embedding_centroid_silhouette",
    # the 1-row (min,max) bounds aggregate crossJoins into the generated
    # hour spine, and the spine crossJoins the distinct-types frame —
    # both sides bounded by hours x types, never event rows
    "timeseries_gapfill",
    # composes the intentional exact-baseline BNL (truth side, same as
    # ann_recall_eval) with the IVF probe path's centroid broadcasts;
    # the metric layer itself joins on equi-keys
    "retrieval_mrr_ndcg",
    # the pair spine is a non-equi (a < b) join over the GROUPS-row
    # theta table (one row per event type) — bounded by C(groups, 2),
    # never data rows; hv/user_id joins are equi hash joins
    "user_overlap_theta_sketch",
    # 1-row total-token scalar crossJoined into the per-sequence rollup
    # (pct_of_total pattern)
    "sequence_packing_plan",
    # composes TWO exact brute-force baselines (full-dim truth and the
    # truncated-dim ranking it grades) — both the documented
    # ann_cosine_topk BNL shape
    "matryoshka_recall_eval",
    # margin mining scores one A x B relation by construction (the
    # mutual-NN criterion needs both directions over the same scores);
    # side B rides a broadcast, and at corpus scale both sides bucket
    # through the IVF index (documented in margin_mutual_pairs)
    "bitext_margin_mining",
}

#: queries whose widest scan legitimately reads >30 columns: the CUR
#: amortized ladder consumes ~31 cost/attribute columns by construction
#: (reference kpi_instance_all.sql:19-115)
WIDE_SCAN_OK = {"kpi_view_instance_all", "kpi_view_tracker", "kpi_view_summary"}


def _explain(df, mode: str) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def audit(name: str, df) -> dict:
    # Execute first: AQE only finalizes join strategies / coalescing at
    # runtime, and codegen markers only exist on the final plan.
    df.collect()
    plan = _explain(df, "formatted")
    simple = _explain(df, "simple")
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    scan_widths = [len(s.split(",")) if s else 0 for s in scans]
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    n_pushed = sum(1 for p in pushed if p.strip())
    return {
        "name": name,
        "scans": len(scans),
        "max_scan_cols": max(scan_widths, default=0),
        "pushed_scans": n_pushed,
        # "(7) Exchange" detail headers are shuffle exchanges; broadcast
        # exchanges are the distinct "BroadcastExchange" node
        "shuffles": len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M)),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "bnl": plan.count("BroadcastNestedLoopJoin") + plan.count("CartesianProduct"),
        "codegen": len(set(re.findall(r"\*\((\d+)\)", simple))),
        "plan": plan,
    }


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("de_polars_spark-plan-audit")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    only = set(sys.argv[1:])
    rows, flags = [], []
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        try:
            info = audit(name, fn(spark, SF_DIR))
        except Exception as exc:  # pragma: no cover - audit robustness
            flags.append(f"- `{name}`: PLAN FAILED — {exc}")
            continue
        rows.append(info)
        if info["bnl"] and name not in CROSS_JOIN_OK:
            flags.append(
                f"- `{name}`: {info['bnl']} nested-loop/cartesian join(s) — "
                "verify intentional"
            )
        if info["max_scan_cols"] > 30 and name not in WIDE_SCAN_OK:
            flags.append(
                f"- `{name}`: widest scan reads {info['max_scan_cols']} columns — "
                "check projection pruning"
            )
        if info["codegen"] == 0:
            flags.append(f"- `{name}`: no WholeStageCodegen span (interpreted plan)")

    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write(
            "# Physical-plan audit\n\n"
            f"Generated by `tools/audit_plans.py` at `{SF_DIR}`. Facts that\n"
            "matter at 100 TB: pruned scans, pushed filters, broadcast joins\n"
            "for small dims, bounded shuffle count, codegen coverage.\n\n"
            "| query | scans | widest scan (cols) | pushed | shuffles | "
            "broadcast joins | sort-merge joins | nested-loop | codegen spans |\n"
            "|---|---|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write(
                f"| {r['name']} | {r['scans']} | {r['max_scan_cols']} | "
                f"{r['pushed_scans']} | {r['shuffles']} | {r['bhj']} | "
                f"{r['smj']} | {r['bnl']} | {r['codegen']} |\n"
            )
        f.write("\n## Flags\n\n")
        f.write("\n".join(flags) if flags else "None — every plan is the intended shape.")
        f.write("\n")
    print(f"PLANS.md written: {len(rows)} plans, {len(flags)} flags")
    for fl in flags:
        print(fl)
    spark.stop()


if __name__ == "__main__":
    main()
