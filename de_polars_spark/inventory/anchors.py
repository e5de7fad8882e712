"""The exact-anchor contract: every deliberately-quadratic inventory
entry, mapped to its capped/indexed production twin.

Some inventory queries are INTENTIONALLY super-linear: they are either
(a) exact oracle anchors — brute-force shapes kept so the capped/
sketched production operators have a same-repo ground truth to be
validated against — or (b) recall/eval baselines whose truth side must
be exact by definition. None of them is the recommendation at scale;
each maps here to the production path a 100-TB user should run.

This table is the single source the scaling report's footnotes, the
SURVEY contract table, and the "is this ladder row a scale bug?"
pytest all read, so the answer can never drift across the three.

Keys are inventory query names; ``scale_path`` names the production
twin(s) (also inventory queries), ``why`` says what the exact shape is
for. ``kind`` is "anchor" (exact oracle anchor for a capped twin) or
"eval" (recall/quality baseline; the exact side IS the measurement).
"""

from __future__ import annotations

EXACT_ANCHORS: dict[str, dict] = {
    # -- dedup pair-graph anchors: exact banding / full posting lists,
    #    pinned max_bucket_size=None; the DEFAULT (cap 16) is the product
    "dedup_ngram_jaccard": {
        "kind": "anchor",
        "scale_path": ["dedup_minhash_lsh_capped", "dedup_minhash_estimate"],
        "why": "full posting-list n-gram Jaccard; validates the MinHash "
        "prescreen + capped-band estimates",
    },
    "dedup_minhash_lsh": {
        "kind": "anchor",
        "scale_path": ["dedup_minhash_lsh_capped"],
        "why": "exact (uncapped) LSH banding; validates the cap-16 default",
    },
    "dedup_simhash_hamming": {
        "kind": "anchor",
        "scale_path": ["dedup_simhash_hamming_capped"],
        "why": "exact pigeonhole-banded Hamming; validates the capped twin",
    },
    "dedup_containment": {
        "kind": "anchor",
        "scale_path": ["dedup_minhash_lsh_capped"],
        "why": "exact containment over posting lists (prefix-filter + "
        "max_df bounded, still super-linear); MinHash-capped is the "
        "at-scale near-dup path",
    },
    "dedup_longest_shared_span": {
        "kind": "anchor",
        "scale_path": ["dedup_minhash_lsh_capped"],
        "why": "exact shared-span over candidate pairs; candidate "
        "generation at scale comes from the capped pair graph",
    },
    "dedup_embedding_cosine": {
        "kind": "anchor",
        "scale_path": ["dedup_semantic", "ann_ivf_topk"],
        "why": "label-blocked quadratic cosine near-dup; the semantic "
        "(cluster-pruned) and IVF paths are the at-scale forms",
    },
    # -- ANN exact baselines
    "ann_cosine_topk": {
        "kind": "anchor",
        "scale_path": [
            "ann_ivf_topk",
            "ann_ivf_kmeans_topk",
            "ann_multiprobe_topk",
            "ann_lsh_topk",
        ],
        "why": "brute-force exact top-k — broadcast queries x full corpus "
        "scan IS the algorithm; serves as every recall eval's truth side",
    },
    "ann_pq_topk": {
        "kind": "anchor",
        "scale_path": ["ann_ivfpq_topk"],
        "why": "un-pruned ADC (PQ without an IVF in front) — by design a "
        "full-corpus pass; IVF-PQ is the pruned serving path",
    },
    "bitext_margin_mining": {
        "kind": "anchor",
        "scale_path": ["bitext_margin_mining_ivf"],
        "why": "exact A x B margin relation kept as the oracle/recall "
        "anchor for the cell-bucketed IVF miner",
    },
    "hard_negative_mining": {
        "kind": "anchor",
        "scale_path": ["hard_negative_mining_ivf"],
        "why": "brute shape with a label-inequality predicate; the IVF "
        "probe output is the at-scale candidate source",
    },
    # -- recall / quality evals: the exact truth side IS the measurement
    "ann_recall_eval": {
        "kind": "eval",
        "scale_path": ["ann_ivf_topk"],
        "why": "grades IVF recall against the exact baseline",
    },
    "ann_recall_eval_clustered": {
        "kind": "eval",
        "scale_path": ["ann_ivf_topk"],
        "why": "same, over the clustered fixture (operating point 0.983)",
    },
    "ann_pq_recall_eval": {
        "kind": "eval",
        "scale_path": ["ann_ivfpq_topk"],
        "why": "exact baseline + un-pruned ADC grade the PQ codebooks",
    },
    "ann_pq_recall_eval_clustered": {
        "kind": "eval",
        "scale_path": ["ann_ivfpq_topk"],
        "why": "same shapes over the clustered fixture",
    },
    "ann_pq_recall_eval_neardup": {
        "kind": "eval",
        "scale_path": ["ann_ivfpq_topk"],
        "why": "same shapes over the near-dup fixture (PQ's regime, 0.933)",
    },
    "bitext_ivf_pair_recall_clustered": {
        "kind": "eval",
        "scale_path": ["bitext_margin_mining_ivf"],
        "why": "runs the exact miner AND the IVF miner to measure pair "
        "recall (1.0 over the paired fixture)",
    },
    "matryoshka_recall_eval": {
        "kind": "eval",
        "scale_path": ["embedding_truncate_norm"],
        "why": "two exact brute relations (full-dim truth vs truncated "
        "ranking) grade dimension truncation",
    },
    "retrieval_mrr_ndcg": {
        "kind": "eval",
        "scale_path": ["ann_ivf_topk"],
        "why": "exact truth side grading the IVF probe path",
    },
}
