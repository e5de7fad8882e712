"""Plan-shape regression guards for scale-critical operators.

PLANS.md records the full audit; these tests pin the few properties
whose silent loss would be a 100 TB regression even with every oracle
still green.
"""

from __future__ import annotations


def test_ivf_index_query_prunes_cell_partitions(spark, sf_dir):
    """The persisted IVF index is cell-partitioned parquet; a probe must
    read ONLY its probed cells. With the query side broadcast, Spark's
    dynamic partition pruning injects the probed-cell subquery into the
    postings scan — if this disappears, every query silently rescans
    the whole index (at 100 TB: the whole embedding store)."""
    from de_polars_spark.inventory.llm_ops import _ensure_ivf_index
    from de_polars_spark.operators import similarity
    from de_polars_spark.sources.registry import register_testdata

    path = _ensure_ivf_index(spark, sf_dir)
    cents, postings = similarity.load_ivf_index(spark, path)
    t = register_testdata(spark, sf_dir)
    q = t["embeddings"].where("vec_id % 100 = 0")
    out = similarity.ivf_topk_from_index(postings, cents, q, "vec_id", "embedding")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
