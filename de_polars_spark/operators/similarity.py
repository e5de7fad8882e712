"""Similarity search over an embedding column.

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Query set broadcast against the corpus (queries are small; the corpus
  scan is embarrassingly parallel, no corpus shuffle), then per-query
  top-k via window row_number (Catalyst plans a partial top-k per
  partition before the final shuffle of k rows per query).
- ``lsh_bucketed_topk``: the scale path — sign-bit LSH buckets shrink each
  query's candidate set to ~corpus/2^bits; same top-k afterwards. Recall
  trades off with bucket count; at 100 TB you'd add multi-probe (flip one
  bit) which is a UNION of bucket keys, not a new algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from de_polars_spark.functions import vectors as VX


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact brute-force cosine top-k for each query vector.

    Norms are precomputed per row on both sides so each of the Q×N pairs
    pays one dot-product fold, not three."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), VX.as_double(F.col(vec_col)).alias("cv")
    ).select("neighbor_id", "cv", VX.norm(F.col("cv")).alias("cn"))
    q = queries.select(
        F.col(id_col).alias("query_id"), VX.as_double(F.col(vec_col)).alias("qv")
    ).select("query_id", "qv", VX.norm(F.col("qv")).alias("qn"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                VX.dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("cosine"),
        )
    )
    return _ranked_topk(scored, k)


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    bucket_dims: tuple[int, ...] = (1, 17, 33, 49),
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket."""
    dims = list(bucket_dims)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        VX.as_double(F.col(vec_col)).alias("cv"),
        VX.sign_bucket(F.col(vec_col), dims).alias("bucket"),
    ).select("neighbor_id", "cv", "bucket", VX.norm(F.col("cv")).alias("cn"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        VX.as_double(F.col(vec_col)).alias("qv"),
        VX.sign_bucket(F.col(vec_col), dims).alias("bucket"),
    ).select("query_id", "qv", "bucket", VX.norm(F.col("qv")).alias("qn"))
    scored = (
        c.join(
            F.broadcast(q),
            (c["bucket"] == q["bucket"])
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                VX.dot(q["qv"], c["cv"]) / (q["qn"] * c["cn"]), 6
            ).alias("cosine"),
        )
    )
    return _ranked_topk(scored, k)
