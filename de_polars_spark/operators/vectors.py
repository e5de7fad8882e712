"""Embedding-vector maintenance: L2 normalization and matryoshka-style
dimension truncation.

The standard storage/serving prep for an embedding corpus: normalize so
cosine becomes a plain dot product, and truncate to a prefix of the
dimensions (matryoshka representation learning trains embeddings whose
prefixes are themselves usable — serving at d=64 instead of d=768 cuts
ANN memory ~12x) with a re-normalization after the cut.

Reference parity: none (the reference has no vector ops); beyond-parity
LLM-pipeline operator.

Scale shape: pure per-row expressions (``zip_with``/``aggregate``
folds, JVM-side, whole-stage codegen) — no shuffle, no UDF, no
collect. Determinism: the norm fold is sequential over ascending dims
(same order in any engine), divisions are IEEE double, outputs rounded
to 6dp before comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from de_polars_spark.functions.vectors import dot as _dot


def l2_normalize(vec: Column) -> Column:
    """vec / ||vec|| (double arithmetic; zero vectors pass through)."""
    norm = F.sqrt(_dot(vec, vec))
    return F.when(norm == 0.0, vec).otherwise(
        F.transform(vec, lambda x: x / norm)
    )


def truncate_normalize(
    df: DataFrame, id_col: str, vec_col: str, dim: int
) -> DataFrame:
    """Per vector: full-dim norm, truncated-prefix norm, and the first
    component of the re-normalized truncated vector (a spot-check value
    pinning the whole renormalization without emitting ``dim`` columns).

    Output: ``(id, full_dim, full_norm, trunc_norm, lead_component)``.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    tv = F.slice(v, 1, dim)
    full_norm = F.sqrt(_dot(v, v))
    trunc_norm = F.sqrt(_dot(tv, tv))
    return df.select(
        F.col(id_col),
        F.size(F.col(vec_col)).alias("full_dim"),
        F.round(full_norm, 6).alias("full_norm"),
        F.round(trunc_norm, 6).alias("trunc_norm"),
        F.round(
            F.element_at(tv, 1)
            / F.when(trunc_norm == 0.0, F.lit(1.0)).otherwise(trunc_norm),
            6,
        ).alias("lead_component"),
    )


def average_pool(
    df: DataFrame, group_col: str, vec_col: str
) -> DataFrame:
    """Element-wise average pooling of vectors per group — the chunk→doc
    embedding rollup (a document's embedding as the mean of its chunks'
    embeddings, the standard long-document retrieval representation).

    Shape: ``posexplode`` to (group, dim, value) — embarrassingly
    parallel — then ONE map-side-combinable aggregation per (group, dim)
    and a second tiny one per group. Mirrors the k-means centroid-update
    shuffle (operators/kmeans.py): nothing driver-side, nothing
    quadratic, state per group is dim-bounded.

    Determinism: per-dim means are decimal-quantized sums over counts
    (order-independent, engine-exact); the norm/sum reductions over the
    dim-indexed means re-quantize each product so the cross-dim sums are
    order-independent too.

    Output: ``(gid, n_members, pooled_norm, pooled_sum)`` — the pooled
    vector's L2 norm and component sum (rounded 6dp), with the full
    pooled vector recoverable by skipping the final rollup.
    """
    ex = df.select(
        F.col(group_col).alias("gid"),
        F.posexplode(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("dim", "val"),
    )
    dims = ex.groupBy("gid", "dim").agg(
        (
            F.sum(F.col("val").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("m"),
        F.count(F.lit(1)).alias("n"),
    )
    return dims.groupBy("gid").agg(
        F.max("n").cast("bigint").alias("n_members"),
        F.round(
            F.sqrt(
                F.sum((F.col("m") * F.col("m")).cast("decimal(38,6)")).cast(
                    "double"
                )
            ),
            6,
        ).alias("pooled_norm"),
        F.round(
            F.sum(F.col("m").cast("decimal(38,6)")).cast("double"), 6
        ).alias("pooled_sum"),
    )
