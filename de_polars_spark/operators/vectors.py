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
