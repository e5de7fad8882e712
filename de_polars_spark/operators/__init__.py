from de_polars_spark.operators import (
    asof,
    dedup,
    merge,
    multimodal,
    quantiles,
    sampling,
    similarity,
    skew,
    textrank,
)

__all__ = [
    "asof",
    "dedup",
    "merge",
    "multimodal",
    "quantiles",
    "sampling",
    "similarity",
    "skew",
    "textrank",
]
