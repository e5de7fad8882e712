from de_polars_spark.operators import (
    asof,
    dedup,
    graph,
    kmeans,
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
    "graph",
    "kmeans",
    "merge",
    "multimodal",
    "quantiles",
    "sampling",
    "similarity",
    "skew",
    "textrank",
]
