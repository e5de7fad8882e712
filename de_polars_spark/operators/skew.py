"""Skew-mitigation aggregation: explicit two-phase salted groupBy.

When one group key dominates (a stopword term, a mega-customer, a
default partition value), a single ``groupBy(key)`` sends every row of
the hot key to one reducer. Salting splits each key into ``n_salts``
sub-groups for the first (heavy) aggregation, then combines the small
per-salt partials in a second, cheap aggregation — the classic
two-phase pattern AQE's skew handling applies to joins but not to
aggregations over a pathological key distribution.

The salt is derived from a uniform row-level hash, so partial sizes are
balanced regardless of how rows are laid out on disk. Sums stay in
exact decimal through both phases (order-independent); the result is
bit-identical to the unsalted single-phase groupBy.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value: Column,
    row_id: Column,
    n_salts: int = 32,
    sum_alias: str = "total",
    count_alias: str = "n_rows",
) -> DataFrame:
    """SUM(value) + COUNT(*) per key, computed via salted two-phase agg.

    ``row_id`` must be any expression that spreads rows uniformly (an
    id column is ideal). Result: keys + [sum_alias DOUBLE, count_alias
    LONG], identical to the direct groupBy.
    """
    keys = list(keys)
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(row_id), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(value.cast("decimal(38,6)")).alias("__psum"),
        F.count("*").alias("__pcnt"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("__psum").cast("double").alias(sum_alias),
        F.sum("__pcnt").cast("long").alias(count_alias),
    )
