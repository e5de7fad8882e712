"""Exact distributed quantiles via rank interpolation.

Spark's built-in ``percentile_cont`` aggregates by merging per-partition
value/count buffers — per-group memory is O(distinct values), which for
a continuous column is the group size. That's fine at test scale and a
cliff at 100 TB. The sort-based formulation has no such buffer: shuffle
once on the group key (a sort the cluster does distributedly), attach
``row_number`` and group counts with one window pass, and keep only the
two rows that bracket each requested fraction — linear interpolation
between them IS the SQL-standard ``percentile_cont`` / DuckDB
``quantile_cont`` definition:

    pos = (n - 1) * p          (0-based), lo = floor(pos), hi = ceil(pos)
    q   = v[lo] + (v[hi] - v[lo]) * (pos - lo)

Duplicate values are harmless (bracket rows with equal values
interpolate to the same value regardless of tie order), so the result
is deterministic without a tiebreak.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    fractions: Sequence[float],
    round_dp: int = 6,
) -> DataFrame:
    """One row per key group: ``p<frac>`` columns + ``n_items``.

    Output column names: ``p25`` for 0.25, ``p999`` for 0.999, etc.
    """
    keys = list(keys)
    w_order = Window.partitionBy(*keys).orderBy(value_col)
    w_all = Window.partitionBy(*keys)
    ranked = df.select(*keys, value_col).select(
        *keys,
        F.col(value_col).alias("__v"),
        (F.row_number().over(w_order) - 1).alias("__rn"),  # 0-based
        F.count("*").over(w_all).alias("__n"),
    )

    def name(p: float) -> str:
        return "p" + str(p)[2:].rstrip("0").ljust(2, "0")

    # keep only bracket rows: __rn == floor(pos) or ceil(pos) for some p
    keep = None
    for p in fractions:
        pos = (F.col("__n") - 1) * F.lit(p)
        hit = (F.col("__rn") == F.floor(pos)) | (F.col("__rn") == F.ceil(pos))
        keep = hit if keep is None else keep | hit
    brackets = ranked.where(keep)

    aggs = []
    for p in fractions:
        # row-level bracket predicates may use __rn/__n; the interpolation
        # fraction must be rebuilt from the aggregated count
        row_pos = (F.col("__n") - 1) * F.lit(p)
        lo_v = F.max(F.when(F.col("__rn") == F.floor(row_pos), F.col("__v")))
        hi_v = F.max(F.when(F.col("__rn") == F.ceil(row_pos), F.col("__v")))
        agg_pos = (F.max("__n") - 1) * F.lit(p)
        frac = agg_pos - F.floor(agg_pos)
        aggs.append(
            F.round(lo_v + (hi_v - lo_v) * frac, round_dp).alias(name(p))
        )
    return brackets.groupBy(*keys).agg(
        *aggs, F.max("__n").alias("n_items")
    )
