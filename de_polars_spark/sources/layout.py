"""Storage-layout optimization: z-order clustering + file compaction.

At 100 TB the scan is won or lost before the query runs: parquet
row-group min/max stats only prune when values are clustered within
files. Sorting clusters ONE column; z-ordering (bit-interleaved ranks)
clusters several at once, so range predicates on any of them skip files.
This is the open-source building block behind Delta/Iceberg OPTIMIZE
ZORDER, expressed directly on DataFrames:

- map each clustering column to a ``bits``-bit rank (min/max scaled —
  one tiny two-pass aggregate),
- interleave the rank bits into one bigint z-value,
- ``repartitionByRange`` on it (contiguous z-ranges per output file,
  also the compaction step: pick ``n_files`` to hit your target file
  size) and sort within partitions.

tests/test_layout.py asserts the per-file value ranges actually tighten
versus an unclustered write.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 16
) -> tuple[DataFrame, Column]:
    """Return (df, z) where ``z`` interleaves ``bits``-bit min/max-scaled
    ranks of ``cols``. Two tiny jobs: one agg for the bounds (collected —
    it is one row), then a pure per-row expression."""
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    scale = (1 << bits) - 1
    ranks = []
    for c in cols:
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        span = (mx - mn) or 1.0
        ranks.append(
            F.round((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * scale)
            .cast("bigint")
        )
    z = F.lit(0).cast("bigint")
    for j in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, j).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit.cast("bigint"), j * len(ranks) + i)
    return df, z


def optimize_layout(
    df: DataFrame,
    path: str,
    zorder_cols: Sequence[str],
    n_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` to ``path`` as ``n_files`` parquet files clustered by
    the z-order of ``zorder_cols``. ``n_files`` is the compaction knob:
    total_bytes / target_file_bytes (128-512 MB files are the usual
    sweet spot for parquet scans)."""
    df, z = zorder_key(df, zorder_cols, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
