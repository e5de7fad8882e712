"""Fuzzy string matching (entity resolution): edit-distance pairs.

The record-linkage step catalog pipelines need (near-identical product
names, author variants, address dedup): name groups within a blocking
key whose normalized strings sit within Levenshtein distance
``1..k`` — exact duplicates (distance 0) are deliberately OUT of scope;
they are the trivial case ``dedup.exact_dup_groups`` already handles,
and at catalog scale they dominate the pair count without adding
information.

Scale shape, in order:
1. **Block.** Candidates never leave their blocking key (a brand, a zip
   code, a sorted-token prefix) — an unblocked all-pairs comparison is
   impossible at 100 TB; the blocking key IS the algorithm.
2. **Collapse.** Identical normalized names collapse to one group row
   (min-id representative + multiplicity) BEFORE anything quadratic —
   duplicate-heavy catalogs shrink by their duplication factor, the
   same discipline as ``dedup.simhash_hamming_pairs``.
3. **Band.** ``||a| - |b|| <= k`` is a lossless prune (one edit moves
   length by at most one).
4. **Verify.** One ``levenshtein`` per surviving pair — JVM-side,
   identical semantics in DuckDB (parity verified value-exact); short
   strings make the DP table the cheap part.

``max_block_size`` caps degenerate blocks (by DISTINCT-name count) at
the cost of exactness — the standard skew-guard contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    k: int,
    max_block_size: int | None = None,
) -> DataFrame:
    """Near-match name-group pairs: ``(id_a, id_b, n_a, n_b, n_pairs,
    distance)`` with ``1 <= distance <= k``.

    ``id_a``/``id_b`` are the min-id representatives of the two name
    groups (``id_a < id_b``), ``n_a``/``n_b`` the group sizes, and
    ``n_pairs = n_a * n_b`` the number of underlying record pairs the
    group pair stands for."""
    groups = (
        df.select(
            F.col(id_col),
            F.col(block_col).alias("block"),
            F.lower(F.col(text_col)).alias("nm"),
        )
        .groupBy("block", "nm")
        .agg(F.min(id_col).alias("gid"), F.count(F.lit(1)).alias("cnt"))
        .withColumn("ln", F.length("nm"))
    )
    if max_block_size is not None:
        sizes = groups.groupBy("block").agg(F.count(F.lit(1)).alias("__bn"))
        groups = groups.join(
            sizes.filter(F.col("__bn") <= max_block_size).select("block"),
            "block",
        )
    a, b = groups.alias("a"), groups.alias("b")
    dist = F.levenshtein(F.col("a.nm"), F.col("b.nm"))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.gid") < F.col("b.gid"))
            & (F.abs(F.col("a.ln") - F.col("b.ln")) <= k),
        )
        .select(
            F.col("a.gid").alias("id_a"),
            F.col("b.gid").alias("id_b"),
            F.col("a.cnt").cast("long").alias("n_a"),
            F.col("b.cnt").cast("long").alias("n_b"),
            (F.col("a.cnt") * F.col("b.cnt")).cast("long").alias("n_pairs"),
            dist.cast("int").alias("distance"),
        )
        .filter((F.col("distance") >= 1) & (F.col("distance") <= k))
    )
