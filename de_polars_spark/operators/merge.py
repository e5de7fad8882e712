"""Snapshot MERGE (upsert + delete) over keyed tables, Spark-first.

A training corpus is refreshed continuously: re-crawled documents
replace old versions, new documents arrive, takedowns are removed. On a
table format with MERGE (Delta/Iceberg) that's one statement; on plain
parquet the same semantics are a composition of DataFrame ops:

    next = base ANTI-JOIN changed_keys  UNION ALL  upserts

Shapes at scale:
- the anti join and the union both hash-partition on the key — one
  shuffle each, and AQE broadcasts the change set when it is small
  relative to the base (the common case: daily deltas vs a full corpus);
- delete handling costs nothing extra: deletes participate in the
  anti join's key set but contribute no rows to the union;
- conflict rule is deterministic: if a key appears several times in the
  change set, the highest ``version_col`` wins (ties by op: delete
  beats upsert), resolved with one window before the merge.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: change-set op column values
OP_UPSERT = "upsert"
OP_DELETE = "delete"


def merge_snapshot(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    version_col: str | None = None,
) -> DataFrame:
    """Apply a change set to a keyed snapshot; returns the next snapshot.

    ``changes`` must carry the base's columns plus ``op_col`` with
    'upsert' | 'delete' (delete rows may have NULL payload columns).
    With ``version_col``, the highest version per key wins; without it,
    the change set must have at most one row per key.

    Unknown ``op_col`` values raise: an unvalidated change set would
    anti-join the row's key out of the base while contributing no upsert
    — i.e. a typo'd op silently DELETES data. The validation is one
    bounded action over the (small, incremental) change set.
    """
    keys = list(keys)
    bad = (
        changes.where(~F.col(op_col).isin(OP_UPSERT, OP_DELETE))
        .select(op_col)
        .limit(1)
        .collect()
    )
    if bad:
        raise ValueError(
            f"merge_snapshot: unknown {op_col!r} value {bad[0][0]!r} "
            f"(expected {OP_UPSERT!r} or {OP_DELETE!r})"
        )
    if version_col is not None:
        w = Window.partitionBy(*keys).orderBy(
            F.desc(version_col),
            # delete sorts before upsert at equal version -> wins ties
            F.when(F.col(op_col) == OP_DELETE, 0).otherwise(1),
        )
        changes = (
            changes.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    untouched = base.join(changes.select(*keys), keys, "left_anti")
    upserts = changes.where(F.col(op_col) == OP_UPSERT).select(*base.columns)
    return untouched.unionByName(upserts)
