"""As-of (backward) joins and bounded range joins, Spark-first.

The reference has no temporal joins (SURVEY.md §2.3 "Not present:
theta/range/as-of"); these are the standard time-series operators a
training-data/event pipeline needs, built so the physical plan scales:

- ``asof_join_backward`` — NOT a theta join. Both sides are tagged and
  unioned, shuffled ONCE on the equi-key, sorted within each partition
  by event time, and matched with a running ``last(ignorenulls)``
  window (a forward-fill). Cost is one shuffle + one sort — the same
  shape as a merge as-of join in kdb/pandas ``merge_asof``, and it
  never materializes the O(L×R) pair space a naive
  ``l.ts >= r.ts`` join condition would force (Spark would plan that
  as BroadcastNestedLoop/cartesian — an OOM at scale).
- ``range_count_join`` — counts right-side rows inside a fixed-width
  time window after each left row. The inequality predicate is turned
  into an equi-join on (key, time-bucket) by exploding each left row
  into the (at most two) buckets its window overlaps, so Catalyst
  plans a plain shuffled hash join; the exact range filter then runs
  on the matched pairs only. Bucket width == window width keeps the
  explode factor at exactly 2 regardless of window size.

Determinism contract: callers must ensure the right side has at most
one row per (key, time) — pre-aggregate ties (e.g. keep MAX(id)) —
so "latest at or before t" is a total order in every engine.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_payload: dict[str, str],
) -> DataFrame:
    """Latest right row with ``right_time <= left_time`` per key (inclusive).

    ``right_payload`` maps output column name -> right column; payload
    columns come back NULL where no prior right row exists (left join
    semantics, mirroring DuckDB's ``ASOF LEFT JOIN``).

    Output = every left column (caller guarantees no name collisions
    with payload names) + the payload columns.
    """
    on = list(on)
    payload = F.struct(
        *[F.col(c).alias(alias) for alias, c in right_payload.items()]
    )
    r = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__r"),
    )
    left_struct = F.struct(*[F.col(c) for c in left.columns])
    l = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        left_struct.alias("__l"),
    )
    r = r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType))
    u = l.unionByName(r)
    # right rows sort before left rows at equal time -> backward-inclusive
    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
        .select("__l.*", "__m.*")
    )


def range_count_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    window_seconds: int,
    count_alias: str = "n_in_window",
) -> DataFrame:
    """Per left row, COUNT of right rows with
    ``left_time <= right_time < left_time + window_seconds`` on the same key.

    Output = every left column + the count (0 where nothing matched).
    """
    on = list(on)
    w_us = int(window_seconds) * 1_000_000
    # cast handles TIMESTAMP_NTZ parquet columns; session TZ is UTC so the
    # instant matches DuckDB's naive-as-UTC epoch_us
    lt = F.unix_micros(F.col(left_time).cast("timestamp"))
    rt = F.unix_micros(F.col(right_time).cast("timestamp"))

    def bucket(c: Column) -> Column:
        return F.floor(c / F.lit(w_us)).cast("long")

    # per-row id BEFORE the explode: grouping on the left payload alone
    # would collapse fully-duplicate left rows into one output row whose
    # count sums the duplicates' hits — the contract is one output row
    # per input row
    l2 = (
        left.withColumn("__rid", F.monotonically_increasing_id())
        .withColumn("__lt", lt)
        .withColumn(
            "__b",
            F.explode(F.sequence(bucket(F.col("__lt")), bucket(F.col("__lt")) + 1)),
        )
    )
    r2 = right.select(
        *on, rt.alias("__rt"), bucket(rt).alias("__b")
    )
    joined = l2.join(r2, on=on + ["__b"], how="left").withColumn(
        "__hit",
        F.when(
            (F.col("__rt") >= F.col("__lt"))
            & (F.col("__rt") < F.col("__lt") + F.lit(w_us)),
            1,
        ).otherwise(0),
    )
    return (
        joined.groupBy(F.col("__rid"), *[F.col(c) for c in left.columns])
        .agg(F.sum("__hit").cast("long").alias(count_alias))
        .drop("__rid")
    )
