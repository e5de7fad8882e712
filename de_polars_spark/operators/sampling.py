"""Deterministic corpus sampling for training-data pipelines.

Two primitives a 100 TB pipeline needs constantly, both *deterministic*
(same rows on every run, every engine — md5-keyed, never ``rand()``):

- hash-Bernoulli: keep a row iff a uniform value derived from md5(id)
  falls under the fraction. Pure per-row expression — ZERO shuffle, no
  state, reproducible resumes, and the complement / disjoint splits
  (train/val/test) come from non-overlapping hash ranges. This is how
  you sample a petabyte: the filter pushes into the scan stage.
- stratified quota: exactly ``k`` rows per stratum (per language, per
  source, per quality bucket), ranked by hash so the quota is an
  unbiased uniform draw. Naive form is one window over the stratum —
  which at scale serializes each stratum into a single task (the
  boilerplate-language stratum might be 10 TB alone). The two-phase
  form salts each stratum into ``n_salts`` sub-windows, takes a local
  top-k per salt, then a global top-k over the ``n_salts * k``
  survivors: identical output (the k smallest hash ranks survive phase
  1 by construction), but the heavy sort is bounded per-task.

Reference parity: the reference engine exposes only LIMIT-style heads
(`de_polars/engine.py` sample paths); quota/Bernoulli sampling is a
beyond-parity addition per SURVEY §7 Phase 5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: 2^32 — the hash prefix below is 8 hex digits = 32 bits
_HASH_SPACE = 4294967296.0


def hash_uniform(key: Column, salt: str = "") -> Column:
    """Deterministic uniform [0, 1) value from a key column: the first
    32 bits of md5(key || salt) scaled by 2^-32. Identical in any engine
    with md5 (the DuckDB oracle form is ``CAST('0x' || substring(md5(k),
    1, 8) AS BIGINT) / 4294967296.0``)."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") / F.lit(_HASH_SPACE)


def hash_bernoulli_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep each row with deterministic probability ``fraction``.

    A pure filter expression — Catalyst pushes it to the scan, no
    shuffle, no RNG state. Different ``salt`` values give independent
    draws; disjoint fraction ranges of the same salt give disjoint
    splits."""
    return df.filter(hash_uniform(F.col(id_col), salt) < F.lit(fraction))


def stratified_quota_sample(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    k: int,
    salt: str = "",
    n_salts: int | None = 16,
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, drawn uniformly
    (hash-ranked, id tiebreak). Adds a ``sample_rank`` column (1..k
    within the stratum).

    ``n_salts`` enables the two-phase skew-proof plan (see module
    docstring); ``None`` uses the single-window form. Output is
    identical either way: a row is in the global stratum top-k only if
    it is in the top-k of its salt bucket, so phase 1 never discards a
    survivor."""
    rank_key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    out = df.withColumn("__rk", rank_key)
    if n_salts is not None:
        bucket = F.pmod(F.crc32(F.col(id_col).cast("string")), F.lit(n_salts))
        local = Window.partitionBy(*strata_cols, bucket.alias("__b")).orderBy(
            "__rk", id_col
        )
        out = (
            out.withColumn("__lrn", F.row_number().over(local))
            .filter(F.col("__lrn") <= k)
            .drop("__lrn")
        )
    final = Window.partitionBy(*strata_cols).orderBy("__rk", id_col)
    return (
        out.withColumn("sample_rank", F.row_number().over(final))
        .filter(F.col("sample_rank") <= k)
        .drop("__rk")
    )


def split_train_val_test(
    df: DataFrame,
    id_col: str,
    val_fraction: float,
    test_fraction: float,
    salt: str = "",
) -> DataFrame:
    """Deterministic disjoint split: adds a ``split`` column
    ('train' / 'val' / 'test') from non-overlapping ranges of one hash
    draw. Rows never migrate between splits as the corpus grows (a
    row's split depends only on its own id)."""
    u = hash_uniform(F.col(id_col), salt)
    return df.withColumn(
        "split",
        F.when(u < val_fraction, F.lit("val"))
        .when(u < val_fraction + test_fraction, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def weighted_sample_topk(
    df: DataFrame,
    id_col: str,
    weight: Column,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sample without replacement (A-ES /
    Efraimidis-Spirtsos): each row draws key = u^(1/w) from its own
    hash-derived uniform u, and the k largest keys are the sample —
    inclusion probability proportional to weight, no RNG state, stable
    under re-runs and corpus growth. One top-k (TakeOrderedAndProject),
    no shuffle of the full data.

    The key is rounded to 12 decimals before ranking so engines whose
    ``pow`` differs in the last ulp (JVM vs C libm) rank identically;
    ties break on id. The global top-k runs in two phases (local top-k
    per hash bucket, then a final rank over the surviving ``32*k``
    rows) so no single partition ever sorts the full corpus.
    """
    key = F.round(
        F.pow(hash_uniform(F.col(id_col), salt), F.lit(1.0) / weight), 12
    )
    bucket = F.pmod(F.hash(F.col(id_col)), F.lit(32))
    local = Window.partitionBy(bucket).orderBy(F.desc("__wkey"), F.asc(id_col))
    final = Window.orderBy(F.desc("__wkey"), F.asc(id_col))
    return (
        df.where(weight > 0)
        .withColumn("__wkey", key)
        .withColumn("__lrk", F.row_number().over(local))
        .filter(F.col("__lrk") <= k)
        .withColumn("sample_rank", F.row_number().over(final).cast("int"))
        .filter(F.col("sample_rank") <= k)
        .drop("__wkey", "__lrk")
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight: Column,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sample without replacement, per group —
    the stratified counterpart of :func:`weighted_sample_topk` (same
    A-ES key: u^(1/w) from the row's md5 uniform, rounded to 12
    decimals, ties on id).

    One window partitioned by the group key: Catalyst plans a per-
    partition partial top-k (WindowGroupLimit) before the group
    shuffle, so at corpus scale each group's candidates collapse to
    ~k rows per input partition before any data moves — no group ever
    sorts its full membership on one executor. This is the "give me k
    docs per source, favoring the long ones" primitive quota-balanced
    corpus construction runs everywhere.
    """
    key = F.round(
        F.pow(hash_uniform(F.col(id_col), salt), F.lit(1.0) / weight), 12
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("__wkey"), F.asc(id_col))
    return (
        df.where(weight > 0)
        .withColumn("__wkey", key)
        .withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("sample_rank") <= k)
        .drop("__wkey")
    )
