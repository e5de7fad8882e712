"""Streaming distinct-count sketches: windowed HyperLogLog registers.

Exact COUNT(DISTINCT) is not supported in Structured Streaming (state
would be the full distinct set per window); the HLL register table IS
streamable, because its per-window state is a constant 256 registers
updated with MAX — a supported streaming aggregate. The registers use
the same md5-derived hash recipe as the batch sketch
(inventory/relational_ext.py ``approx_distinct_hll``), so a batch run
over the same data produces the identical register table, and the
estimate is a cheap stateless fold over 256 rows downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M = 256  # registers
_SCALE = 9007199254740992  # 2^53, integer-exact register weights


def _reg_and_rho() -> tuple[F.Column, F.Column]:
    h = F.expr(
        "CAST(conv(substring(md5(CAST(__hll_key AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT)"
    )
    reg = h.bitwiseAND(F.lit(_M - 1))
    w = F.shiftright(h, 8)
    # rho via integer bit-length (floor(log2(w)) = length(bin(w)) - 1):
    # libm float log is not correctly-rounded at exact powers of two, so
    # a float-log rho could disagree with the DuckDB oracle by 1 there;
    # bin() is integer-exact in both engines (relational_ext.py's batch
    # HLL uses the same recipe).
    rho = F.when(w == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin(w)).cast("int")
    )
    return reg, rho


def windowed_hll_registers(
    stream: DataFrame,
    time_col: str,
    group_col: str,
    key_col: str,
    window_duration: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """(window_start, group, reg, rho): max leading-zero rank per register.

    Runs on batch or streaming frames; streaming state is 256 rows per
    (window, group) regardless of cardinality.
    """
    if stream.isStreaming:
        stream = stream.withWatermark(time_col, watermark)
    keyed = stream.withColumn("__hll_key", F.col(key_col))
    reg, rho = _reg_and_rho()
    return (
        keyed.groupBy(
            F.window(F.col(time_col), window_duration).alias("w"),
            F.col(group_col).alias("grp"),
            reg.alias("reg"),
        )
        .agg(F.max(rho).alias("rho"))
        .select(F.col("w.start").alias("window_start"), "grp", "reg", "rho")
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """Fold a register table into per-(window, group) estimates.

    Stateless over at most 256 rows per group — run on the sink side
    (foreachBatch / the materialized register table).
    """
    alpha = 0.7213 / (1.0 + 1.079 / _M)
    sums = registers.groupBy("window_start", "grp").agg(
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - rho)"))
            + (F.lit(_M) - F.count("*")) * F.lit(_SCALE)
        ).alias("s"),
        F.count("*").alias("n_registers"),
    )
    e_raw = F.lit(alpha * _M * _M * float(_SCALE)) / F.col("s")
    lc = F.lit(float(_M)) * F.log(
        F.lit(float(_M)) / (F.lit(_M) - F.col("n_registers"))
    )
    return sums.select(
        "window_start",
        "grp",
        F.round(
            F.when(
                (e_raw <= 2.5 * _M) & (F.col("n_registers") < _M), lc
            ).otherwise(e_raw),
            3,
        ).alias("estimate"),
        "n_registers",
    )


_CMS_DEPTH, _CMS_WIDTH = 4, 512


def windowed_cms_cells(
    stream: DataFrame,
    time_col: str,
    key_col: str,
    window_duration: str = "1 day",
    watermark: str = "2 days",
    depth: int = _CMS_DEPTH,
    width: int = _CMS_WIDTH,
) -> DataFrame:
    """Streaming Count-Min sketch: (window_start, j, cell, n) counts.

    State is at most ``depth x width`` rows per window regardless of key
    cardinality (the CMS guarantee) — the streaming analog of the batch
    `heavy_hitters_cms` (inventory/relational_ext.py), same md5-derived
    cell hash, so the cell table is integer-exact in any engine and
    batch == stream row-for-row.

    Point query: for key k, estimate = min over j of the (j, cell_j(k))
    counts — run on the sink side against the materialized cell table.
    """
    if stream.isStreaming:
        stream = stream.withWatermark(time_col, watermark)
    # explode the depth dimension BEFORE the aggregate: one stateful
    # operator total (a union of per-row groupBys would be `depth`
    # separate state stores, which streaming restricts and batch would
    # scan `depth` times)
    cell = F.expr(
        "CAST(conv(substring(md5(CAST(__cms_key AS STRING) || '#' "
        "|| CAST(j AS STRING)), 1, 15), 16, 10) AS BIGINT) % " + str(width)
    )
    return (
        stream.withColumn("__cms_key", F.col(key_col))
        .withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))))
        .groupBy(
            F.window(F.col(time_col), window_duration).alias("w"),
            F.col("j"),
            cell.alias("cell"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "j", "cell", "n")
    )
