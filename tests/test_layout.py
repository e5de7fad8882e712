"""Z-order layout: per-file value ranges tighten on BOTH dimensions."""

from __future__ import annotations

from pyspark.sql import functions as F

from de_polars_spark.sources.layout import optimize_layout


def _mean_file_span(spark, path: str, col: str) -> float:
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg((F.max(col) - F.min(col)).alias("span"))
    )
    return per_file.agg(F.avg("span")).collect()[0][0]


def test_zorder_tightens_file_ranges(spark, tmp_path):
    # x and y deliberately uncorrelated: a plain sort could only cluster one
    df = spark.range(0, 20000).select(
        (F.col("id") % 100).alias("x"),
        ((F.col("id") * 7919) % 100).alias("y"),
        F.col("id").alias("payload"),
    )
    plain, zordered = str(tmp_path / "plain"), str(tmp_path / "zorder")
    df.repartition(16).write.parquet(plain)
    optimize_layout(df, zordered, ["x", "y"], n_files=16)

    # same data back
    assert spark.read.parquet(zordered).count() == 20000
    assert (
        spark.read.parquet(zordered).agg(F.sum("payload")).collect()[0][0]
        == df.agg(F.sum("payload")).collect()[0][0]
    )
    # clustering: mean per-file span shrinks on BOTH dims (random ~99)
    for col in ("x", "y"):
        span_plain = _mean_file_span(spark, plain, col)
        span_z = _mean_file_span(spark, zordered, col)
        assert span_z < span_plain * 0.6, (col, span_z, span_plain)
