"""Bit-exactness of the unrolled (codegen) vector math vs the HOF fold.

The optimization contract of ``functions/vectors.py``: passing a static
``dim`` changes the physical form (interpreted higher-order-function
fold → whole-stage-codegen expression chain) but NOT one bit of any
result. Values are compared through CAST TO STRING, which distinguishes
``-0.0`` from ``0.0`` and preserves the full shortest-roundtrip double
representation — plain ``==`` would hide a signed-zero divergence.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from de_polars_spark.functions import vectors as VX

DIM = 64


def _emb(spark, sf_dir):
    path = os.path.join(sf_dir, "embeddings.parquet")
    return spark.read.parquet(path)


def _assert_col_pair_equal(df, fold_col, unrolled_col):
    bad = df.select(
        fold_col.cast("string").alias("f"),
        unrolled_col.cast("string").alias("u"),
    ).filter(
        (F.col("f") != F.col("u"))
        | (F.col("f").isNull() != F.col("u").isNull())
    )
    rows = bad.limit(5).collect()
    assert not rows, f"fold vs unrolled diverged: {rows}"


def test_dot_norm_bit_identical_on_real_embeddings(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    a = emb.select(
        VX.as_double(F.col("embedding")).alias("v"), F.col("vec_id")
    )
    # pair each vector with a shifted copy of the corpus so dot sees
    # genuinely different operands
    b = a.select(
        (F.col("vec_id") + 1).alias("vec_id"), F.col("v").alias("w")
    )
    pairs = a.join(b, "vec_id")
    _assert_col_pair_equal(
        pairs,
        VX.dot(F.col("v"), F.col("w")),
        VX.dot(F.col("v"), F.col("w"), dim=DIM),
    )
    _assert_col_pair_equal(
        pairs,
        VX.sqdist(F.col("v"), F.col("w")),
        VX.sqdist(F.col("v"), F.col("w"), dim=DIM),
    )
    _assert_col_pair_equal(
        a, VX.norm(F.col("v")), VX.norm(F.col("v"), dim=DIM)
    )


def test_cosine_and_elementwise_bit_identical(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    a = emb.select(VX.as_double(F.col("embedding")).alias("v"), "vec_id")
    b = a.select((F.col("vec_id") + 3).alias("vec_id"), F.col("v").alias("w"))
    pairs = a.join(b, "vec_id")
    _assert_col_pair_equal(
        pairs,
        VX.cosine(F.col("v"), F.col("w")),
        VX.cosine(F.col("v"), F.col("w"), dim=DIM),
    )
    # array-producing forms: compare element-wise through string cast
    alpha = 0.25
    fn = lambda x, y: x + F.lit(alpha) * y  # noqa: E731
    _assert_col_pair_equal(
        pairs,
        F.concat_ws(",", VX.zip_map(F.col("v"), F.col("w"), fn).cast("array<string>")),
        F.concat_ws(
            ",", VX.zip_map(F.col("v"), F.col("w"), fn, dim=DIM).cast("array<string>")
        ),
    )
    nrm = VX.norm(F.col("v"))
    _assert_col_pair_equal(
        pairs,
        F.concat_ws(
            ",", VX.map_each(F.col("v"), lambda x: x / nrm).cast("array<string>")
        ),
        F.concat_ws(
            ",",
            VX.map_each(F.col("v"), lambda x: x / nrm, dim=DIM).cast("array<string>"),
        ),
    )


@pytest.mark.parametrize(
    "vec_a,vec_b",
    [
        # signed zeros: the 0.0 + x seed behavior must match the fold
        ([0.0, -0.0, 0.0, -0.0], [-0.0, -0.0, 0.0, 0.0]),
        # exact cancellation producing -0.0 sums inside the chain
        ([1.0, -1.0, -0.0, -0.0], [1.0, 1.0, 1.0, 1.0]),
        # magnitudes that exercise non-associativity if order drifted
        ([1e16, 1.0, -1e16, 1.0], [1.0, 1.0, 1.0, 1.0]),
        ([1e-300, 1e300, -1e300, 1e-300], [1e-300, 1.0, 1.0, 1.0]),
    ],
)
def test_dot_edge_vectors_bit_identical(spark, vec_a, vec_b):
    df = spark.createDataFrame(
        [(vec_a, vec_b)], "a array<double>, b array<double>"
    )
    _assert_col_pair_equal(
        df,
        VX.dot(F.col("a"), F.col("b")),
        VX.dot(F.col("a"), F.col("b"), dim=len(vec_a)),
    )
    _assert_col_pair_equal(
        df,
        VX.sqdist(F.col("a"), F.col("b")),
        VX.sqdist(F.col("a"), F.col("b"), dim=len(vec_a)),
    )
