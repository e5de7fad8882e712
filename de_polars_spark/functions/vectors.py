"""Vector math as JVM-side column expressions.

Two forms, bit-identical results:

- **Fold form** (``dim=None``): built from higher-order functions
  (``zip_with`` / ``aggregate`` / ``transform``). ``aggregate`` is a
  sequential left fold, so double sums are order-deterministic
  (verified bit-identical to DuckDB's ``list_dot_product`` on the test
  embeddings). BUT higher-order-function lambdas evaluate INTERPRETED,
  outside whole-stage codegen — Spark's ``HigherOrderFunction``
  expressions are ``CodegenFallback`` — so every array element pays an
  interpreted lambda invocation plus (for ``zip_with``) an intermediate
  array allocation. The repo measured this class of cost twice before
  (n-gram shingles ~5x, quantile bucket assignment 6-8x).
- **Unrolled form** (``dim=<static length>``): the same arithmetic as
  an explicit expression chain over ``element_at`` — fully
  whole-stage-codegen'd, no lambda dispatch, no intermediate arrays.
  The summation chain starts from ``lit(0.0)`` and adds terms in
  ascending dimension order, i.e. EXACTLY the fold's IEEE operation
  sequence (including the signed-zero behavior of the ``0.0 + x``
  seed), so results are bit-identical — asserted by
  ``tests/test_vector_unroll.py`` over the real test embeddings.

``dim`` is the CALLER'S CONTRACT that every vector has exactly that
many elements (the fixture embeddings are fixed 64-d). Under ANSI mode
``element_at`` raises on an out-of-range index, so a wrong ``dim``
fails loudly rather than silently.

Inputs are ``array<float>`` or ``array<double>``; cast to double FIRST
(``as_double``) so products are computed in double precision — multiplying
two floats in Spark yields a float, which would diverge from any
double-precision oracle.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    # a Cast to array<double> is the same element-wise float->double
    # widening as transform(x -> x.cast("double")) but runs in codegen
    # (ArrayTransform's lambda evaluates interpreted)
    return vec.cast("array<double>")


def _fold_sum(terms: list[Column]) -> Column:
    """Left-fold sum seeded with ``lit(0.0)`` — the exact IEEE operation
    order of ``F.aggregate(arr, lit(0.0), acc + x)``."""
    s: Column = F.lit(0.0)
    for t in terms:
        s = s + t
    return s


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential-fold dot product; ``dim`` unrolls it into codegen."""
    if dim is None:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
    return _fold_sum(
        [F.element_at(a, i) * F.element_at(b, i) for i in range(1, dim + 1)]
    )


def sqdist(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential-fold squared L2 distance; ``dim`` unrolls it."""
    if dim is None:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    terms = []
    for i in range(1, dim + 1):
        d = F.element_at(a, i) - F.element_at(b, i)
        terms.append(d * d)
    return _fold_sum(terms)


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def zip_map(
    a: Column, b: Column, fn: Callable[[Column, Column], Column], dim: int | None = None
) -> Column:
    """Element-wise combine of two arrays; ``dim`` builds the result as
    an explicit ``F.array`` of codegen'd terms instead of an interpreted
    ``zip_with`` lambda. Same values in the same positions."""
    if dim is None:
        return F.zip_with(a, b, fn)
    return F.array(
        *[fn(F.element_at(a, i), F.element_at(b, i)) for i in range(1, dim + 1)]
    )


def map_each(
    a: Column, fn: Callable[[Column], Column], dim: int | None = None
) -> Column:
    """Element-wise map; ``dim`` unrolls the interpreted ``transform``."""
    if dim is None:
        return F.transform(a, fn)
    return F.array(*[fn(F.element_at(a, i)) for i in range(1, dim + 1)])


def sign_bucket(vec: Column, dims: list[int]) -> Column:
    """Cheap LSH bucket id: concatenated sign bits of chosen dimensions.

    A deterministic stand-in for random-hyperplane LSH: unit-norm-ish
    embeddings hashed on the sign of ``len(dims)`` coordinates give
    2^len(dims) buckets; near-identical vectors land in the same bucket.
    ``dims`` are 1-based (element_at semantics).
    """
    bits = [
        F.when(F.element_at(vec, d) > 0, F.lit("1")).otherwise(F.lit("0"))
        for d in dims
    ]
    return F.concat(*bits)
