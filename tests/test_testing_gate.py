"""Meta-tests for the strict comparison gate (de_polars_spark/testing.py).

The whole correctness story leans on ``compare`` being at least as
strict as the driver's hash gate — every drift class that burned a
round (r1: int-vs-float dtype; r2: HUGEINT decimal objects; the
decimal-vs-double rendering drift the PQ queries hit in r4) must be
CAUGHT here, and benign container/order differences must pass. No
Spark session needed: the gate compares pandas frames.
"""

from __future__ import annotations

from decimal import Decimal

import numpy as np
import pandas as pd

import pytest

from de_polars_spark.testing import NonScalarOutputError, compare, value_hash


def test_identical_frames_pass():
    a = pd.DataFrame({"k": [1, 2], "v": [0.5, 1.5]})
    assert compare(a, a.copy()) == []


def test_row_and_column_order_are_canonicalized():
    a = pd.DataFrame({"k": [1, 2], "v": [10.0, 20.0]})
    b = pd.DataFrame({"v": [20.0, 10.0], "k": [2, 1]})
    assert compare(a, b) == []
    assert value_hash(a) == value_hash(b)


def test_non_scalar_output_cells_are_rejected():
    # the r4 class: the driver's canonicalizer dies on array cells
    # (inverted_index was the only red row), so the local mirror must
    # REJECT them loudly instead of stringifying them into a pass
    a = pd.DataFrame({"k": [1], "arr": [[1.0, 2.0]]})
    b = pd.DataFrame({"k": [1], "arr": [np.array([1.0, 2.0])]})
    with pytest.raises(NonScalarOutputError):
        compare(a, b)


def test_value_drift_is_caught():
    a = pd.DataFrame({"k": [1], "v": [1.0]})
    b = pd.DataFrame({"k": [1], "v": [1.0000001]})
    assert any("v" in p for p in compare(a, b))


def test_row_count_drift_is_caught():
    a = pd.DataFrame({"k": [1, 2]})
    b = pd.DataFrame({"k": [1]})
    assert compare(a, b)


def test_int_vs_float_dtype_drift_is_caught():
    # the r1 class: 123 (BIGINT) vs 123.0 (DOUBLE) hash differently even
    # though a tolerance compare calls them equal
    a = pd.DataFrame({"v": pd.array([123, 456], dtype="int64")})
    b = pd.DataFrame({"v": [123.0, 456.0]})
    problems = compare(a, b)
    assert any("strict hash" in p or "rows differ" in p for p in problems)


def test_decimal_object_vs_float_rendering_drift_is_caught():
    # the r4 class: Spark DecimalType surfaces as Decimal('0.900000')
    # (object dtype) while the DuckDB fetch gives float64 0.9 — equal in
    # value, different bytes under the driver's hash
    a = pd.DataFrame({"v": [Decimal("0.900000"), Decimal("1.250000")]})
    b = pd.DataFrame({"v": [0.9, 1.25]})
    problems = compare(a, b)
    assert any("strict hash" in p for p in problems)


def test_null_vs_value_is_caught():
    a = pd.DataFrame({"v": [1.0, None]})
    b = pd.DataFrame({"v": [1.0, 2.0]})
    assert compare(a, b)


def test_column_name_drift_is_caught():
    a = pd.DataFrame({"sum_qty": [1.0]})
    b = pd.DataFrame({"sum(l_quantity)": [1.0]})
    assert any("columns differ" in p for p in compare(a, b))
