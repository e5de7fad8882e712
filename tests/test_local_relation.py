"""values_df: JVM-side local relations must be bit-identical to
createDataFrame over the supported type scope, and must execute with no
Python lineage (LocalTableScan plan)."""

from __future__ import annotations

import math
import random
import struct

import pytest

from de_polars_spark.functions.local_relation import values_df


def _rows(df):
    return sorted(map(str, df.collect()))


def test_double_bit_exact_fuzz(spark):
    # raw 64-bit patterns -> doubles: the harshest round-trip corpus
    rng = random.Random(0xC0FFEE)
    vals = []
    while len(vals) < 500:
        v = struct.unpack("d", struct.pack("Q", rng.getrandbits(64)))[0]
        if not (math.isnan(v) or math.isinf(v)):
            vals.append(v)
    vals += [0.0, -0.0, 5e-324, -5e-324, 1.7976931348623157e308, 1e-300]
    rows = [(i, v) for i, v in enumerate(vals)]
    got = values_df(spark, rows, "i bigint, v double").collect()
    for (_, want), row in zip(rows, sorted(got, key=lambda r: r["i"])):
        assert struct.pack("d", want) == struct.pack("d", row["v"]), (
            want,
            row["v"],
        )


def test_special_doubles(spark):
    rows = [(0, float("nan")), (1, float("inf")), (2, float("-inf")), (3, None)]
    got = {r["i"]: r["v"] for r in values_df(spark, rows, "i int, v double").collect()}
    assert math.isnan(got[0])
    assert got[1] == float("inf")
    assert got[2] == float("-inf")
    assert got[3] is None


def test_string_escaping_roundtrip(spark):
    tricky = [
        "plain",
        "it's quoted",
        "back\\slash",
        "new\nline and\ttab",
        'double"quote',
        "unicode: héllo — 世界 🚀",
        "wind\\'up: mixed \\' sequence",
        "",
    ]
    rows = [(i, s) for i, s in enumerate(tricky)]
    reference = spark.createDataFrame(rows, "i int, s string")
    got = values_df(spark, rows, "i int, s string")
    assert _rows(got) == _rows(reference)


def test_nested_arrays_and_schema_match(spark):
    rows = [
        (1, [0.5, -0.25], [[1.0, 2.0], [3.0, 4.0]]),
        (2, [], None),
        (3, None, [[]]),
    ]
    schema = "id bigint, v array<double>, m array<array<double>>"
    reference = spark.createDataFrame(rows, schema)
    got = values_df(spark, rows, schema)
    # nullability may be TIGHTER (VALUES derives non-null from the data);
    # names and types must match exactly
    assert got.dtypes == reference.dtypes
    assert _rows(got) == _rows(reference)


def test_mixed_scalars_match_createdataframe(spark):
    rows = [
        (1, 2.5, "a", True, 7),
        (2, None, None, False, None),
        (-(2**62), -1e-9, "z", None, 0),
    ]
    schema = "a bigint, b double, c string, d boolean, e int"
    reference = spark.createDataFrame(rows, schema)
    got = values_df(spark, rows, schema)
    assert got.dtypes == reference.dtypes
    assert _rows(got) == _rows(reference)


def test_empty_rows_give_typed_empty_relation(spark):
    schema = "id bigint, v array<double>, s string"
    got = values_df(spark, [], schema)
    assert got.count() == 0
    assert got.dtypes == spark.createDataFrame([], schema).dtypes


def test_plan_is_jvm_local_scan(spark):
    df = values_df(spark, [(1, [0.5])], "id bigint, v array<double>")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    # the whole point: no Python evaluation anywhere in the plan
    assert "Python" not in plan
    assert "Batch" not in plan or "ArrowEvalPython" not in plan


def test_row_cap_guard(spark):
    with pytest.raises(ValueError, match="driver-state"):
        values_df(spark, [(i,) for i in range(11)], "i int", max_rows=10)


def test_bigint_range_guard(spark):
    # unbounded Python ints must fail up front, not as a parser error
    with pytest.raises(TypeError, match="BIGINT range"):
        values_df(spark, [(2**63,)], "v bigint")
    # boundary values pass
    rows = [(-(2**63),), (2**63 - 1,)]
    got = sorted(r["v"] for r in values_df(spark, rows, "v bigint").collect())
    assert got == [-(2**63), 2**63 - 1]


def test_unsupported_types_fail_loudly(spark):
    with pytest.raises(TypeError, match="use createDataFrame"):
        values_df(spark, [({"k": 1},)], "m map<string,int>")
    import numpy as np

    with pytest.raises(TypeError, match="cannot render"):
        values_df(spark, [(np.float32(1.5),)], "v double")


def test_row_arity_mismatch_fails_loudly(spark):
    """Rows longer than the schema would render extra VALUES columns the
    CAST projection silently drops; shorter rows mis-align — both must
    raise, as createDataFrame does (ADVICE r5)."""
    with pytest.raises(ValueError, match="row 0 has 2 values for 1"):
        values_df(spark, [(1, 2)], "i int")
    with pytest.raises(ValueError, match="row 1 has 1 values for 2"):
        values_df(spark, [(1, 2), (3,)], "a int, b int")
