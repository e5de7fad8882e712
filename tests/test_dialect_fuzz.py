"""Differential fuzz of the DuckDB→Spark dialect shim.

Random TYPED expression trees are rendered as DuckDB SQL, translated via
``translate_duckdb_sql``, executed on BOTH engines over the same parquet
(the ``part`` table at sf0.001, via a ``read_parquet('…')`` literal so
the path rewrite is exercised on every example), and compared with the
strict driver-mirror harness (``de_polars_spark.testing.compare`` — the
same byte-hash discipline as the grading gate).

Hand-written dialect tests check the rewrites we THOUGHT about; the
fuzzer's job is the interactions nobody wrote down (a fn-map rename
inside a lambda inside a CASE arm, ``||`` chains feeding list functions,
nullif-guarded division under coalesce, …).

Grammar constraints — each excludes a KNOWN engine divergence that is
not the shim's to fix (documented here so a future widening knows what
it is re-opening):

- int leaves are bounded (``% 997`` / small literals) and int ops capped
  at depth 3: DuckDB ERRORS on bigint overflow, non-ANSI Spark WRAPS.
- ``/`` is always rendered ``a / nullif(b, 0)``: double x/0 is ±Infinity
  in DuckDB but NULL in non-ANSI Spark.
- ``//`` operands are wrapped in abs(): DuckDB floors (-7//2 = -4),
  Spark's DIV truncates toward zero (-3).
- floor/ceil results are cast ``::BIGINT``: DuckDB returns DOUBLE,
  Spark returns BIGINT — same value, dtype-visible under the hash gate.
- regexp patterns are literal words: RE2 vs java.util.regex.
- no double→varchar casts: shortest-repr formatting algorithms differ.
- no date/timestamp leaves: the temporal rewrites (strftime, date_diff,
  epoch_*) have dedicated hand-written tests in test_dialect.py.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from de_polars_spark.engine.dialect import translate_duckdb_sql
from de_polars_spark.testing import compare

PART = os.path.join(
    os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"),
    "part.parquet",
)

# ------------------------------------------------------------------ #
# typed expression grammar: every strategy yields DuckDB SQL text of  #
# a known type; combinators keep both engines inside portable ground  #
# ------------------------------------------------------------------ #

# numeric literals in e-notation: `0.25` parses as DECIMAL in BOTH
# engines, but pandas receives DuckDB decimals as float64 and Spark
# decimals as object(Decimal) — dtype-visible drift in the strict
# harness that is a conversion artifact, not engine semantics. `0.25e0`
# is a true DOUBLE in both.
_INT_LEAVES = ["(p_partkey % 997)", "p_size", "7", "0", "13", "251"]
_NUM_LEAVES = ["p_retailprice", "(p_size * 1.5e0)", "0.25e0", "100.0e0", "-3.5e0"]
_STR_LEAVES = ["p_name", "p_type", "p_brand", "'plum'", "'STEEL fin'"]
_WORDS = ["plum", "steel", "of", "fin", "tan"]


def _ints(depth: int):
    leaf = st.sampled_from(_INT_LEAVES)
    if depth <= 0:
        return leaf
    sub = _ints(depth - 1)
    return st.one_of(
        leaf,
        st.tuples(sub, st.sampled_from(["+", "-", "*"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        # abs() on both operands: DuckDB // floors, Spark DIV truncates —
        # they only agree on non-negatives
        st.tuples(sub, sub).map(lambda t: f"(abs({t[0]}) // (abs({t[1]}) + 1))"),
        _strs(depth - 1).map(lambda s: f"length({s})"),
        _nums(depth - 1).map(lambda n: f"(floor({n}))::BIGINT"),
        _nums(depth - 1).map(lambda n: f"(ceil({n}))::BIGINT"),
    )


def _nums(depth: int):
    leaf = st.sampled_from(_NUM_LEAVES)
    if depth <= 0:
        return leaf
    sub = _nums(depth - 1)
    return st.one_of(
        leaf,
        st.tuples(sub, st.sampled_from(["+", "-", "*"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        # nullif guard: x/0 diverges (Infinity vs NULL) — x/NULL is NULL
        # in both engines
        st.tuples(sub, sub).map(lambda t: f"({t[0]} / nullif({t[1]}, 0))"),
        sub.map(lambda x: f"abs({x})"),
        st.tuples(sub, st.integers(0, 4)).map(lambda t: f"round({t[0]}, {t[1]})"),
        _ints(depth - 1).map(lambda i: f"({i})::DOUBLE"),
        st.tuples(_bools(depth - 1), sub, sub).map(
            lambda t: f"(CASE WHEN {t[0]} THEN {t[1]} ELSE {t[2]} END)"
        ),
        st.tuples(sub, st.sampled_from(_NUM_LEAVES)).map(
            lambda t: f"coalesce(nullif({t[0]}, 0), {t[1]})"
        ),
    )


def _strs(depth: int):
    leaf = st.sampled_from(_STR_LEAVES)
    if depth <= 0:
        return leaf
    sub = _strs(depth - 1)
    return st.one_of(
        leaf,
        sub.map(lambda s: f"upper({s})"),
        sub.map(lambda s: f"lower({s})"),
        sub.map(lambda s: f"trim({s})"),
        sub.map(lambda s: f"reverse({s})"),
        st.tuples(sub, st.integers(1, 5), st.integers(0, 8)).map(
            lambda t: f"substr({t[0]}, {t[1]}, {t[2]})"
        ),
        st.tuples(sub, sub).map(lambda t: f"({t[0]} || {t[1]})"),
        st.tuples(sub, st.sampled_from(_WORDS), st.sampled_from(_WORDS)).map(
            lambda t: f"replace({t[0]}, '{t[1]}', '{t[2]}')"
        ),
        st.tuples(_arrs(depth - 1), st.sampled_from(["-", ",", ""])).map(
            lambda t: f"array_to_string({t[0]}, '{t[1]}')"
        ),
        st.tuples(_bools(depth - 1), sub, sub).map(
            lambda t: f"(CASE WHEN {t[0]} THEN {t[1]} ELSE {t[2]} END)"
        ),
    )


def _arrs(depth: int):
    leaf = st.sampled_from(
        ["string_split(p_name, ' ')", "string_split(p_type, ' ')"]
    )
    if depth <= 0:
        return leaf
    sub = _arrs(depth - 1)
    return st.one_of(
        leaf,
        sub.map(lambda a: f"list_distinct({a})"),
        sub.map(lambda a: f"list_sort({a})"),
        st.tuples(sub, st.integers(1, 6)).map(
            lambda t: f"list_filter({t[0]}, x -> length(x) > {t[1]})"
        ),
        sub.map(lambda a: f"list_transform({a}, x -> upper(x))"),
    )


def _bools(depth: int):
    base = st.one_of(
        st.tuples(
            _nums(max(depth - 1, 0)),
            st.sampled_from(["<", "<=", ">", ">=", "=", "<>"]),
            _nums(max(depth - 1, 0)),
        ).map(lambda t: f"({t[0]} {t[1]} {t[2]})"),
        st.tuples(
            _strs(max(depth - 1, 0)), st.sampled_from(_WORDS)
        ).map(lambda t: f"({t[0]} LIKE '%{t[1]}%')"),
        st.tuples(_arrs(max(depth - 1, 0)), st.sampled_from(_WORDS)).map(
            lambda t: f"list_contains({t[0]}, '{t[1]}')"
        ),
        # literal-word pattern only: RE2 vs java.util.regex
        st.tuples(_strs(max(depth - 1, 0)), st.sampled_from(_WORDS)).map(
            lambda t: f"regexp_matches({t[0]}, '{t[1]}')"
        ),
    )
    if depth <= 0:
        return base
    sub = _bools(depth - 1)
    return st.one_of(
        base,
        st.tuples(sub, st.sampled_from(["AND", "OR"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        sub.map(lambda b: f"(NOT {b})"),
    )


def _scalar(depth: int):
    """Top-level column: scalar types only (the strict gate rejects
    arrays — the same rule the inventory queries live under).

    Int expressions are widened ``::BIGINT`` at the edge: intermediate
    int widths differ between the engines (Spark length() is INT,
    DuckDB's is BIGINT) — same values, dtype-visible in the harness."""
    return st.one_of(
        _nums(depth),
        _ints(depth).map(lambda i: f"({i})::BIGINT"),
        _strs(depth),
    )


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(exprs=st.lists(_scalar(3), min_size=6, max_size=10))
def test_dialect_fuzz_differential(spark, exprs):
    cols = ", ".join(f"{e} AS e{i}" for i, e in enumerate(exprs))
    sql = (
        f"SELECT p_partkey, {cols} "
        f"FROM read_parquet('{PART}') ORDER BY p_partkey"
    )
    duck = duckdb.connect().execute(sql).df()
    translated = translate_duckdb_sql(sql)
    got = spark.sql(translated).toPandas()
    problems = compare(got, duck)
    assert not problems, (
        f"dialect drift on:\n  {sql}\n→ {translated}\n" + "\n".join(problems)
    )


# ------------------------------------------------------------------ #
# QUALIFY / window fuzz: _rewrite_qualify is a token-scanner rewrite   #
# (Spark has no QUALIFY) — compose random window functions, qualify   #
# predicates, and outer clauses around it. Every window ORDER BY ends #
# in the unique p_partkey so both engines rank deterministically.     #
# ------------------------------------------------------------------ #

_WINDOWS = [
    "row_number() OVER (PARTITION BY p_brand ORDER BY p_partkey)",
    "row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)",
    "rank() OVER (PARTITION BY p_brand ORDER BY p_size, p_partkey)",
    "dense_rank() OVER (ORDER BY p_size, p_partkey)",
    "sum(p_size) OVER (PARTITION BY p_brand)",
    "count(*) OVER (PARTITION BY p_type)",
    "lag(p_size, 1) OVER (PARTITION BY p_brand ORDER BY p_partkey)",
    "min(p_partkey) OVER (PARTITION BY p_brand)",
]


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    wins=st.lists(st.sampled_from(_WINDOWS), min_size=1, max_size=3, unique=True),
    qualify_on_alias=st.booleans(),
    k=st.integers(1, 4),
    outer_limit=st.booleans(),
)
def test_qualify_fuzz_differential(spark, wins, qualify_on_alias, k, outer_limit):
    # ::BIGINT on every window output: DuckDB's sum(int) is HUGEINT
    # (pandas float64) while Spark's is BIGINT — dtype-conversion drift,
    # not semantics
    cols = ", ".join(f"({w})::BIGINT AS w{i}" for i, w in enumerate(wins))
    # qualify either repeats the window expression or references its
    # alias (exercising Spark's lateral alias resolution post-injection)
    pred = f"w0 <= {k}" if qualify_on_alias else f"{wins[0]} <= {k}"
    tail = f" ORDER BY p_partkey LIMIT {40 * k}" if outer_limit else " ORDER BY p_partkey"
    sql = (
        f"SELECT p_partkey, p_brand, {cols} "
        f"FROM read_parquet('{PART}') QUALIFY {pred}{tail}"
    )
    duck = duckdb.connect().execute(sql).df()
    translated = translate_duckdb_sql(sql)
    got = spark.sql(translated).toPandas()
    # int-width drift between engines (rank/count widths) is a pandas
    # conversion artifact — align to int64 before the strict compare
    for frame in (got, duck):
        for c in frame.columns:
            if str(frame[c].dtype).startswith("int"):
                frame[c] = frame[c].astype("int64")
    problems = compare(got, duck)
    assert not problems, (
        f"qualify drift on:\n  {sql}\n→ {translated}\n" + "\n".join(problems)
    )


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    use_all=st.booleans(),
    # integer-typed aggregates only: float→int :: casts hit the known
    # round(DuckDB)-vs-truncate(Spark) cast divergence, excluded suite-wide
    agg=st.sampled_from(["count(*)", "sum(p_size)", "min(p_partkey)"]),
    k=st.integers(1, 3),
)
def test_qualify_grouped_body_differential(spark, use_all, agg, k):
    """QUALIFY over a grouped body, explicit keys and GROUP BY ALL
    (ADVICE r5). Explicit keys: injection form, differential vs DuckDB
    with the predicate referencing the aggregate expression directly.
    GROUP BY ALL: DuckDB itself REFUSES the combination ('Combining
    QUALIFY with GROUP BY ALL is not supported yet', Binder Error), so
    there is no oracle — the shim's wrapper fallback is a strict
    SUPERSET of DuckDB here, checked against the explicit-key result
    Spark-vs-Spark instead."""
    explicit_sql = (
        f"SELECT p_brand, ({agg})::BIGINT AS n "
        f"FROM read_parquet('{PART}') GROUP BY p_brand "
        f"QUALIFY row_number() OVER (ORDER BY {agg} DESC, p_brand) <= {k} "
        f"ORDER BY p_brand"
    )
    if use_all:
        all_sql = explicit_sql.replace("GROUP BY p_brand", "GROUP BY ALL").replace(
            f"ORDER BY {agg} DESC", "ORDER BY n DESC"
        )
        with pytest.raises(duckdb.BinderException, match="GROUP BY ALL"):
            duckdb.connect().execute(all_sql)
        translated = translate_duckdb_sql(all_sql)
        assert "__qb" in translated  # wrapper form taken
        got = spark.sql(translated).toPandas()
        want = spark.sql(translate_duckdb_sql(explicit_sql)).toPandas()
        problems = compare(got, want)
        assert not problems, (
            f"GROUP BY ALL wrapper drift on:\n  {all_sql}\n→ {translated}\n"
            + "\n".join(problems)
        )
        return
    duck = duckdb.connect().execute(explicit_sql).df()
    translated = translate_duckdb_sql(explicit_sql)
    got = spark.sql(translated).toPandas()
    for frame in (got, duck):
        for c in frame.columns:
            if str(frame[c].dtype).startswith("int"):
                frame[c] = frame[c].astype("int64")
    problems = compare(got, duck)
    assert not problems, (
        f"grouped-qualify drift on:\n  {explicit_sql}\n→ {translated}\n"
        + "\n".join(problems)
    )


# ------------------------------------------------------------------ #
# Temporal fuzz: strftime (format-token map), date_diff (boundary-    #
# crossing semantics preserved by operand truncation), extraction     #
# functions, and ::DATE casts — over the orders timestamps plus fixed #
# literals so both operand shapes (column, literal) appear on both    #
# sides of every rewrite.                                             #
# ------------------------------------------------------------------ #

ORDERS = os.path.join(
    os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"),
    "orders.parquet",
)

_TS = ["o_orderdate", "TIMESTAMP '2024-01-15 12:30:00'", "TIMESTAMP '1995-06-17 00:00:00'"]
_FMTS = ["%Y", "%m", "%d", "%Y-%m", "%Y-%m-%d", "%H"]
_UNITS = ["year", "quarter", "month", "week", "day", "hour", "minute", "second"]


def _temporal():
    ts = st.sampled_from(_TS)
    return st.one_of(
        st.tuples(ts, st.sampled_from(_FMTS)).map(
            lambda t: f"strftime({t[0]}, '{t[1]}')"
        ),
        # strptime inverts strftime: render then reparse with a FULL
        # round-trip format, compare as ISO text (timestamp dtype would
        # hit the pandas object/datetime64 conversion artifact)
        ts.map(
            lambda c: "((strptime(strftime("
            f"{c}, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S'))::DATE)::VARCHAR"
        ),
        st.tuples(st.sampled_from(_UNITS), ts, ts).map(
            lambda t: f"(date_diff('{t[0]}', {t[1]}, {t[2]}))::BIGINT"
        ),
        st.tuples(st.sampled_from(["year", "month", "day", "hour"]), ts).map(
            lambda t: f"({t[0]}({t[1]}))::BIGINT"
        ),
        # ::VARCHAR on top of ::DATE: both engines print ISO dates, while
        # raw DATE reaches pandas as object (Spark) vs datetime64 (DuckDB)
        ts.map(lambda c: f"(({c})::DATE)::VARCHAR"),
        st.tuples(ts, ts).map(
            lambda t: f"(CASE WHEN {t[0]} < {t[1]} THEN 'lt' ELSE 'ge' END)"
        ),
    )


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(exprs=st.lists(_temporal(), min_size=6, max_size=10))
def test_temporal_fuzz_differential(spark, exprs):
    cols = ", ".join(f"{e} AS e{i}" for i, e in enumerate(exprs))
    sql = (
        f"SELECT o_orderkey, {cols} "
        f"FROM read_parquet('{ORDERS}') ORDER BY o_orderkey"
    )
    duck = duckdb.connect().execute(sql).df()
    translated = translate_duckdb_sql(sql)
    got = spark.sql(translated).toPandas()
    problems = compare(got, duck)
    assert not problems, (
        f"temporal drift on:\n  {sql}\n→ {translated}\n" + "\n".join(problems)
    )


# ------------------------------------------------------------------ #
# Aggregation fuzz: GROUP BY ALL / ordinals / explicit keys, HAVING,  #
# DISTINCT counts — the clause plumbing around expressions. Double    #
# sums go through DECIMAL(18,2) then ::DOUBLE (exact in both engines, #
# order-free — the same DSUM discipline the inventory oracles use);   #
# raw double sums would diverge in the low bits by reduction order.   #
# ------------------------------------------------------------------ #

_KEYS = ["p_brand", "p_type", "substr(p_brand, 1, 6)", "upper(p_type)"]
_AGGS = [
    "(count(*))::BIGINT",
    "(count(DISTINCT p_size))::BIGINT",
    "(sum(p_size))::BIGINT",
    "(min(p_size))::BIGINT",
    "(max(p_size))::BIGINT",
    "min(p_name)",
    "max(p_type)",
    "(sum(CASE WHEN p_size > 25 THEN 1 ELSE 0 END))::BIGINT",
    "(sum((p_retailprice)::DECIMAL(18,2)))::DOUBLE",
]


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(st.sampled_from(_KEYS), min_size=1, max_size=2, unique=True),
    aggs=st.lists(st.sampled_from(_AGGS), min_size=1, max_size=4, unique=True),
    group_style=st.sampled_from(["ALL", "ordinal", "explicit"]),
    having_min=st.one_of(st.none(), st.integers(1, 4)),
)
def test_aggregation_fuzz_differential(spark, keys, aggs, group_style, having_min):
    key_cols = ", ".join(f"{k} AS k{i}" for i, k in enumerate(keys))
    agg_cols = ", ".join(f"{a} AS a{i}" for i, a in enumerate(aggs))
    if group_style == "ALL":
        group = "ALL"
    elif group_style == "ordinal":
        group = ", ".join(str(i + 1) for i in range(len(keys)))
    else:
        group = ", ".join(keys)
    having = f" HAVING count(*) >= {having_min}" if having_min else ""
    order = ", ".join(str(i + 1) for i in range(len(keys)))
    sql = (
        f"SELECT {key_cols}, {agg_cols} FROM read_parquet('{PART}') "
        f"GROUP BY {group}{having} ORDER BY {order}"
    )
    duck = duckdb.connect().execute(sql).df()
    translated = translate_duckdb_sql(sql)
    got = spark.sql(translated).toPandas()
    problems = compare(got, duck)
    assert not problems, (
        f"aggregation drift on:\n  {sql}\n→ {translated}\n" + "\n".join(problems)
    )


# ------------------------------------------------------------------ #
# Join fuzz: join-type spellings (incl. DuckDB's bare SEMI/ANTI,      #
# which Spark 4 also parses), ON predicates with extra conditions,    #
# and NULL-producing outer sides — the clause plumbing between two    #
# read_parquet scans.                                                 #
# ------------------------------------------------------------------ #

CUSTOMER = os.path.join(
    os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"),
    "customer.parquet",
)
ORDERS_T = ORDERS  # alias for readability in the join template

_JOIN_TYPES = ["JOIN", "LEFT JOIN", "SEMI JOIN", "ANTI JOIN"]
_EXTRA_ON = [
    "",
    " AND o.o_totalprice > 50000.0e0",
    " AND o.o_orderstatus = 'O'",
    " AND (c.c_custkey % 3) = 0",
]


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    jt=st.sampled_from(_JOIN_TYPES),
    extra=st.sampled_from(_EXTRA_ON),
    agg_side=st.booleans(),
)
def test_join_fuzz_differential(spark, jt, extra, agg_side):
    semi_anti = jt in ("SEMI JOIN", "ANTI JOIN")
    if semi_anti or agg_side:
        # semi/anti expose only the left side; aggregate form groups it
        proj = "c.c_custkey, (count(*))::BIGINT AS n"
        tail = " GROUP BY 1 ORDER BY 1"
    else:
        # row form: right side may be NULL under LEFT JOIN — order by a
        # full deterministic key set
        proj = "c.c_custkey, o.o_orderkey, o.o_orderstatus"
        tail = " ORDER BY c.c_custkey, o.o_orderkey"
    sql = (
        f"SELECT {proj} FROM read_parquet('{CUSTOMER}') c "
        f"{jt} read_parquet('{ORDERS_T}') o "
        f"ON c.c_custkey = o.o_custkey{'' if semi_anti else extra}{tail}"
    )
    duck = duckdb.connect().execute(sql).df()
    translated = translate_duckdb_sql(sql)
    got = spark.sql(translated).toPandas()
    # LEFT JOIN NULLs push int columns to float64 on one side only when
    # the other engine had no NULLs in the sampled rows — align widths
    for frame in (got, duck):
        for c in frame.columns:
            if str(frame[c].dtype).startswith("int"):
                frame[c] = frame[c].astype("int64")
    problems = compare(got, duck)
    assert not problems, (
        f"join drift on:\n  {sql}\n→ {translated}\n" + "\n".join(problems)
    )


# ------------------------------------------------------------------ #
# Composition fuzz: CTEs, set operators, nested subqueries, QUALIFY   #
# at depth — the token-scanner rewrites (QUALIFY scope detection,     #
# EXCLUDE, path refs) are the shim's riskiest code, and their bugs    #
# live in COMPOSITION, not in single clauses.                         #
# ------------------------------------------------------------------ #

_SET_OPS = ["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]
_INNER_FILTERS = ["p_size > 25", "p_size > 45", "p_brand LIKE '%2%'", "p_size < 10"]


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    setop=st.sampled_from(_SET_OPS),
    f1=st.sampled_from(_INNER_FILTERS),
    f2=st.sampled_from(_INNER_FILTERS),
    use_cte=st.booleans(),
    qualify_k=st.integers(1, 3),
)
def test_composition_fuzz_differential(spark, setop, f1, f2, use_cte, qualify_k):
    inner = (
        f"SELECT p_brand, p_partkey, p_size FROM read_parquet('{PART}') "
        f"QUALIFY row_number() OVER (PARTITION BY p_brand "
        f"ORDER BY p_size, p_partkey) <= {qualify_k}"
    )
    if use_cte:
        sql = (
            f"WITH top AS ({inner}) "
            f"SELECT p_brand FROM top WHERE {f1} OR p_partkey >= 0 "
            f"{setop} "
            f"SELECT p_brand FROM read_parquet('{PART}') WHERE {f2} "
            f"ORDER BY 1"
        )
    else:
        sql = (
            f"SELECT p_brand FROM ({inner}) q WHERE p_partkey % 2 = 0 "
            f"{setop} "
            f"SELECT p_brand FROM read_parquet('{PART}') WHERE {f2} "
            f"ORDER BY 1"
        )
    duck = duckdb.connect().execute(sql).df()
    translated = translate_duckdb_sql(sql)
    got = spark.sql(translated).toPandas()
    problems = compare(got, duck)
    assert not problems, (
        f"composition drift on:\n  {sql}\n→ {translated}\n" + "\n".join(problems)
    )


# ------------------------------------------------------------------ #
# Subquery-predicate fuzz: IN / EXISTS / NOT EXISTS / correlated      #
# scalar subqueries — Catalyst plans these as semi/anti/scalar        #
# subquery joins; the shim must pass the shapes through intact.       #
# Thresholds use EXACT aggregates (count/min/max) only: a float avg   #
# threshold could legitimately flip rows that sit within reduction-   #
# order epsilon of the mean.                                          #
# ------------------------------------------------------------------ #

_SUBQ_PREDS = [
    "c_custkey IN (SELECT o_custkey FROM {orders} WHERE o_totalprice > 100000.0e0)",
    "c_custkey NOT IN (SELECT o_custkey FROM {orders} WHERE o_orderstatus = 'F')",
    "EXISTS (SELECT 1 FROM {orders} o WHERE o.o_custkey = c.c_custkey "
    "AND o.o_orderpriority LIKE '1%')",
    "NOT EXISTS (SELECT 1 FROM {orders} o WHERE o.o_custkey = c.c_custkey)",
    "c_acctbal > (SELECT max(c_acctbal) FROM {customer}) * 0.5e0",
]


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    preds=st.lists(st.sampled_from(_SUBQ_PREDS), min_size=1, max_size=2, unique=True),
    conj=st.sampled_from(["AND", "OR"]),
    with_count=st.booleans(),
)
def test_subquery_fuzz_differential(spark, preds, conj, with_count):
    orders = f"read_parquet('{ORDERS}')"
    customer = f"read_parquet('{CUSTOMER}')"
    where = f" {conj} ".join(
        f"({p.format(orders=orders, customer=customer)})" for p in preds
    )
    count_col = (
        f", (SELECT count(*)::BIGINT FROM {orders} o "
        f"WHERE o.o_custkey = c.c_custkey) AS n_orders"
        if with_count
        else ""
    )
    sql = (
        f"SELECT c_custkey{count_col} FROM {customer} c "
        f"WHERE {where} ORDER BY 1"
    )
    duck = duckdb.connect().execute(sql).df()
    translated = translate_duckdb_sql(sql)
    got = spark.sql(translated).toPandas()
    problems = compare(got, duck)
    assert not problems, (
        f"subquery drift on:\n  {sql}\n→ {translated}\n" + "\n".join(problems)
    )


# ------------------------------------------------------------------ #
# Window-frame fuzz: ROWS/RANGE BETWEEN bounds, frame-dependent       #
# functions (first_value, rolling sum/min/count), lead with default — #
# frame semantics are identical between the engines, and every window #
# ORDER BY ends in the unique p_partkey for determinism.              #
# ------------------------------------------------------------------ #

_FRAME_FNS = ["sum(p_size)", "min(p_size)", "max(p_size)", "count(*)"]
_FRAMES = [
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
    "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING",
    "RANGE BETWEEN 5 PRECEDING AND CURRENT ROW",
]


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fn=st.sampled_from(_FRAME_FNS),
    frame=st.sampled_from(_FRAMES),
    partitioned=st.booleans(),
    extra=st.sampled_from(
        [
            "",
            ", first_value(p_type) OVER (PARTITION BY p_brand ORDER BY "
            "p_partkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv",
            ", (lead(p_size, 2, -1) OVER (PARTITION BY p_brand ORDER BY "
            "p_partkey))::BIGINT AS l2",
        ]
    ),
)
def test_window_frame_fuzz_differential(spark, fn, frame, partitioned, extra):
    # RANGE frames need a numeric ORDER BY key; p_partkey is unique so
    # both ROWS and RANGE stay deterministic
    part = "PARTITION BY p_brand " if partitioned else ""
    sql = (
        f"SELECT p_partkey, ({fn} OVER ({part}ORDER BY p_partkey "
        f"{frame}))::BIGINT AS w{extra} "
        f"FROM read_parquet('{PART}') ORDER BY 1"
    )
    duck = duckdb.connect().execute(sql).df()
    translated = translate_duckdb_sql(sql)
    got = spark.sql(translated).toPandas()
    problems = compare(got, duck)
    assert not problems, (
        f"window-frame drift on:\n  {sql}\n→ {translated}\n" + "\n".join(problems)
    )


def test_fuzz_grammar_smoke(spark):
    """One fixed deep expression per family — a fast deterministic
    canary so a grammar regression fails loudly outside hypothesis."""
    sql = (
        "SELECT p_partkey, "
        "round(p_retailprice / nullif(p_size, 0), 3) AS e0, "
        "(abs((p_partkey % 997)) // (abs(p_size) + 1)) AS e1, "
        "array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), '-') AS e2, "
        "(CASE WHEN regexp_matches(p_type, 'STEEL') THEN upper(p_brand) "
        " ELSE reverse(p_brand) END) AS e3, "
        "(floor(p_retailprice))::BIGINT AS e4, "
        "length(array_to_string(list_filter(string_split(p_name, ' '), "
        "x -> length(x) > 3), ',')) AS e5 "
        f"FROM read_parquet('{PART}') ORDER BY p_partkey"
    )
    duck = duckdb.connect().execute(sql).df()
    got = spark.sql(translate_duckdb_sql(sql)).toPandas()
    assert not compare(got, duck)


# ------------------------------------------------------------------ #
# Surface 9: literal-content protection. The pre-tokenization         #
# rewrites (array_to_string, strftime/strptime, date_diff, the        #
# cast-anchored VARCHAR pass) must never alter text INSIDE a string   #
# literal even when that text looks exactly like a rewrite target     #
# (ADVICE r5; guarded by _inside_literal / _rewrite_varchar_cast).    #
# Each case pairs a booby-trapped literal with a REAL rewrite in the  #
# same statement: the literal must survive translation verbatim AND   #
# both engines must agree on every value.                             #
# ------------------------------------------------------------------ #

_TRAP_LITERALS = [
    "see array_to_string(a, b) here",
    "strptime(x, '%Y') inside",
    "strftime(ts, '%Y-%m') inside",
    "date_diff('day', a, b) text",
    "CAST(x AS VARCHAR) quoted",
    "also x::date and y::TEXT",
    "SELECT 1 AS text) trailing",
    "read_parquet('nope.parquet')",
    "a QUALIFY row_number() OVER ()",
]
_REAL_REWRITES = [
    ("array_to_string(string_split(p_name, ' '), '-')", "string"),
    ("strptime('2024-01-15', '%Y-%m-%d')::DATE::VARCHAR", "string"),
    ("date_diff('day', DATE '2024-01-01', o_orderdate::DATE)::BIGINT", "int"),
    ("CAST(o_orderkey AS VARCHAR)", "string"),
]


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lit=st.sampled_from(_TRAP_LITERALS),
    real=st.sampled_from(range(len(_REAL_REWRITES))),
)
def test_literal_protection_fuzz(spark, lit, real):
    expr, _ = _REAL_REWRITES[real]
    esc = lit.replace("'", "''")
    if "p_name" in expr:
        src, key = PART, "p_partkey"
    else:
        src, key = ORDERS, "o_orderkey"
    sql = (
        f"SELECT {key}, '{esc}' AS lit, {expr} AS v "
        f"FROM read_parquet('{src}') ORDER BY {key} LIMIT 50"
    )
    translated = translate_duckdb_sql(sql)
    assert f"'{esc}'" in translated, (
        f"literal altered by translation:\n  {sql}\n→ {translated}"
    )
    duck = duckdb.connect().execute(sql).df()
    got = spark.sql(translated).toPandas()
    problems = compare(got, duck)
    assert not problems, (
        f"literal-protection drift on:\n  {sql}\n→ {translated}\n"
        + "\n".join(problems)
    )
