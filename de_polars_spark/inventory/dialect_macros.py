"""Two-dialect SQL macro expansion.

Most inventory queries are written once in a common SQL subset plus a few
macros for the spots where Spark SQL and DuckDB genuinely diverge; the
macro expander renders the query for either engine so the Spark plan and
the DuckDB oracle always implement the same computation.

Macros take balanced-paren arguments and may nest.
"""

from __future__ import annotations

#: macro name -> dialect -> format template ("*" = same in both)
MACROS: dict[str, dict[str, str]] = {
    # month / day bucket as a plain string (DuckDB date_trunc yields DATE,
    # Spark yields TIMESTAMP — strings hash identically in both)
    "MONTH_STR": {
        "spark": "date_format({0}, 'yyyy-MM')",
        "duckdb": "strftime({0}, '%Y-%m')",
    },
    "DAY_STR": {
        "spark": "date_format({0}, 'yyyy-MM-dd')",
        "duckdb": "strftime({0}, '%Y-%m-%d')",
    },
    # order-independent float SUM: exact decimal accumulation, double out.
    # Scale 6 is deliberate: raw cost doubles have long (16-17 digit)
    # shortest decimal representations, so rounding at 1e-6 never lands on
    # an exact decimal tie — where Spark (HALF_UP on the shortest repr) and
    # DuckDB (round-down on ties) disagree. A higher scale (e.g. 38,12 per
    # micro-line-item concerns) moves the rounding digit into the tail of
    # the repr where ties become possible; the 1e-6 quantization is the
    # accepted semantic difference from the reference's plain double SUM.
    "DSUM": {"*": "CAST(SUM(CAST({0} AS DECIMAL(38,6))) AS DOUBLE)"},
    # order-independent AVG derived from the exact sum
    "DAVG": {"*": "CAST(SUM(CAST({0} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({0})"},
    # decimal-typed sum (no double round-trip): feeds exact decimal
    # arithmetic downstream (see views/kpi.py potential-savings chain).
    # (20,6) keeps multiply results well under precision 38 in both engines.
    "DSUMQ": {"*": "CAST(SUM(CAST({0} AS DECIMAL(38,6))) AS DECIMAL(20,6))"},
    # sum of already-decimal scale-8 money columns: cast is exact (no
    # rounding), so Spark and DuckDB cannot diverge; double only at the end.
    "DSUM8": {"*": "CAST(SUM(CAST({0} AS DECIMAL(38,8))) AS DOUBLE)"},
    # exact decimal product of a scale-6 money value and a <=2-decimal
    # factor literal: (20,6) x (p,2) -> scale-8 decimal, exact in both
    # engines (no double intermediate, no rounding, hence no tie-breaking).
    "DMUL": {"*": "(CAST({0} AS DECIMAL(20,6)) * {1})"},
    # normalize a money expression to DECIMAL(24,8) (exact for values
    # < 1e16; all branch types here are scale <= 8 so the cast never rounds)
    "MONEY8": {"*": "CAST({0} AS DECIMAL(24,8))"},
    # whole days from {1} to {0} as an integer (Spark's DATE minus DATE
    # yields INTERVAL DAY; DuckDB's yields BIGINT — macro pins integer)
    "DAYS_BETWEEN": {
        "spark": "datediff(CAST({0} AS DATE), CAST({1} AS DATE))",
        "duckdb": "(CAST({0} AS DATE) - CAST({1} AS DATE))",
    },
    # hex-string (md5 prefix) -> BIGINT
    "HEX2INT": {
        "spark": "CAST(conv({0}, 16, 10) AS BIGINT)",
        "duckdb": "CAST('0x' || ({0}) AS BIGINT)",
    },
    # 60-bit integer hash of a string expression
    "HASH60": {
        "spark": "CAST(conv(substring(md5({0}), 1, 15), 16, 10) AS BIGINT)",
        "duckdb": "CAST('0x' || substring(md5({0}), 1, 15) AS BIGINT)",
    },
    "JSON_STR": {
        "spark": "get_json_object({0}, {1})",
        "duckdb": "json_extract_string({0}, {1})",
    },
    # whitespace tokens with empties dropped -> array<string>
    "TOKENS": {
        "spark": "filter(split({0}, ' '), x -> x <> '')",
        "duckdb": "list_filter(string_split({0}, ' '), x -> x <> '')",
    },
    "ARRAY_LEN": {"spark": "size({0})", "duckdb": "len({0})"},
    "ARRAY_DISTINCT": {"spark": "array_distinct({0})", "duckdb": "list_distinct({0})"},
    "ARRAY_JOIN": {"spark": "array_join({0}, {1})", "duckdb": "array_to_string({0}, {1})"},
    "REGEXP_ALL": {
        "spark": "regexp_extract_all({0}, {1}, 0)",
        "duckdb": "regexp_extract_all({0}, {1})",
    },
    "BITAND1": {"spark": "(({0}) & 1)", "duckdb": "(({0}) & 1)"},
    "BITAND": {"*": "(({0}) & ({1}))"},
    "SHIFTR": {"spark": "shiftright({0}, {1})", "duckdb": "(({0}) >> ({1}))"},
    "SHIFTL": {
        "spark": "shiftleft(CAST({0} AS BIGINT), {1})",
        "duckdb": "(CAST({0} AS BIGINT) << ({1}))",
    },
    # integer division (DuckDB '/' on ints is float division)
    "IDIV": {"spark": "CAST(({0}) / ({1}) AS BIGINT)", "duckdb": "(({0}) // ({1}))"},
    # defined here (not injected by sibling modules) so rendering never
    # depends on import order (ADVICE r1)
    "TO_STR": {"spark": "CAST({0} AS STRING)", "duckdb": "CAST({0} AS VARCHAR)"},
    "HOUR_STR": {
        "spark": "date_format({0}, 'yyyy-MM-dd HH')",
        "duckdb": "strftime({0}, '%Y-%m-%d %H')",
    },
    # exact interpolated percentile (both engines: lo + (hi-lo)*frac on
    # the sorted values — identical inputs give identical doubles; the
    # inventory still rounds results to 6dp)
    "PCTL": {
        "spark": "percentile_cont({1}) WITHIN GROUP (ORDER BY {0})",
        "duckdb": "quantile_cont({0}, {1})",
    },
    # microseconds since epoch as BIGINT (naive timestamps read as UTC)
    "EPOCH_US": {
        "spark": "unix_micros(CAST({0} AS TIMESTAMP))",
        "duckdb": "epoch_us({0})",
    },
    # timestamp canonicalized to second precision as a plain string —
    # the engine-neutral form for row fingerprints (raw TIMESTAMP->string
    # casts disagree on fractional-second rendering between engines)
    "TS_STR": {
        "spark": "date_format({0}, 'yyyy-MM-dd HH:mm:ss')",
        "duckdb": "strftime({0}, '%Y-%m-%d %H:%M:%S')",
    },
    # double canonicalized to a 2-decimal string: double->DECIMAL(18,2)
    # never hits a round-half tie (no finite double is exactly x.xx5), so
    # HALF_UP (Spark) and round-half-even (DuckDB) agree; decimals render
    # with full scale in both engines ('1.00', '-12.34')
    "MONEY_STR": {
        "spark": "CAST(CAST({0} AS DECIMAL(18,2)) AS STRING)",
        "duckdb": "CAST(CAST({0} AS DECIMAL(18,2)) AS VARCHAR)",
    },
}


def _split_args(body: str) -> list[str]:
    args, depth, cur, quote = [], 0, [], None
    for ch in body:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        args.append("".join(cur).strip())
    return args


def render(sql: str, dialect: str) -> str:
    """Expand macros for ``dialect`` ('spark' | 'duckdb'), innermost-out."""
    changed = True
    while changed:
        changed = False
        for name, forms in MACROS.items():
            template = forms.get(dialect) or forms.get("*")
            if template is None:
                continue
            start = 0
            while True:
                idx = sql.find(name + "(", start)
                if idx < 0:
                    break
                # must be a standalone token
                if idx > 0 and (sql[idx - 1].isalnum() or sql[idx - 1] == "_"):
                    start = idx + 1
                    continue
                depth, j, quote = 0, idx + len(name), None
                while j < len(sql):
                    ch = sql[j]
                    if quote:
                        if ch == quote:
                            quote = None
                    elif ch in ("'", '"'):
                        quote = ch
                    elif ch == "(":
                        depth += 1
                    elif ch == ")":
                        depth -= 1
                        if depth == 0:
                            break
                    j += 1
                body = sql[idx + len(name) + 1 : j]
                args = _split_args(body)
                expanded = template
                for ai, arg in enumerate(args):
                    expanded = expanded.replace("{" + str(ai) + "}", arg)
                sql = sql[:idx] + expanded + sql[j + 1 :]
                changed = True
                start = idx + len(expanded)
    return sql
