"""DuckDB → Spark SQL dialect translation shim.

The reference stores all query assets as DuckDB-dialect SQL and accepts
arbitrary DuckDB SQL at its API edge. Spark SQL is close but not identical;
this module rewrites the known deltas (SURVEY.md §4) so stored assets and
user queries run unchanged:

- ``expr::type`` postfix casts      → ``CAST(expr AS type)``
  (reference usage: cur2_query_library/analytics/amazon_athena.sql:9)
- ``SUBSTRING(x FROM 'pattern')``   → ``regexp_extract(x, 'pattern', 1)``
  (reference usage: de_polars/analytics/allocation.py:265)
- ``read_parquet('p')`` table refs  → `` parquet.`p` ``
  (reference usage: de_polars/engine/duckdb_engine.py:151-157)
- ``FROM 'path.parquet'`` literals  → `` FROM parquet.`path.parquet` ``
  (reference usage: README.md:343-367)
- double-quoted identifiers         → backtick identifiers
- ``SELECT * EXCLUDE (c)``          → ``SELECT * EXCEPT (c)``
- ``LIST(x)`` aggregate             → ``collect_list(x)``
- ``a // b`` integer division       → ``a div b`` (both truncate
  toward zero, verified incl. negative operands; NOTE DuckDB evaluates
  FLOAT ``//`` as plain division — float-typed ``//`` is not portable
  and the reference's assets never use it)
- ``strftime(x, '%Y-%m')``          → ``date_format(x, 'yyyy-MM')``
  (the %Y %m %d %H %M %S subset; unknown tokens pass through and fail
  in the analyzer rather than silently emitting a wrong format).
- ``arr[1]`` (1-based list index)   → ``element_at(arr, 1)`` (also
  1-based — passing ``[]`` through would silently read the WRONG
  element, Spark's being 0-based; string-key map access is untouched)
- ``USING SAMPLE 10%`` / ``N ROWS`` → ``TABLESAMPLE (...)``
- ``QUALIFY pred``                  → wrapped ``WHERE`` on a computed
  predicate column (post-grouping window timing preserved; predicate
  must reference SELECTed columns — see ``_rewrite_qualify``)
- ``date_diff('day', a, b)``        → ``timestampdiff(DAY,
  date_trunc('day', a), date_trunc('day', b))`` (DuckDB counts
  unit-BOUNDARY crossings, Spark elapsed complete units — operand
  truncation makes them coincide; Spark's own 2-arg ``date_diff``
  form passes through untouched)
- name-only function renames: ``string_split``/``list_distinct``/
  ``list_contains``/``list_sort``/``list_transform``/``list_filter``/
  ``array_to_string``/``epoch_ms``/``epoch_us``/``regexp_matches``/
  ``list_has_any`` → their Spark equivalents (same signatures;
  different-signature functions are deliberately left to fail loudly).
  ``GROUP BY ALL``, ``ILIKE``, and ``string_agg``/``listagg`` need no
  rewrite — Spark SQL (4.x) supports them natively.

This is string rewriting at the API edge — no Catalyst extension is needed
for parity (SURVEY.md §4). Rewrites skip single-quoted string literals.
"""

from __future__ import annotations

import re

# Tokenizer: string literals | double-quoted identifiers | rest.
_TOKEN = re.compile(
    r"""
    (?P<str>'(?:[^']|'')*')            # single-quoted literal ('' = escaped quote)
    | (?P<dq>"(?:[^"]|"")*")           # double-quoted identifier
    | (?P<rest>[^'"]+)
    """,
    re.VERBOSE,
)

_PG_CAST = re.compile(
    r"""(?P<expr>
            [A-Za-z_][\w.]*\((?:[^()]|\([^()]*\))*\)   # function call (e.g. a prior CAST)
          | \((?:[^()]|\([^()]*\))*\)                  # parenthesized expr
          | [A-Za-z_][\w.]*(?:\[[^\]]+\])?             # identifier / dotted / map access
          | \d+(?:\.\d+)?                              # numeric literal
        )
        ::\s*(?P<type>[A-Za-z_]\w*(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)
    """,
    re.VERBOSE,
)

# map access with a quoted key, e.g. product['region']::string — contains a
# string literal on purpose, so it must be rewritten before tokenization.
_MAP_ACCESS_CAST = re.compile(
    r"""(?P<expr>[A-Za-z_][\w.]*\[\s*'(?:[^']|'')*'\s*\])
        ::\s*(?P<type>[A-Za-z_]\w*(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)
    """,
    re.VERBOSE,
)

_SUBSTR_FROM = re.compile(
    r"SUBSTRING\s*\(\s*(?P<col>[A-Za-z_][\w.]*)\s+FROM\s+(?P<pat>'(?:[^']|'')*')\s*\)",
    re.IGNORECASE,
)

_READ_PARQUET_ONE = re.compile(
    r"read_parquet\s*\(\s*'(?P<path>[^']+)'\s*\)", re.IGNORECASE
)
_READ_PARQUET_LIST = re.compile(
    r"read_parquet\s*\(\s*\[(?P<paths>[^\]]+)\]\s*\)", re.IGNORECASE
)
_FROM_PARQUET_LITERAL = re.compile(
    r"(?P<kw>\bFROM\b|\bJOIN\b)\s+'(?P<path>[^']+\.parquet)'", re.IGNORECASE
)


#: DuckDB function names whose Spark equivalent differs only in name —
#: rewritten at word boundary before an open paren. Functions with
#: different signatures (list_aggregate, len's string/list overload) are
#: deliberately NOT mapped: a silent argument mismatch is worse than an
#: unresolved-function error.
_FN_MAP = {
    "string_split": "split",
    "list_distinct": "array_distinct",
    "list_contains": "array_contains",
    "list_sort": "array_sort",
    # array_to_string is NOT a plain rename: DuckDB returns NULL for an
    # empty array (string_agg semantics), Spark's array_join returns ''
    # — see _rewrite_array_to_string (found by tests/test_dialect_fuzz.py)
    "list_transform": "transform",
    "list_filter": "filter",
    # epoch extraction: same input type, same integer output
    "epoch_ms": "unix_millis",
    "epoch_us": "unix_micros",
    # regexp_matches(str, re) — Spark's 2-arg rlike function form
    "regexp_matches": "rlike",
    # list_has_any(a, b) — any-element overlap, same 2-array signature
    "list_has_any": "arrays_overlap",
}
_FN_CALL = re.compile(
    r"\b(" + "|".join(_FN_MAP) + r")\s*\(", re.IGNORECASE
)

_VARCHAR_PG = re.compile(r"::\s*(?:VARCHAR|TEXT)\b(?!\s*\()", re.IGNORECASE)
_EXCLUDE = re.compile(r"(?<=\*)\s+EXCLUDE\s*\(", re.IGNORECASE)
_LIST_AGG = re.compile(r"\bLIST\s*\(", re.IGNORECASE)
_INT_DIV = re.compile(r"(?<=[\w)\s])//(?=[\w(\s])")
# DuckDB list indexing is 1-based; Spark's [] on arrays is 0-based — a
# silent off-by-one if passed through. Conservative shape (identifier or
# dotted path, integer-literal index) → element_at, which is 1-based in
# Spark and matches DuckDB exactly. Map access with string keys (same
# semantics both engines) is untouched. Index 0 returns NULL in DuckDB
# but THROWS in Spark's element_at — emitted as a NULL literal. Any
# integer index the rewrite does NOT cover (expression-result bases like
# ``string_split(t, ' ')[1]``, chained ``arr[1][2]``, negative indices)
# would reach Spark's 0-based ``[]`` and silently read the wrong
# element, so a residual-shape check REJECTS the statement instead
# (see _RESIDUAL_INT_INDEX below).
_LIST_INDEX = re.compile(r"\b([A-Za-z_][\w.]*)\[(\d+)\]")
_RESIDUAL_INT_INDEX = re.compile(r"[\)\]]\s*\[\s*-?\d+\s*\]|\[\s*-\d+\s*\]")


class DialectTranslationError(ValueError):
    """A DuckDB construct this shim cannot translate safely.

    Raised instead of passing the construct through when pass-through
    would be SILENTLY WRONG on Spark (e.g. 1-based vs 0-based list
    indexing) — a loud failure at translation time beats wrong data.
    """
# DuckDB date_diff('part', a, b) → Spark
# timestampdiff(PART, date_trunc('part', a), date_trunc('part', b)).
# Must run BEFORE tokenization (the unit IS a literal), and must wrap
# BOTH operands: DuckDB counts unit-boundary crossings, Spark's
# timestampdiff counts complete elapsed units — truncating the operands
# to the unit makes the two definitions coincide.
_DATE_DIFF = re.compile(
    r"\bdate_diff\s*\(\s*'(?P<part>year|quarter|month|week|day|hour|"
    r"minute|second)'\s*,",
    re.IGNORECASE,
)


def _split_call_args(sql: str, open_idx: int) -> tuple[list[str], int]:
    """Top-level argument texts of the call whose ``(`` sits at
    ``open_idx``, plus the index of its closing ``)``.

    Respects nested parens/brackets and single-quoted literals (with
    DuckDB's doubled-quote escape), so argument commas inside either
    never split."""
    depth = 0
    args: list[str] = []
    cur_start = open_idx + 1
    i = open_idx
    n = len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            i += 1
            while i < n:
                if sql[i] == "'":
                    if i + 1 < n and sql[i + 1] == "'":  # escaped ''
                        i += 2
                        continue
                    break
                i += 1
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
            if depth == 0:
                args.append(sql[cur_start:i])
                return args, i
        elif ch == "," and depth == 1:
            args.append(sql[cur_start:i])
            cur_start = i + 1
        i += 1
    raise DialectTranslationError("unbalanced parentheses in function call")


def _inside_literal(sql: str, pos: int) -> bool:
    """True iff ``pos`` falls inside a single-quoted SQL string literal.

    Quote-AWARE scan (not bare quote parity — an apostrophe inside a
    double-quoted identifier like ``SELECT "o'brien"`` would flip a
    parity count and misclassify the whole rest of the statement, the
    r6 ADVICE finding): walks literal/identifier spans left to right,
    honoring ``''`` doubling inside literals and ``""`` doubling inside
    identifiers. Used by the pre-tokenization rewrites (whose own
    patterns must match string literals — format strings, regexes) to
    honor the module contract that rewrites never alter the CONTENTS
    of an unrelated literal (e.g. ``SELECT 'see array_to_string(a,
    b)'`` must pass through untouched). Positions inside double-quoted
    IDENTIFIERS also return True: no rewrite may fire inside any
    quoted span (``SELECT "array_to_string(a, b)"`` names a column —
    rewriting it would reference a nonexistent one)."""
    i, n = 0, len(sql)
    while i < n and i <= pos:
        ch = sql[i]
        if ch in ("'", '"'):
            j = i + 1
            while j < n:
                if sql[j] == ch:
                    if j + 1 < n and sql[j + 1] == ch:  # doubled escape
                        j += 2
                        continue
                    break
                j += 1
            if i < pos <= j:
                return True  # literal or quoted identifier: never rewrite
            i = j + 1
        else:
            i += 1
    return False


def _rewrite_varchar_cast(sql: str) -> str:
    """``CAST(x AS VARCHAR)`` / ``AS TEXT`` → ``AS STRING``, cast-anchored.

    DuckDB's length-free VARCHAR/TEXT ≙ Spark STRING (Spark's parser
    REQUIRES a length on bare VARCHAR); VARCHAR(n) is valid Spark and
    passes through (the type word is not immediately followed by ``)``).
    One forward token pass tracks, per paren depth, whether the opener
    is the word CAST/TRY_CAST, so a projection alias named text/varchar
    before a closing paren (``(SELECT 1 AS text)``) is never renamed —
    only a genuine cast's type token is. String literals are skipped by
    the token scan. Runs pre-tokenization because a cast's input
    expression may itself contain a literal (``CAST('x' AS VARCHAR)``),
    which would otherwise split the cast across rewrite segments."""
    spans: list[tuple[int, int]] = []  # [s, e) spans to become "AS STRING"
    stack: list[bool] = []  # per open paren: opener is CAST/TRY_CAST
    words: list[tuple[str, int, int]] = []  # (UPPER, start, end), last two
    for kind, s, e in _scan_tokens(sql):
        if kind == "word":
            words.append((sql[s:e].upper(), s, e))
            if len(words) > 2:
                words.pop(0)
        elif kind == "char":
            c = sql[s]
            if c == "(":
                stack.append(
                    bool(words)
                    and words[-1][0] in ("CAST", "TRY_CAST")
                    and sql[words[-1][2] : s].strip() == ""
                )
            elif c == ")":
                in_cast = stack.pop() if stack else False
                if in_cast and len(words) == 2:
                    (w1, s1, e1), (w2, s2, e2) = words
                    if (
                        w1 == "AS"
                        and w2 in ("VARCHAR", "TEXT")
                        and sql[e1:s2].strip() == ""
                        and sql[e2:s].strip() == ""
                    ):
                        spans.append((s1, s))
    for s1, s in reversed(spans):
        sql = sql[:s1] + "AS STRING" + sql[s:]
    return sql


_ARRAY_TO_STRING = re.compile(r"\barray_to_string\s*\(", re.IGNORECASE)


def _rewrite_array_to_string(sql: str) -> str:
    """DuckDB ``array_to_string(a, sep)`` → a Spark CASE form.

    Not a plain rename to ``array_join``: on an EMPTY array DuckDB
    returns NULL (it is ``list_aggregate(.., 'string_agg', ..)``, and
    string_agg over zero rows is NULL) while Spark's array_join returns
    ``''``. A ``nullif(.., '')`` would over-correct — joining arrays of
    empty strings legitimately yields ``''`` in both engines — so the
    array expression is duplicated into an explicit size guard:
    ``CASE WHEN size(a) = 0 THEN NULL ELSE array_join(a, sep) END``
    (NULL input: size(NULL) is NULL, the WHEN is not taken, and
    array_join(NULL, ..) is NULL — matching DuckDB). Runs before
    tokenization because the separator is a string literal.
    Found by the differential fuzzer (tests/test_dialect_fuzz.py).
    """
    pos = 0
    while True:
        m = _ARRAY_TO_STRING.search(sql, pos)
        if not m:
            return sql
        if _inside_literal(sql, m.start()):
            pos = m.end()
            continue
        args, close = _split_call_args(sql, m.end() - 1)
        if len(args) != 2:
            raise DialectTranslationError(
                f"array_to_string expects 2 arguments, got {len(args)}"
            )
        arr, sep = args[0].strip(), args[1].strip()
        repl = (
            f"CASE WHEN size({arr}) = 0 THEN CAST(NULL AS STRING) "
            f"ELSE array_join({arr}, {sep}) END"
        )
        sql = sql[: m.start()] + repl + sql[close + 1 :]
        pos = m.start()  # re-scan repl: nested calls live inside {arr}


def _rewrite_date_diff(sql: str) -> str:
    out: list[str] = []
    pos = 0
    while True:
        m = _DATE_DIFF.search(sql, pos)
        if not m:
            out.append(sql[pos:])
            break
        if _inside_literal(sql, m.start()):
            out.append(sql[pos : m.end()])
            pos = m.end()
            continue
        unit = m.group("part").lower()
        # scan the two remaining args: depth-0 comma splits, string
        # literals skipped, stop at the depth-0 closing paren
        i = m.end()
        depth = 0
        args: list[str] = []
        start = i
        while i < len(sql):
            c = sql[i]
            if c == "'":
                j = i + 1
                while j < len(sql):
                    if sql[j] == "'":
                        if j + 1 < len(sql) and sql[j + 1] == "'":
                            j += 2
                            continue
                        break
                    j += 1
                i = j
            elif c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    args.append(sql[start:i])
                    break
                depth -= 1
            elif c == "," and depth == 0:
                args.append(sql[start:i])
                start = i + 1
            i += 1
        if len(args) == 2:
            a, b = (x.strip() for x in args)
            out.append(sql[pos : m.start()])
            out.append(
                f"timestampdiff({unit.upper()}, date_trunc('{unit}', {a}), "
                f"date_trunc('{unit}', {b}))"
            )
            pos = i + 1
        else:
            # malformed call — leave untouched to fail loudly downstream
            out.append(sql[pos : m.end()])
            pos = m.end()
    return "".join(out)
# DuckDB USING SAMPLE → Spark TABLESAMPLE (percent or row forms)
_USING_SAMPLE = re.compile(
    r"\bUSING\s+SAMPLE\s+(?P<n>\d+(?:\.\d+)?)\s*"
    r"(?P<unit>%|PERCENT\b|ROWS\b)?",
    re.IGNORECASE,
)


def _using_sample_repl(m: re.Match) -> str:
    unit = (m.group("unit") or "ROWS").upper().replace("%", "PERCENT")
    return f"TABLESAMPLE ({m.group('n')} {unit})"

#: strftime '%X' tokens → Spark date_format pattern letters (the common
#: subset the reference's assets use; unknown tokens are left alone and
#: surface as an analyzer error rather than silently wrong output)
_STRFTIME_MAP = {
    "%Y": "yyyy", "%m": "MM", "%d": "dd",
    "%H": "HH", "%M": "mm", "%S": "ss",
}
_STRFTIME = re.compile(
    r"strftime\s*\(\s*(?P<expr>[^,()]+(?:\([^()]*\))?[^,()]*)\s*,\s*"
    r"(?P<fmt>'(?:[^']|'')*')\s*\)",
    re.IGNORECASE,
)


def _strftime_repl(m: re.Match) -> str:
    if _inside_literal(m.string, m.start()):
        return m.group(0)
    fmt = m.group("fmt")
    for tok, spark in _STRFTIME_MAP.items():
        fmt = fmt.replace(tok, spark)
    return f"date_format({m.group('expr').strip()}, {fmt})"


#: strptime is strftime's inverse (string → timestamp); same token map,
#: Spark side is to_timestamp. DuckDB's argument order is
#: (string, format) — matching Spark's, so only the name and format
#: tokens translate.
_STRPTIME = re.compile(
    r"strptime\s*\(\s*(?P<expr>[^,()]+(?:\([^()]*\))?[^,()]*)\s*,\s*"
    r"(?P<fmt>'(?:[^']|'')*')\s*\)",
    re.IGNORECASE,
)


def _strptime_repl(m: re.Match) -> str:
    if _inside_literal(m.string, m.start()):
        return m.group(0)
    fmt = m.group("fmt")
    for tok, spark in _STRFTIME_MAP.items():
        fmt = fmt.replace(tok, spark)
    return f"to_timestamp({m.group('expr').strip()}, {fmt})"


def _rewrite_segment(seg: str) -> str:
    """Apply rewrites to a segment known to contain no string literals,
    except the FROM-'path' / regex patterns which this runs before
    literal splitting (handled in translate_duckdb_sql)."""
    def _pg_cast_repl(m: re.Match) -> str:
        typ = m.group("type")
        # length-free VARCHAR/TEXT ≙ Spark STRING (VARCHAR(n) passes
        # through — the type group would include the parens)
        if typ.upper() in ("VARCHAR", "TEXT"):
            typ = "STRING"
        return f"CAST({m.group('expr')} AS {typ})"

    prev = None
    while prev != seg:  # nested :: casts resolve innermost-out
        prev = seg
        seg = _PG_CAST.sub(_pg_cast_repl, seg)
    # length-free VARCHAR/TEXT inside CAST(..) is rewritten by
    # _rewrite_varchar_cast (pre-tokenization, cast-anchored);
    # same mapping for :: casts the _PG_CAST rewrite could not reach
    # (bases spanning string literals fall through to Spark's native ::
    # operator, which also rejects bare VARCHAR)
    seg = _VARCHAR_PG.sub("::STRING", seg)
    # DuckDB star-EXCLUDE -> Spark star-EXCEPT
    seg = _EXCLUDE.sub(" EXCEPT (", seg)
    # DuckDB LIST(x) aggregate -> collect_list
    seg = _LIST_AGG.sub("collect_list(", seg)
    # DuckDB integer division -> Spark div
    seg = _INT_DIV.sub(" div ", seg)
    # 1-based list indexing -> element_at (also 1-based); index 0 is
    # NULL in DuckDB but throws in Spark -> emit the NULL literal
    seg = _LIST_INDEX.sub(
        lambda m: "NULL"
        if int(m.group(2)) == 0
        else f"element_at({m.group(1)}, {m.group(2)})",
        seg,
    )
    # any integer index left after the rewrite (expression-result base,
    # chained index, negative index) would hit Spark's 0-BASED [] and
    # silently return the wrong element — fail loudly instead
    resid = _RESIDUAL_INT_INDEX.search(seg)
    if resid:
        raise DialectTranslationError(
            f"unsupported DuckDB list-index shape {resid.group(0)!r}: "
            "DuckDB [] is 1-based, Spark's is 0-based, and only "
            "identifier[int] bases are rewritten — use element_at(expr, i) "
            "(1-based in both engines) instead"
        )
    # USING SAMPLE -> TABLESAMPLE
    seg = _USING_SAMPLE.sub(_using_sample_repl, seg)
    # name-only function renames (list_* family etc.)
    seg = _FN_CALL.sub(lambda m: _FN_MAP[m.group(1).lower()] + "(", seg)
    return seg


_WORD = re.compile(r"[A-Za-z_]\w*")
_QUALIFY_STOP = {"ORDER", "LIMIT", "OFFSET", "UNION", "INTERSECT", "EXCEPT"}


def _scan_tokens(sql: str):
    """Yield (kind, start, end) over SQL: 'str' literals, 'word's, and
    single chars — the minimal lexer the QUALIFY rewrite needs."""
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'" and not (j + 1 < n and sql[j + 1] == "'"):
                    break
                j += 2 if sql[j] == "'" else 1
            yield ("str", i, j + 1)
            i = j + 1
        elif ch.isalpha() or ch == "_":
            m = _WORD.match(sql, i)
            yield ("word", i, m.end())
            i = m.end()
        else:
            yield ("char", i, i + 1)
            i += 1


def _rewrite_qualify(sql: str, _n: int = 0) -> str:
    """DuckDB ``QUALIFY pred`` → a wrapped ``WHERE`` on a computed
    predicate column (Spark has no QUALIFY clause)::

        SELECT body QUALIFY pred [tail]
        → SELECT * EXCEPT (__qpN) FROM
            (SELECT *, (pred) AS __qpN FROM (SELECT body) __qbN) __qsN
          WHERE __qpN [tail]

    The predicate column is INJECTED into the body's own select list
    (just before its top-level FROM), not computed in an outer wrapper:
    inside the body's scope it can reference un-projected source columns
    (``QUALIFY row_number() OVER (ORDER BY p_retailprice) <= 1`` with
    p_retailprice not selected — DuckDB allows this; an outer wrapper
    cannot see it — found by tests/test_dialect_fuzz.py) and select
    ALIASES resolve via Spark's lateral column aliasing, including
    aliases of window expressions. ``SELECT DISTINCT`` bodies fall back
    to the outer-wrapper form (injecting a column would change the
    DISTINCT grouping); there the predicate is limited to projected
    columns, surfacing as an analyzer error, never wrong rows.
    Innermost QUALIFY rewrites first so nested subqueries compose."""
    # locate all QUALIFY keywords with their paren depth
    hits = []  # (depth, start, end)
    depth = 0
    for kind, s, e in _scan_tokens(sql):
        if kind == "char":
            if sql[s] == "(":
                depth += 1
            elif sql[s] == ")":
                depth -= 1
        elif kind == "word" and sql[s:e].upper() == "QUALIFY":
            hits.append((depth, s, e))
    if not hits:
        return sql
    d, qs, qe = max(hits)  # deepest (innermost) first
    # scope start: nearest preceding SELECT at depth d
    sel_start = None
    depth = 0
    for kind, s, e in _scan_tokens(sql[:qs]):
        if kind == "char":
            if sql[s] == "(":
                depth += 1
            elif sql[s] == ")":
                depth -= 1
        elif kind == "word" and depth == d and sql[s:e].upper() == "SELECT":
            sel_start = s
    if sel_start is None:  # malformed; leave for the analyzer to reject
        return sql
    # predicate end / scope end: scan forward from the predicate
    pred_end = scope_end = len(sql)
    depth = d
    for kind, s, e in _scan_tokens(sql[qe:]):
        s += qe
        e += qe
        if kind == "char":
            if sql[s] == "(":
                depth += 1
            elif sql[s] == ")":
                depth -= 1
                if depth < d:
                    pred_end = min(pred_end, s)
                    scope_end = s
                    break
            elif sql[s] == ";" and depth == d:
                pred_end = min(pred_end, s)
                scope_end = s
                break
        elif (
            kind == "word"
            and depth == d
            and sql[s:e].upper() in _QUALIFY_STOP
        ):
            pred_end = s
            break
    body = sql[sel_start:qs].strip()
    pred = sql[qe:pred_end].strip()
    tail = sql[pred_end:scope_end]
    tag = _n
    # body-relative position of the top-level FROM and whether the
    # select list is DISTINCT (first word after SELECT); also detect a
    # top-level GROUP BY ALL — injecting the predicate column into such
    # a body would make it participate in Spark's ALL resolution
    # (grouping by a window expression → analyzer error), so it takes
    # the same outer-wrapper fallback as DISTINCT (ADVICE r5; covered
    # by tests/test_dialect_fuzz.py)
    from_at = None
    distinct = False
    group_by_all = False
    bdepth = 0
    word_no = 0
    prev2 = prev1 = None
    for kind, s, e in _scan_tokens(body):
        if kind == "char":
            if body[s] == "(":
                bdepth += 1
            elif body[s] == ")":
                bdepth -= 1
        elif kind == "word" and bdepth == 0:
            word_no += 1
            w = body[s:e].upper()
            if word_no == 2 and w == "DISTINCT":
                distinct = True
            if w == "FROM" and from_at is None:
                from_at = s
            if w == "ALL" and prev1 == "BY" and prev2 == "GROUP":
                group_by_all = True
            prev2, prev1 = prev1, w
    if distinct or group_by_all:
        injected = (
            f"SELECT *, ({pred}) AS __qp{tag} FROM ({body}) __qb{tag}"
        )
    elif from_at is None:  # FROM-less body (SELECT <exprs> QUALIFY ...)
        injected = f"{body}, ({pred}) AS __qp{tag}"
    else:
        injected = (
            f"{body[:from_at]}, ({pred}) AS __qp{tag} {body[from_at:]}"
        )
    new_scope = (
        f"SELECT * EXCEPT (__qp{tag}) FROM "
        f"({injected}) __qs{tag} "
        f"WHERE __qp{tag} {tail}"
    )
    return _rewrite_qualify(
        sql[:sel_start] + new_scope + sql[scope_end:], _n + 1
    )


def translate_duckdb_sql(sql: str) -> str:
    """Rewrite DuckDB-dialect SQL into Spark SQL."""
    sql = _rewrite_qualify(sql)
    # Path-literal table refs first (they involve quoted strings on purpose).
    sql = _MAP_ACCESS_CAST.sub(
        lambda m: f"CAST({m.group('expr')} AS {m.group('type')})", sql
    )
    sql = _SUBSTR_FROM.sub(lambda m: f"regexp_extract({m.group('col')}, {m.group('pat')}, 1)", sql)
    # strftime carries its format as a string literal, so it must run
    # before tokenization (like the path/regex rewrites above)
    sql = _STRFTIME.sub(_strftime_repl, sql)
    sql = _STRPTIME.sub(_strptime_repl, sql)
    # date_diff's unit is a string literal too (boundary-crossing
    # semantics preserved by operand truncation — see _rewrite_date_diff)
    sql = _rewrite_date_diff(sql)
    # array_to_string's separator is a string literal, and its empty-array
    # semantics need a CASE guard, not a rename (_rewrite_array_to_string)
    sql = _rewrite_array_to_string(sql)
    # CAST(.. AS VARCHAR/TEXT) → AS STRING: pre-tokenization because the
    # cast input may contain a literal; cast-anchored so aliases named
    # text/varchar are untouched (_rewrite_varchar_cast)
    sql = _rewrite_varchar_cast(sql)
    sql = _READ_PARQUET_ONE.sub(lambda m: f"parquet.`{m.group('path')}`", sql)

    def _list_repl(m: re.Match) -> str:
        paths = [p.strip().strip("'") for p in m.group("paths").split(",") if p.strip()]
        if len(paths) == 1:
            return f"parquet.`{paths[0]}`"
        # Multi-file read_parquet([..]) is an implicit UNION ALL
        # (duckdb_engine.py:157); Spark path: the engine registers a
        # multi-path view instead — emit a UNION ALL subquery for ad-hoc SQL.
        union = " UNION ALL ".join(f"SELECT * FROM parquet.`{p}`" for p in paths)
        return f"({union})"

    sql = _READ_PARQUET_LIST.sub(_list_repl, sql)
    sql = _FROM_PARQUET_LITERAL.sub(lambda m: f"{m.group('kw')} parquet.`{m.group('path')}`", sql)

    # Tokenize so :: casts and "identifier" quoting never touch literals.
    out: list[str] = []
    for m in _TOKEN.finditer(sql):
        if m.group("str") is not None:
            out.append(m.group("str"))
        elif m.group("dq") is not None:
            inner = m.group("dq")[1:-1].replace('""', '"')
            out.append(f"`{inner}`")
        else:
            out.append(_rewrite_segment(m.group("rest")))
    return "".join(out)
