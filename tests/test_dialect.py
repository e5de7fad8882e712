"""Unit tests for the DuckDB → Spark SQL dialect shim (pure string level)."""

from __future__ import annotations

from de_polars_spark.engine.dialect import translate_duckdb_sql as t


def test_postfix_cast_simple():
    assert t("SELECT x::date FROM t") == "SELECT CAST(x AS date) FROM t"


def test_postfix_cast_parenthesized_and_typed():
    assert (
        t("SELECT (a + b)::DECIMAL(38,6) FROM t")
        == "SELECT CAST((a + b) AS DECIMAL(38,6)) FROM t"
    )


def test_postfix_cast_nested():
    assert t("SELECT x::int::float FROM t") == (
        "SELECT CAST(CAST(x AS int) AS float) FROM t"
    )


def test_cast_does_not_touch_string_literals():
    sql = "SELECT 'a::b' AS lit, x::date FROM t"
    assert t(sql) == "SELECT 'a::b' AS lit, CAST(x AS date) FROM t"


def test_substring_from_regex():
    # reference: allocation.py:265 SUBSTRING(resource_tags FROM 'Project...')
    assert (
        t("SELECT SUBSTRING(resource_tags FROM 'Project[\":]*([^,}\"]*)') FROM t")
        == "SELECT regexp_extract(resource_tags, 'Project[\":]*([^,}\"]*)', 1) FROM t"
    )


def test_read_parquet_single():
    assert (
        t("SELECT * FROM read_parquet('/tmp/a.parquet')")
        == "SELECT * FROM parquet.`/tmp/a.parquet`"
    )


def test_read_parquet_list_becomes_union_all():
    out = t("SELECT * FROM read_parquet(['/a.parquet', '/b.parquet'])")
    assert out == (
        "SELECT * FROM (SELECT * FROM parquet.`/a.parquet` "
        "UNION ALL SELECT * FROM parquet.`/b.parquet`)"
    )


def test_from_path_literal():
    # reference: README.md:343-367 SELECT * FROM 'output/monthly_costs.parquet'
    assert (
        t("SELECT * FROM 'out/monthly.parquet' m JOIN 'b.parquet' b ON m.a=b.a")
        == "SELECT * FROM parquet.`out/monthly.parquet` m "
        "JOIN parquet.`b.parquet` b ON m.a=b.a"
    )


def test_double_quoted_identifiers_to_backticks():
    assert t('SELECT "weird col" FROM t') == "SELECT `weird col` FROM t"


def test_map_access_cast():
    assert (
        t("SELECT product['region']::string FROM CUR")
        == "SELECT CAST(product['region'] AS string) FROM CUR"
    )


def test_star_exclude_to_except():
    assert t("SELECT * EXCLUDE (a, b) FROM x") == "SELECT * EXCEPT (a, b) FROM x"
    assert t("SELECT t.* EXCLUDE (a) FROM t") == "SELECT t.* EXCEPT (a) FROM t"
    # inside a string literal: untouched
    assert t("SELECT 'EXCLUDE (x)' FROM t") == "SELECT 'EXCLUDE (x)' FROM t"


def test_list_aggregate_to_collect_list():
    assert t("SELECT LIST(v) FROM x GROUP BY k") == (
        "SELECT collect_list(v) FROM x GROUP BY k"
    )
    # list_* functions are NOT the LIST aggregate - they rename to the
    # Spark higher-order equivalents instead
    assert t("SELECT list_filter(a, x -> x) FROM t") == (
        "SELECT filter(a, x -> x) FROM t"
    )


def test_integer_division_to_div():
    assert t("SELECT a // 2 FROM x") == "SELECT a  div  2 FROM x"
    assert t("SELECT '// not div' FROM x") == "SELECT '// not div' FROM x"


def test_strftime_to_date_format():
    assert t("SELECT strftime(ts, '%Y-%m') FROM e") == (
        "SELECT date_format(ts, 'yyyy-MM') FROM e"
    )
    assert t("SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') AS d FROM e") == (
        "SELECT date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS d FROM e"
    )


def test_translated_duckdb_sql_runs_on_spark(spark, sf_dir):
    """End-to-end: DuckDB-dialect SQL through the engine's translate path."""
    from de_polars_spark.sources.registry import register_testdata

    register_testdata(spark, sf_dir)
    rows = spark.sql(
        t(
            "SELECT event_type, strftime(ts, '%Y-%m') AS month, "
            "COUNT(*)::bigint AS n, LIST(event_id) AS ids "
            "FROM events WHERE event_id // 2 < 50 "
            "GROUP BY event_type, strftime(ts, '%Y-%m') LIMIT 5"
        )
    ).collect()
    assert rows and all(r.n == len(r.ids) for r in rows)


def test_list_function_family_renames(spark, sf_dir):
    assert t("SELECT list_distinct(string_split(text, ' ')) FROM d") == (
        "SELECT array_distinct(split(text, ' ')) FROM d"
    )
    # array_to_string is a CASE guard, not a rename: DuckDB yields NULL
    # for an empty array, Spark's array_join yields '' (fuzzer find)
    assert t("SELECT array_to_string(list_sort(a), ',') FROM d") == (
        "SELECT CASE WHEN size(array_sort(a)) = 0 THEN CAST(NULL AS STRING) "
        "ELSE array_join(array_sort(a), ',') END FROM d"
    )
    # runnable end-to-end on Spark
    from de_polars_spark.sources.registry import register_testdata

    register_testdata(spark, sf_dir)
    n = spark.sql(
        t(
            "SELECT doc_id, list_contains(list_distinct(string_split(text, ' ')), 'the') AS has_the "
            "FROM documents LIMIT 3"
        )
    ).count()
    assert n == 3


def test_qualify_rewrite_topk(spark):
    from de_polars_spark.engine.dialect import translate_duckdb_sql

    spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "b", 5), (5, "b", 50)],
        "id int, grp string, v int",
    ).createOrReplaceTempView("qt")
    sql = translate_duckdb_sql(
        "SELECT id, grp, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v DESC)"
        " AS rn FROM qt QUALIFY rn <= 1 ORDER BY grp"
    )
    rows = [(r.id, r.grp, r.rn) for r in spark.sql(sql).collect()]
    assert rows == [(3, "a", 1), (5, "b", 1)]
    # the helper predicate column never leaks into the output schema
    assert [f.name for f in spark.sql(sql).schema] == ["id", "grp", "rn"]


def test_qualify_rewrite_direct_window_expr(spark):
    from de_polars_spark.engine.dialect import translate_duckdb_sql

    spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id int, grp string"
    ).createOrReplaceTempView("qt2")
    sql = translate_duckdb_sql(
        "SELECT id, grp FROM qt2 "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY grp ORDER BY id) = 1"
    )
    assert {(r.id, r.grp) for r in spark.sql(sql).collect()} == {(1, "a"), (3, "b")}


def test_qualify_rewrite_in_subquery(spark):
    from de_polars_spark.engine.dialect import translate_duckdb_sql

    spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "id int, v int"
    ).createOrReplaceTempView("qt3")
    sql = translate_duckdb_sql(
        "SELECT SUM(v) AS s FROM (SELECT id, v, RANK() OVER (ORDER BY v DESC)"
        " AS rk FROM qt3 QUALIFY rk <= 2) top2"
    )
    assert spark.sql(sql).collect()[0]["s"] == 50
    # a QUALIFY inside a string literal is never rewritten
    passthrough = translate_duckdb_sql("SELECT 'no QUALIFY here' AS s")
    assert "__qp" not in passthrough


def test_list_index_one_based(spark):
    from de_polars_spark.engine.dialect import translate_duckdb_sql

    sql = translate_duckdb_sql("SELECT arr[1] AS first FROM "
                               "(SELECT array('a', 'b', 'c') AS arr)")
    assert "element_at(arr, 1)" in sql
    assert spark.sql(sql).collect()[0]["first"] == "a"  # DuckDB semantics
    # string-key map access untouched (same semantics both engines)
    passthrough = translate_duckdb_sql("SELECT m['k'] FROM t")
    assert "element_at" not in passthrough


def test_list_index_zero_yields_null(spark):
    # DuckDB arr[0] returns NULL; Spark's element_at(_, 0) THROWS — the
    # shim emits a NULL literal so both engines agree
    from de_polars_spark.engine.dialect import translate_duckdb_sql

    sql = translate_duckdb_sql(
        "SELECT arr[0] AS z FROM (SELECT array('a', 'b') AS arr)"
    )
    assert spark.sql(sql).collect()[0]["z"] is None


def test_unrewritable_list_index_shapes_fail_loudly():
    # expression-result bases / chained / negative indexes would hit
    # Spark's 0-BASED [] and silently read the wrong element — the shim
    # must reject them, never pass them through (ADVICE r4, medium)
    import pytest

    from de_polars_spark.engine.dialect import (
        DialectTranslationError,
        translate_duckdb_sql,
    )

    for bad in (
        "SELECT string_split(t, ' ')[1] FROM docs",
        "SELECT arr[1][2] FROM t",
        "SELECT arr[-1] FROM t",
    ):
        with pytest.raises(DialectTranslationError):
            translate_duckdb_sql(bad)
    # a bracket index inside a string literal is data, not syntax
    ok = translate_duckdb_sql("SELECT 'f(x)[1]' AS s FROM t")
    assert "f(x)[1]" in ok


def test_qualify_stops_at_except_set_operator(spark):
    from de_polars_spark.engine.dialect import translate_duckdb_sql

    spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id int, grp string"
    ).createOrReplaceTempView("qe")
    sql = translate_duckdb_sql(
        "SELECT id, grp FROM qe "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY grp ORDER BY id) = 1 "
        "EXCEPT SELECT 1 AS id, 'a' AS grp"
    )
    # EXCEPT must remain a set operator, not fold into the predicate
    assert {(r.id, r.grp) for r in spark.sql(sql).collect()} == {(3, "b")}


def test_using_sample_to_tablesample(spark):
    from de_polars_spark.engine.dialect import translate_duckdb_sql

    spark.range(100).createOrReplaceTempView("st")
    pct = translate_duckdb_sql("SELECT count(*) AS n FROM st USING SAMPLE 50%")
    assert "TABLESAMPLE (50 PERCENT)" in pct
    assert 0 <= spark.sql(pct).collect()[0]["n"] <= 100
    rows = translate_duckdb_sql("SELECT * FROM st USING SAMPLE 5 ROWS")
    assert "TABLESAMPLE (5 ROWS)" in rows
    assert len(spark.sql(rows).collect()) == 5


def test_epoch_and_regexp_and_overlap_renames(spark):
    assert t("SELECT epoch_ms(ts) FROM e") == "SELECT unix_millis(ts) FROM e"
    assert t("SELECT epoch_us(ts) FROM e") == "SELECT unix_micros(ts) FROM e"
    assert (
        t("SELECT regexp_matches(name, 'a+') FROM x")
        == "SELECT rlike(name, 'a+') FROM x"
    )
    assert (
        t("SELECT list_has_any(a, b) FROM x")
        == "SELECT arrays_overlap(a, b) FROM x"
    )
    # executed end to end on Spark
    row = spark.sql(
        t("SELECT epoch_ms(TIMESTAMP '2024-01-01 00:00:01') AS ms, "
          "regexp_matches('abc', 'b') AS m, "
          "list_has_any(string_split('a b', ' '), string_split('b c', ' ')) AS o")
    ).collect()[0]
    assert (row["ms"], row["m"], row["o"]) == (1704067201000, True, True)


def test_date_diff_unit_literal_to_timestampdiff(spark):
    assert t("SELECT date_diff('day', a, b) FROM x") == (
        "SELECT timestampdiff(DAY, date_trunc('day', a), "
        "date_trunc('day', b)) FROM x"
    )
    # Spark's own 2-arg date_diff form passes through untouched
    assert t("SELECT date_diff(a, b) FROM x") == "SELECT date_diff(a, b) FROM x"
    # a unit inside a string literal elsewhere is untouched
    assert (
        t("SELECT 'date_diff(''day'', x, y)' FROM x")
        == "SELECT 'date_diff(''day'', x, y)' FROM x"
    )
    # DuckDB's date_diff counts unit-BOUNDARY crossings, not elapsed
    # units — the translated form must agree on non-boundary-aligned
    # operands (2h elapsed but one midnight crossed => 1 day, 2 hours)
    import duckdb

    cases = [
        ("day", "2024-01-01 23:00:00", "2024-01-02 01:00:00"),
        ("hour", "2024-01-01 00:30:00", "2024-01-01 02:15:00"),
        ("month", "2024-01-31 12:00:00", "2024-02-01 00:00:00"),
        ("hour", "2024-01-01 00:00:00", "2024-01-01 05:30:00"),
    ]
    for unit, a, b in cases:
        duck_sql = (
            f"SELECT date_diff('{unit}', TIMESTAMP '{a}', TIMESTAMP '{b}') AS d"
        )
        expect = duckdb.sql(duck_sql).fetchall()[0][0]
        got = spark.sql(t(duck_sql)).collect()[0]["d"]
        assert got == expect, (unit, a, b, got, expect)


def test_strptime_to_to_timestamp(spark):
    assert t("SELECT strptime('2024-01-15', '%Y-%m-%d') AS ts") == (
        "SELECT to_timestamp('2024-01-15', 'yyyy-MM-dd') AS ts"
    )
    # end-to-end: round-trips strftime output, both engines agree
    import duckdb

    sql = (
        "SELECT strptime(strftime(TIMESTAMP '1995-06-17 10:30:00', "
        "'%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS ts"
    )
    duck = duckdb.connect().execute(sql).fetchone()[0]
    got = spark.sql(t(sql)).collect()[0]["ts"]
    assert got == duck


# --- round-6 ADVICE regressions: literal-content protection, ---------
# --- cast-anchored VARCHAR, QUALIFY × GROUP BY ALL -------------------


def test_prelex_rewrites_skip_literal_contents():
    """array_to_string/strftime/strptime/date_diff run before
    tokenization (their args carry literals) but must never rewrite a
    mention INSIDE an unrelated string literal (ADVICE r5)."""
    for fn in (
        "array_to_string(a, b)",
        "strftime(x, '%Y')".replace("'", "''"),
        "strptime(x, '%Y')".replace("'", "''"),
        "date_diff('day', a, b)".replace("'", "''"),
    ):
        sql = f"SELECT 'see {fn}' AS s"
        assert t(sql) == sql, t(sql)
    # a real call AFTER a literal that mentions the function still rewrites
    s = t("SELECT 'array_to_string(x, y)' AS doc, array_to_string(a, '-') AS j FROM t")
    assert "'array_to_string(x, y)'" in s and "array_join(a, '-')" in s


def test_apostrophe_in_quoted_identifier_does_not_flip_parity():
    """An apostrophe inside a double-quoted IDENTIFIER is not a literal
    delimiter: a genuine rewrite after it must still fire, and a
    mention inside a later real literal must still be protected
    (ADVICE r6: the bare quote-parity scan misclassified both)."""
    s = t('SELECT "o\'brien", array_to_string(a, \'-\') AS j FROM t')
    assert "o'brien" in s and "array_join(a, '-')" in s
    s2 = t('SELECT "o\'brien", \'see array_to_string(x, y)\' AS doc FROM t')
    assert "'see array_to_string(x, y)'" in s2
    # a pattern INSIDE a double-quoted identifier names a column — the
    # rewrite must never fire there either (r7 review finding)
    s3 = t('SELECT "array_to_string(a, b)" FROM t')
    assert "array_join" not in s3


def test_varchar_rewrite_is_cast_anchored():
    """An alias named text/varchar before a closing paren is an
    identifier, not a cast type — never renamed (ADVICE r5)."""
    assert t("(SELECT 1 AS text)") == "(SELECT 1 AS text)"
    assert t("SELECT * FROM (SELECT p_type AS varchar)") == (
        "SELECT * FROM (SELECT p_type AS varchar)"
    )
    # genuine casts in every reachable shape still map to STRING
    assert t("SELECT CAST(x AS VARCHAR) FROM t") == "SELECT CAST(x AS STRING) FROM t"
    assert t("SELECT TRY_CAST(x AS TEXT) FROM t") == "SELECT TRY_CAST(x AS STRING) FROM t"
    assert t("SELECT CAST('x' AS TEXT)") == "SELECT CAST('x' AS STRING)"
    assert t("SELECT CAST(CAST(x AS VARCHAR) AS TEXT) FROM t") == (
        "SELECT CAST(CAST(x AS STRING) AS STRING) FROM t"
    )
    assert t("SELECT x::VARCHAR, y::TEXT FROM t") == (
        "SELECT CAST(x AS STRING), CAST(y AS STRING) FROM t"
    )
    # VARCHAR(n) is valid Spark — passes through
    assert "VARCHAR(30)" in t("SELECT CAST(x AS VARCHAR(30)) FROM t")


def test_qualify_group_by_all_uses_wrapper(spark):
    """GROUP BY ALL + QUALIFY: injecting the predicate column would make
    it participate in Spark's ALL resolution (analyzer error) — the
    rewrite must fall back to the outer-wrapper form (ADVICE r5)."""
    sql = (
        "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY ALL "
        "QUALIFY row_number() OVER (ORDER BY n DESC, o_orderstatus) <= 2"
    )
    out = t(sql)
    assert "__qb" in out  # wrapper marker
    rows = spark.sql(out).collect()
    assert len(rows) == 2
    # oracle: hand-wrapped equivalent (window over the grouped result)
    explicit = spark.sql(
        "SELECT o_orderstatus, n FROM ("
        "  SELECT o_orderstatus, n, row_number() OVER "
        "    (ORDER BY n DESC, o_orderstatus) AS rn FROM ("
        "    SELECT o_orderstatus, count(*) AS n FROM orders "
        "    GROUP BY o_orderstatus) g) w WHERE rn <= 2"
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, explicit))
