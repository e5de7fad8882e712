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
