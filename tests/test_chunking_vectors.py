"""Chunking, canonical-doc selection, and vector truncation operators."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from de_polars_spark.operators.chunking import chunk_documents
from de_polars_spark.operators.dedup import select_canonical
from de_polars_spark.operators.vectors import truncate_normalize


def test_chunk_boundaries_and_last_chunk(spark):
    # 10 tokens, window 4, overlap 1 -> stride 3 -> starts 0,3,6 (+ tail)
    df = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2, "a b"), (3, "")],
        "doc_id int, text string",
    )
    out = chunk_documents(df, "doc_id", "text", window=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: n=10, stride=3 -> n_chunks = 1 + ceil(6/3) = 3
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [(r.chunk_start, r.chunk_len) for r in c1] == [(0, 4), (3, 4), (6, 4)]
    # doc 2 shorter than a window -> exactly one (possibly short) chunk
    assert [(r.chunk_start, r.chunk_len) for r in by_doc[2]] == [(0, 2)]
    # empty doc -> no chunks
    assert 3 not in by_doc


def test_chunk_full_token_coverage(spark):
    # every token index must be covered by at least one chunk
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(100)))], "doc_id int, text string"
    )
    rows = chunk_documents(df, "doc_id", "text", window=16, overlap=4).collect()
    covered = set()
    for r in rows:
        covered |= set(range(r.chunk_start, r.chunk_start + r.chunk_len))
    assert covered == set(range(100))


def test_chunk_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "doc_id", "text", window=4, overlap=4)


def test_select_canonical_quality_then_id_tiebreak(spark):
    comps = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (7, 70), (8, 70)],
        "node bigint, component_id bigint",
    )
    docs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (7, 4), (8, 4)], "doc_id bigint, q bigint"
    )
    out = {
        r.component_id: r
        for r in select_canonical(comps, docs, "doc_id", "q").collect()
    }
    # component 10: quality tie between 2 and 3 -> lowest id (2) wins
    assert out[10].kept_id == 2 and out[10].kept_quality == 9
    assert out[10].n_dropped == 2 and out[10].dropped_id_sum == 1 + 3
    # component 70: tie -> 7 wins
    assert out[70].kept_id == 7 and out[70].n_dropped == 1
    assert out[70].dropped_id_sum == 8


def test_truncate_normalize_values(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0, 12.0]), (2, [0.0, 0.0, 0.0])],
        "vec_id int, embedding array<float>",
    )
    out = {r.vec_id: r for r in truncate_normalize(df, "vec_id", "embedding", 2).collect()}
    r = out[1]
    assert r.full_dim == 3
    assert r.full_norm == 13.0  # sqrt(9+16+144)
    assert r.trunc_norm == 5.0  # sqrt(9+16)
    assert r.lead_component == round(3.0 / 5.0, 6)
    # zero vector: guarded division, no NaN
    z = out[2]
    assert z.trunc_norm == 0.0 and z.lead_component == 0.0
    assert not math.isnan(z.lead_component)


def test_duplicate_chunks_finds_cross_doc_boilerplate(spark):
    from de_polars_spark.operators.chunking import duplicate_chunks

    footer = "c1 c2 c3 c4"
    df = spark.createDataFrame(
        [(1, "a b " + footer), (2, "x y z " + footer), (3, "unique words only")],
        "doc_id int, text string",
    )
    out = duplicate_chunks(df, "doc_id", "text", window=4, overlap=0).collect()
    # the 4-token footer window recurs in docs 1 and 2 (doc 1: tokens
    # 2..5 != window boundary, so craft: doc1 has 6 tokens -> windows
    # [a b c1 c2], [c3 c4]; doc2 7 tokens -> [x y z c1], [c2 c3 c4];
    # no shared full window => expect empty
    assert out == []
    # align the footer on a window boundary in both docs
    df2 = spark.createDataFrame(
        [(1, footer + " a b c d"), (2, footer + " e f g h")],
        "doc_id int, text string",
    )
    rows = duplicate_chunks(df2, "doc_id", "text", window=4, overlap=0).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_docs == 2 and r.n_occurrences == 2
    assert r.first_doc_id == 1 and r.doc_id_sum == 3


def test_vocab_coverage_monotone_and_bounded(spark):
    from de_polars_spark.operators.textrank import vocab_coverage

    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b c d")], "doc_id int, text string"
    )
    rows = {r.k: r for r in vocab_coverage(df, "doc_id", "text", ks=(1, 2, 10)).collect()}
    assert rows[1].covered_tokens == 4          # 'a' x4
    assert rows[2].covered_tokens == 4 + 3      # + 'b' x3
    assert rows[10].coverage == 1.0             # k > |vocab| covers all
    assert rows[1].total_tokens == 10


def test_normalize_text_collapses_whitespace(spark):
    from de_polars_spark.functions.text import normalize_text
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("  Hello   WORLD\t x \n",), ("hello world x",)], "t string"
    )
    out = df.select(normalize_text(F.col("t")).alias("n")).collect()
    assert out[0].n == out[1].n == "hello world x"
