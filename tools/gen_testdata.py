"""Deterministic sf1 testdata generator — scale evidence above sf0.1.

The driver ships sf{0.001,0.01,0.1} (TESTDATA.md, read-only). VERDICT r5
item 2 asks for measured evidence above sf0.1, so this generates an sf1
set (~6M-row lineitem, 10x sf0.1) with IDENTICAL schemas (column names,
arrow types incl. int32/int64 widths, float32 embedding lists,
timestamp[us]) and matching value domains (measured from sf0.1:
key ranges scale 10x, same category sets, same date windows, same
bag-of-words document vocabulary, ~0.2% planted exact-duplicate docs,
unit-norm float32 embeddings with 10 labels).

Static dims (region, nation) are copied verbatim from sf0.1. Everything
else derives from numpy PCG64 seed 42 — rerunning produces bit-identical
parquet. Output goes to REPO/testdata/sf1 (gitignored; ~250 MB).

Usage: python tools/gen_testdata.py [--out DIR]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"

N_CUSTOMER = 150_000
N_SUPPLIER = 10_000
N_PART = 200_000
N_ORDERS = 1_500_000
N_LINEITEM_ORDERS = N_ORDERS  # ~4 lines/order -> ~6M rows
N_EVENTS = 1_000_000
N_DOCS = 50_000
N_EMB = 8_000
EMB_DIM = 64

_SEGMENTS = ["MACHINERY", "BUILDING", "FURNITURE", "HOUSEHOLD", "AUTOMOBILE"]
_PTYPES = ["ECONOMY", "LARGE", "STANDARD", "MEDIUM", "SMALL", "PROMO"]
_PWORDS = ["ring", "box", "case", "drum", "pack", "bag", "jar", "can"]
_PSIZES_W = ["large", "small", "medium", "tiny", "huge"]
_STATUS = ["O", "P", "F"]
_PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_RFLAG = ["N", "A", "R"]
_LSTATUS = ["F", "O"]
_ETYPES = ["view", "click", "purchase", "signup", "error"]
_LANGS = ["en", "de", "zh", "fr", "es"]
_LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
_VOCAB = (
    "spark line column order small sort fast value scan hash slow group "
    "batch part query agg table vector stream filter big merge join key "
    "window data customer the a"
).split()


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _ts_us(days_from: str, day_span: int, rng, n: int) -> np.ndarray:
    base = np.datetime64(days_from, "us").astype("int64")
    span_us = day_span * 86_400_000_000
    return (base + rng.integers(0, span_us, n)).astype("datetime64[us]")


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "testdata", "sf1"))
    ap.add_argument(
        "--scale", type=float, default=1.0,
        help="row-count multiplier on the sf1 sizes (tests use tiny values)",
    )
    args = ap.parse_args(argv)
    out = args.out
    sc = args.scale
    global N_CUSTOMER, N_SUPPLIER, N_PART, N_ORDERS, N_LINEITEM_ORDERS
    global N_EVENTS, N_DOCS, N_EMB
    if sc != 1.0:
        N_CUSTOMER = max(10, int(N_CUSTOMER * sc))
        N_SUPPLIER = max(10, int(N_SUPPLIER * sc))
        N_PART = max(10, int(N_PART * sc))
        N_ORDERS = max(10, int(N_ORDERS * sc))
        N_LINEITEM_ORDERS = N_ORDERS
        N_EVENTS = max(10, int(N_EVENTS * sc))
        N_DOCS = max(10, int(N_DOCS * sc))
        N_EMB = max(10, int(N_EMB * sc))
    os.makedirs(out, exist_ok=True)
    rng = np.random.Generator(np.random.PCG64(42))

    # static dims: verbatim copies
    for t in ("region", "nation"):
        pq.write_table(pq.read_table(os.path.join(SRC, f"{t}.parquet")), os.path.join(out, f"{t}.parquet"))
        print(f"  {t}: copied from sf0.1")

    # customer
    keys = np.arange(N_CUSTOMER, dtype="int64")
    _write(out, "customer", pa.table({
        "c_custkey": keys,
        "c_name": [f"Customer#{k:09d}" for k in keys],
        "c_nationkey": rng.integers(0, 25, N_CUSTOMER).astype("int32"),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUSTOMER), 2),
        "c_mktsegment": rng.choice(_SEGMENTS, N_CUSTOMER).tolist(),
    }))

    keys = np.arange(N_SUPPLIER, dtype="int64")
    _write(out, "supplier", pa.table({
        "s_suppkey": keys,
        "s_name": [f"Supplier#{k:09d}" for k in keys],
        "s_nationkey": rng.integers(0, 25, N_SUPPLIER).astype("int32"),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPPLIER), 2),
    }))

    keys = np.arange(N_PART, dtype="int64")
    _write(out, "part", pa.table({
        "p_partkey": keys,
        "p_name": [
            f"{w} {p}"
            for w, p in zip(rng.choice(_PSIZES_W, N_PART), rng.choice(_PWORDS, N_PART))
        ],
        "p_brand": [f"Brand#{b}" for b in rng.integers(1, 26, N_PART)],
        "p_type": rng.choice(_PTYPES, N_PART).tolist(),
        "p_size": rng.integers(1, 51, N_PART).astype("int32"),
        "p_retailprice": np.round(rng.uniform(900, 1000, N_PART), 2),
    }))

    okeys = np.arange(N_ORDERS, dtype="int64")
    odates = _ts_us("1995-01-01", 2404, rng, N_ORDERS)  # through 2001-08
    _write(out, "orders", pa.table({
        "o_orderkey": okeys,
        "o_custkey": rng.integers(0, N_CUSTOMER, N_ORDERS),
        "o_orderstatus": rng.choice(_STATUS, N_ORDERS, p=[0.49, 0.02, 0.49]).tolist(),
        "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORDERS), 2),
        "o_orderdate": odates,
        "o_orderpriority": rng.choice(_PRIO, N_ORDERS).tolist(),
    }))

    # lineitem: 1..7 lines per order (mean ~4)
    nlines = rng.integers(1, 8, N_LINEITEM_ORDERS)
    lo = np.repeat(okeys, nlines)
    n = lo.size
    linenum = np.concatenate([np.arange(1, k + 1) for k in nlines]).astype("int32")
    qty = rng.integers(1, 51, n).astype("float64")
    price = np.round(rng.uniform(900, 2100, n), 2)
    ship = np.repeat(odates.astype("int64"), nlines) + rng.integers(
        1, 95, n
    ) * 86_400_000_000
    _write(out, "lineitem", pa.table({
        "l_orderkey": lo,
        "l_partkey": rng.integers(0, N_PART, n),
        "l_suppkey": rng.integers(0, N_SUPPLIER, n),
        "l_linenumber": linenum,
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * price, 2),
        "l_discount": np.round(rng.integers(0, 11, n) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n) / 100.0, 2),
        "l_returnflag": rng.choice(_RFLAG, n, p=[0.5, 0.25, 0.25]).tolist(),
        "l_linestatus": rng.choice(_LSTATUS, n).tolist(),
        "l_shipdate": ship.astype("datetime64[us]"),
    }))

    _write(out, "events", pa.table({
        "event_id": np.arange(N_EVENTS, dtype="int64"),
        "ts": np.sort(_ts_us("2024-01-01", 30, rng, N_EVENTS)),
        "user_id": rng.integers(0, 15000, N_EVENTS),
        "event_type": rng.choice(_ETYPES, N_EVENTS).tolist(),
        "value": np.round(rng.uniform(0, 561, N_EVENTS), 2),
        "props": [f'{{"k": {v}}}' for v in rng.integers(0, 100, N_EVENTS)],
    }))

    # documents: bag-of-words from the sf0.1 vocabulary, 40-90 words,
    # ~0.2% planted exact duplicates (sf0.1 measured 8 dup texts / 5000)
    texts: list[str] = []
    for i in range(N_DOCS):
        if i > 0 and rng.random() < 0.002:
            texts.append(texts[int(rng.integers(0, i))])  # planted dup
        else:
            k = int(rng.integers(40, 91))
            texts.append(" ".join(rng.choice(_VOCAB, k)))
    _write(out, "documents", pa.table({
        "doc_id": np.arange(N_DOCS, dtype="int64"),
        "text": texts,
        "lang": rng.choice(_LANGS, N_DOCS, p=_LANG_P).tolist(),
        "source": [f"src{s}" for s in rng.integers(0, 20, N_DOCS)],
        "n_chars": np.array([len(t) for t in texts], dtype="int64"),
    }))

    # embeddings: unit-norm float32, 10 labels (4x sf0.1, mirroring the
    # driver's own sublinear growth — the exact eval-baselines are
    # deliberately quadratic and documented as eval-only)
    vecs = rng.standard_normal((N_EMB, EMB_DIM)).astype("float32")
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb_type = pa.list_(pa.float32())
    _write(out, "embeddings", pa.table({
        "vec_id": np.arange(N_EMB, dtype="int64"),
        "embedding": pa.array([v.tolist() for v in vecs], type=emb_type),
        "label": rng.integers(0, 10, N_EMB).astype("int32"),
    }))
    print(f"sf1 written to {out}")


if __name__ == "__main__":
    main()
