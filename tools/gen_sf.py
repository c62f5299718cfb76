#!/usr/bin/env python
"""Deterministic synthetic-data generator for scale factors the driver does
not ship (TESTDATA.md provides sf0.001/0.01/0.1; SCALING.md's measured
evidence needs sf1.0). Mirrors the driver tables' schemas, value domains and
distributions (inspected from /root/testdata/sf0.1 — categorical domains,
key densities, date windows, Poisson-4 lines per order, 31-word document
vocabulary, label-clustered embeddings) at ``sf`` times the sf1.0 base
counts. Correctness at the generated scale is still Spark-vs-DuckDB on the
SAME files, so distribution fidelity only affects how MEANINGFUL the queries
are (selective filters stay selective), never whether the gate can pass.

Usage: python tools/gen_sf.py [out_dir] [sf]   (defaults: .localdata/sf1.0 1.0)

Writes one parquet per table with timestamp[us] (no tz) columns — the same
physical annotation the driver files carry, so ``io.load_table`` exercises
the identical TIMESTAMP_NTZ path.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
STATUSES = ["F", "O", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
# exact driver word sets (distinct p_name words observed in sf0.1) — literal
# filters like contains('widget') / rlike('widget|gear|cog') /
# startswith('small') must stay selective-but-nonempty at generated scales
ADJECTIVES = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.5, 0.125, 0.125, 0.125, 0.125]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]

DAY_US = 86_400_000_000


def _ts_us(base: str, spread_days: float, n: int, rng) -> np.ndarray:
    """Random timestamp[us] offsets over a window starting at ``base``."""
    start = np.datetime64(base, "us").astype(np.int64)
    return start + (rng.random(n) * spread_days * DAY_US).astype(np.int64)


def _write(out_dir: str, name: str, cols: dict) -> None:
    arrays, fields = [], []
    for cname, data in cols.items():
        if isinstance(data, tuple) and data[0] == "ts":
            arr = pa.array(data[1], type=pa.timestamp("us"))
        else:
            arr = pa.array(data)
        arrays.append(arr)
        fields.append(pa.field(cname, arr.type))
    table = pa.Table.from_arrays(arrays, schema=pa.schema(fields))
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def generate(out_dir: str, sf: float = 1.0, seed: int = 42) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(out_dir, "region", {
        "r_regionkey": np.arange(5, dtype=np.int32),
        "r_name": REGIONS,
    })
    _write(out_dir, "nation", {
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype(np.int32),
    })
    _write(out_dir, "customer", {
        "c_custkey": np.arange(n_cust),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[
            rng.integers(0, len(SEGMENTS), n_cust)
        ],
    })
    _write(out_dir, "supplier", {
        "s_suppkey": np.arange(n_supp),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
    })
    _write(out_dir, "part", {
        "p_partkey": np.arange(n_part),
        "p_name": [
            f"{ADJECTIVES[a]} {NOUNS[b]}"
            for a, b in zip(
                rng.integers(0, len(ADJECTIVES), n_part),
                rng.integers(0, len(NOUNS), n_part),
            )
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": np.array(PTYPES)[rng.integers(0, len(PTYPES), n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    })
    _write(out_dir, "orders", {
        "o_orderkey": np.arange(n_ord),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": np.array(STATUSES)[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        # midnight-aligned days over the driver's 1995-01-01..2001-08-01 span
        "o_orderdate": (
            "ts",
            np.datetime64("1995-01-01", "us").astype(np.int64)
            + rng.integers(0, 2405, n_ord) * DAY_US,
        ),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    })
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    _write(out_dir, "lineitem", {
        "l_orderkey": rng.integers(0, n_ord, n_li),
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900, 2100, n_li), 2),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": (
            "ts",
            np.datetime64("1995-01-02", "us").astype(np.int64)
            + rng.integers(0, 2499, n_li) * DAY_US,
        ),
    })
    _write(out_dir, "events", {
        "event_id": np.arange(n_ev),
        "ts": ("ts", _ts_us("2024-01-01", 30.0, n_ev, rng)),
        "user_id": rng.integers(0, max(n_cust // 10, 1), n_ev),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    })
    # documents: 10..100 words from the 31-word vocabulary
    nw = rng.integers(10, 101, n_doc)
    widx = rng.integers(0, len(VOCAB), int(nw.sum()))
    texts = []
    pos = 0
    for k in nw:
        texts.append(" ".join(VOCAB[i] for i in widx[pos : pos + k]))
        pos += k
    _write(out_dir, "documents", {
        "doc_id": np.arange(n_doc),
        "text": texts,
        "lang": np.array(LANGS)[
            rng.choice(len(LANGS), n_doc, p=LANG_P)
        ],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })
    labels = rng.integers(0, 10, n_emb).astype(np.int32)
    centers = rng.normal(0.0, 0.02, (10, 64))
    vecs = (centers[labels] + rng.normal(0.0, 0.15, (n_emb, 64))).astype(
        np.float32
    )
    _write(out_dir, "embeddings", {
        "vec_id": np.arange(n_emb),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": labels,
    })


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1.0"
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    generate(out, sf)
    print(f"wrote sf={sf} to {out}")
