"""Gopher rules, label propagation, k-anonymity (r7 continuation)."""

from __future__ import annotations

from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pyspark.sql.functions as F

from projet_data_engineering_spark.io import load_table
from projet_data_engineering_spark.registry import all_queries
from tests.conftest import SF_DIR

Q = all_queries()


def test_gopher_rules_match_python_replica(spark):
    from projet_data_engineering_spark.operators.textanalysis import (
        GOPHER_ALPHA_MIN,
        GOPHER_MIN_WORDS,
        GOPHER_STOP_MIN,
        GOPHER_STOPWORDS,
        GOPHER_WL_HI,
        GOPHER_WL_LO,
    )

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    got = {r["doc_id"]: r for r in Q["q_gopher_rules"](spark, SF_DIR).collect()}
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        w = [t for t in text.lower().split(" ") if t]
        r = got[doc_id]
        assert r["n_words"] == len(w)

        def r4(x: float) -> float:
            # Spark's ROUND is HALF_UP on the decimal rendering; python's
            # round() is banker's — emulate Spark
            return float(
                Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP)
            )

        mean_wl = r4(sum(len(t) for t in w) / len(w))
        alpha = r4(sum(1 for t in w if any(c.isalpha() for c in t)) / len(w))
        stop = sum(1 for t in w if t in GOPHER_STOPWORDS)
        assert abs(r["mean_word_len"] - mean_wl) < 1e-9
        assert abs(r["alpha_ratio"] - alpha) < 1e-9
        assert r["stop_hits"] == stop
        want = int(
            GOPHER_MIN_WORDS <= len(w)
            and GOPHER_WL_LO <= mean_wl <= GOPHER_WL_HI
            and alpha >= GOPHER_ALPHA_MIN
            and stop >= GOPHER_STOP_MIN
        )
        assert r["pass_flag"] == want


def test_gopher_filter_actually_bites(spark):
    rows = Q["q_gopher_rules"](spark, SF_DIR).collect()
    n_pass = sum(r["pass_flag"] for r in rows)
    assert 0 < n_pass < len(rows)  # a gate that passes/fails everything is vacuous


def _py_lpa(edges, rounds):
    sym = {}
    for a, b in edges:
        sym.setdefault(a, []).append(b)
        sym.setdefault(b, []).append(a)
    labels = {n: n for n in sym}
    for _ in range(rounds):
        new = {}
        for n, nbrs in sym.items():
            c = Counter(labels[m] for m in nbrs)
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        labels = new
    return labels


def test_label_prop_matches_python_replica(spark):
    from projet_data_engineering_spark.operators.graph import (
        LPA_ROUNDS,
        _copurchase_edges,
    )

    edges = [
        (r["p1"], r["p2"])
        for r in _copurchase_edges(spark, SF_DIR).collect()
    ]
    want = _py_lpa(edges, LPA_ROUNDS)
    got = {
        r["node"]: r["community"]
        for r in Q["q_label_prop"](spark, SF_DIR).collect()
    }
    assert got == want


def test_label_prop_communities_respect_components(spark):
    """A community label never spans two connected components — LPA refines
    reachability, it can't merge across it."""
    from projet_data_engineering_spark.operators.graph import _copurchase_edges

    edges = [
        (r["p1"], r["p2"])
        for r in _copurchase_edges(spark, SF_DIR).collect()
    ]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    comm = {
        r["node"]: r["community"]
        for r in Q["q_label_prop"](spark, SF_DIR).collect()
    }
    by_label = {}
    for node, label in comm.items():
        by_label.setdefault(label, set()).add(find(node))
    assert all(len(roots) == 1 for roots in by_label.values())


def test_k_anonymity_flags_small_groups_exactly(spark):
    from projet_data_engineering_spark.operators.datapipe import (
        KANON_BAND,
        KANON_K,
    )

    cust = load_table(spark, SF_DIR, "customer").collect()
    sizes = Counter(
        (r["c_nationkey"], r["c_mktsegment"], int(r["c_acctbal"] // KANON_BAND))
        for r in cust
    )
    rows = Q["q_k_anonymity"](spark, SF_DIR).collect()
    assert len(rows) == len(sizes)
    for r in rows:
        key = (r["nationkey"], r["segment"], r["bal_band"])
        assert r["group_size"] == sizes[key]
        assert r["anon_ok"] == int(sizes[key] >= KANON_K)
    # at the tiny fixture every class is correctly risky; two-sidedness
    # (some classes pass, some fail) needs the bigger corpus
    flags01 = [
        r["anon_ok"]
        for r in Q["q_k_anonymity"](spark, "/root/testdata/sf0.01").collect()
    ]
    assert 0 in flags01 and 1 in flags01
