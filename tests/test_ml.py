"""K-means and unigram-surprisal tests: independent numpy Lloyd reference
for the training loop, corpus-accounting invariants for the LM score."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

import __spark_entry__ as entrymod
from projet_data_engineering_spark.io import load_table
from projet_data_engineering_spark.operators.ml import DIM, ITERS, K
from tests.conftest import SF_DIR

Q = entrymod.queries()


def _numpy_kmeans(vecs: dict[int, np.ndarray], k=K, iters=ITERS):
    """Independent dense reference of the exact algorithm: md5-bottom-k
    seeds, argmin with centroid-id tie-break, 6dp-rounded mean updates."""
    seed_ids = sorted(vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:k]
    cents = {cid + 1: vecs[i].copy() for cid, i in enumerate(seed_ids)}

    def assign():
        out = {}
        for i, v in vecs.items():
            best = min(
                ((float(((v - c) ** 2).sum()), cid) for cid, c in cents.items())
            )
            out[i] = best  # (d2, cid)
        return out

    for _ in range(iters):
        a = assign()
        new = {}
        for cid in set(cid for _, cid in a.values()):
            members = np.stack([vecs[i] for i, (_, c) in a.items() if c == cid])
            new[cid] = np.round(members.mean(axis=0), 6)
        cents = new
    a = assign()
    stats = {}
    for i, (d2, cid) in a.items():
        n, s = stats.get(cid, (0, 0.0))
        stats[cid] = (n + 1, s + d2)
    return {cid: (n, round(s, 3)) for cid, (n, s) in stats.items()}


def test_round6_matches_spark_round_on_boundaries(spark):
    """r12 (ADVICE r11): Spark ROUND(double, 6) goes through
    BigDecimal.valueOf = Double.toString — the SHORTEST round-trip repr —
    so _round6 must quantize Decimal(repr(x)), not Decimal(x)'s exact
    binary expansion. 0.1234565 (binary 0.12345649999…) and 5e-07 are the
    boundary cases where the two disagree; a grid of non-boundary values
    guards the common path. DuckDB (the oracle engine) agrees on both."""
    import duckdb
    from pyspark.sql import functions as F

    from projet_data_engineering_spark.operators.ml import _round6

    cases = [
        0.1234565,   # exact-binary rounds DOWN, shortest-repr rounds UP
        5e-07,       # exact-binary 0.0, shortest-repr 1e-06
        -0.1234565,
        0.123456789, 1.0000005, 2.5e-07, 0.0, 1.0, -3.1415926535,
        123.4567894999, 1e-12, 0.9999995,
    ]
    assert _round6(0.1234565) == 0.123457
    assert _round6(5e-07) == 1e-06
    got_spark = (
        spark.createDataFrame([(x,) for x in cases], "x double")
        .select(F.round("x", 6).alias("r"))
        .collect()
    )
    for x, row in zip(cases, got_spark):
        assert _round6(x) == row["r"], f"_round6({x!r}) != Spark ROUND"
    for x in cases:
        (dd,) = duckdb.sql(
            f"SELECT ROUND(CAST({x!r} AS DOUBLE), 6)"
        ).fetchone()
        assert _round6(x) == dd, f"_round6({x!r}) != DuckDB ROUND"


def test_kmeans_matches_numpy_reference(spark):
    emb = load_table(spark, SF_DIR, "embeddings").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb}
    want = _numpy_kmeans(vecs)
    got = {
        r["centroid_id"]: (r["n_members"], r["inertia"])
        for r in Q["q_kmeans"](spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for cid in want:
        assert got[cid][0] == want[cid][0]
        assert got[cid][1] == pytest.approx(want[cid][1], abs=1e-2)
    assert sum(n for n, _ in got.values()) == len(vecs)


def test_doc_logprob_accounts_every_token(spark):
    rows = Q["q_doc_logprob"](spark, SF_DIR).collect()
    tok = Q["q_token_count"](spark, SF_DIR).collect()
    assert sum(r["n_tokens"] for r in rows) == sum(r["total_tokens"] for r in tok)
    assert all(r["avg_nll"] > 0 for r in rows)
    # a token seen only once is maximally surprising: every doc's mean
    # surprisal is bounded by ln(N) (probability floor 1/N)
    n_total = sum(r["total_tokens"] for r in tok)
    assert all(r["avg_nll"] <= np.log(n_total) + 1e-9 for r in rows)


def test_kmeans_assignment_is_map_only(spark):
    from projet_data_engineering_spark.plans.explain import formatted_plan

    plan = formatted_plan(Q["q_kmeans"](spark, SF_DIR))
    # r11: the k-row model is collected (bounded by construction) and
    # assignment runs as one Arrow pass — no join of any kind, and the only
    # exchange in the final-assignment plan is the k-row stats aggregate,
    # never a corpus shuffle keyed by vec_id
    assert "MapInPandas" in plan
    assert "Join" not in plan
    assert "hashpartitioning(vec_id" not in plan
    assert plan.count("Exchange") <= 2  # tree + details of the ONE cid agg


def test_doc_logprob_folds_total_as_broadcast(spark):
    from projet_data_engineering_spark.plans.explain import formatted_plan

    plan = formatted_plan(Q["q_doc_logprob"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row N aggregate
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# logistic regression (r7)
# ---------------------------------------------------------------------------


def _numpy_logreg(feats, lr, iters):
    """Pure-numpy replica of logreg_weights' contract: full-batch GD with
    per-iteration 6dp rounding."""
    X = np.array([[1.0, x1, x2, x3] for x1, x2, x3, _ in feats])
    y = np.array([row[3] for row in feats])
    w = np.zeros(4)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        grad = ((p - y)[:, None] * X).mean(axis=0)
        w = np.round(w - lr * grad, 6)
    return w


def test_logreg_matches_numpy_reference(spark):
    from projet_data_engineering_spark.operators.ml import (
        LR_FEATURES,
        LR_ITERS,
        LR_RATE,
        _doc_features,
        logreg_weights,
    )

    docs = load_table(spark, SF_DIR, "documents")
    feats = [
        (r["x1"], r["x2"], r["x3"], r["y"])
        for r in _doc_features(docs).collect()
    ]
    want = _numpy_logreg(feats, LR_RATE, LR_ITERS)
    got = logreg_weights(docs).collect()[0]
    for i in range(4):
        assert got[f"w{i}"] == pytest.approx(want[i], abs=2e-6), LR_FEATURES[i]


def test_logreg_learns_a_nontrivial_boundary(spark):
    """The trained model must beat always-predict-majority on its own
    training labels and use BOTH classes in its predictions (guards
    against the degenerate all-one-class model a too-small step yields)."""
    rows = Q["q_logreg_confusion"](spark, SF_DIR).collect()
    n = {(r["label"], r["predicted"]): r["n"] for r in rows}
    total = sum(n.values())
    correct = n.get((0, 0), 0) + n.get((1, 1), 0)
    majority = max(
        sum(v for (lab, _), v in n.items() if lab == 1),
        sum(v for (lab, _), v in n.items() if lab == 0),
    )
    assert {p for (_, p) in n} == {0, 1}
    assert correct > majority
    assert correct / total > 0.6


# ---------------------------------------------------------------------------
# AUC + PCA (r7)
# ---------------------------------------------------------------------------


def test_logreg_auc_matches_brute_force_pair_count(spark):
    """The rank-statistic AUC must equal the O(P·N) pair-counting
    definition (ties worth 1/2) computed in pure python on the same
    6dp-rounded scores."""
    from projet_data_engineering_spark.operators.ml import (
        _doc_features,
        logreg_weights,
    )

    docs = load_table(spark, SF_DIR, "documents")
    w = logreg_weights(docs).collect()[0]
    scored = [
        (
            round(
                w["w0"] + w["w1"] * r["x1"] + w["w2"] * r["x2"] + w["w3"] * r["x3"],
                6,
            ),
            r["y"],
        )
        for r in _doc_features(docs).collect()
    ]
    pos = [z for z, y in scored if y == 1.0]
    neg = [z for z, y in scored if y == 0.0]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    want = wins / (len(pos) * len(neg))

    got = Q["q_logreg_auc"](spark, SF_DIR).collect()[0]
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    assert got["auc"] == pytest.approx(want, abs=2e-6)
    # trained model must actually rank: better than coin-flip
    assert got["auc"] > 0.7


def _numpy_pca_power(X, iters):
    """Pure-numpy replica of pca_power's exact contract: 6dp-rounded mean,
    6dp-rounded covariance image each round, renormalize from the rounded
    image and round again."""
    mu = np.round(X.mean(axis=0), 6)
    v = np.full(X.shape[1], 0.125)
    eig = 0.0
    for _ in range(iters):
        c = X - mu
        u = np.round((c * (c @ v)[:, None]).mean(axis=0), 6)
        norm = np.sqrt((u * u).sum())
        v = np.round(u / norm, 6)
        eig = round(float(norm), 6)
    return mu, v, eig


def test_pca_power_matches_numpy_reference(spark):
    from projet_data_engineering_spark.operators.ml import PCA_ITERS

    emb = load_table(spark, SF_DIR, "embeddings").collect()
    X = np.array([[float(x) for x in r["embedding"]] for r in emb])
    mu, v, eig = _numpy_pca_power(X, PCA_ITERS)

    rows = sorted(Q["q_pca_power"](spark, SF_DIR).collect(), key=lambda r: r["dim_idx"])
    assert len(rows) == X.shape[1]
    for i, r in enumerate(rows):
        assert r["mean"] == pytest.approx(mu[i], abs=2e-6), i
        assert r["loading"] == pytest.approx(v[i], abs=2e-6), i
        assert r["eigenvalue"] == pytest.approx(eig, abs=2e-6)


def test_pca_power_finds_the_dominant_direction(spark):
    """On the real corpus: the loading is unit-norm, the eigenvalue is
    positive and bounded by total variance, and the Rayleigh quotient of
    the returned direction beats every single coordinate axis — i.e. 3
    rounds already found a better-than-axis-aligned direction."""


    emb = load_table(spark, SF_DIR, "embeddings").collect()
    X = np.array([[float(x) for x in r["embedding"]] for r in emb])
    rows = sorted(Q["q_pca_power"](spark, SF_DIR).collect(), key=lambda r: r["dim_idx"])
    v = np.array([r["loading"] for r in rows])
    eig = rows[0]["eigenvalue"]

    assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-4)
    c = X - X.mean(axis=0)
    total_var = (c * c).sum(axis=1).mean()
    assert 0.0 < eig <= total_var + 1e-9
    axis_best = (c * c).mean(axis=0).max()
    rayleigh = ((c @ v) ** 2).mean()
    assert rayleigh > axis_best


def test_pca_project_matches_numpy_reference(spark):
    """Per-label projection stats must equal a numpy replay of the exact
    contract (6dp-rounded projections, then sample-std), and the label
    counts must partition the corpus."""
    from projet_data_engineering_spark.operators.ml import PCA_ITERS

    emb = load_table(spark, SF_DIR, "embeddings").collect()
    X = np.array([[float(x) for x in r["embedding"]] for r in emb])
    labels = np.array([r["label"] for r in emb])
    mu, v, _ = _numpy_pca_power(X, PCA_ITERS)
    p = np.round((X - mu) @ v, 6)

    rows = {r["label"]: r for r in Q["q_pca_project"](spark, SF_DIR).collect()}
    assert sum(r["n"] for r in rows.values()) == len(emb)
    for lab in np.unique(labels):
        sel = p[labels == lab]
        r = rows[int(lab)]
        assert r["n"] == len(sel)
        assert r["mean_proj"] == pytest.approx(round(float(sel.mean()), 5), abs=2e-5)
        assert r["std_proj"] == pytest.approx(
            round(float(sel.std(ddof=1)), 5), abs=2e-5
        )
