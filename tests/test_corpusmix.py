"""Tests for the corpus-assembly operators (operators/corpusmix.py).

Exact values are pinned bit-for-bit by the DuckDB oracle gate; here each
operator gets an INDEPENDENT python/pandas reference plus the semantic
invariants that make it fit for its pipeline job (reproducibility,
budget-maximality, coverage-minimality, mixture flattening) and the plan
shape that makes it fit for 100 TB (no global window over the corpus)."""

from __future__ import annotations

import pyspark.sql.functions as F

from projet_data_engineering_spark.operators.corpusmix import (
    N_SHARDS,
    TOKEN_BUDGET,
    q_domain_temperature,
    q_shuffle_shard,
    q_token_budget,
    q_vocab_coverage,
)
from projet_data_engineering_spark.plans.explain import (
    unbounded_global_windows,
)
from tests.conftest import SF_DIR


def _docs_pdf(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text", "source", "n_chars")
        .toPandas()
    )


# ---------------------------------------------------------------------------
# q_shuffle_shard
# ---------------------------------------------------------------------------


def test_shuffle_shard_is_a_permutation_with_contiguous_positions(spark):
    out = q_shuffle_shard(spark, SF_DIR).toPandas()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    # every doc exactly once, shard ids in range
    assert len(out) == n_docs and out["doc_id"].nunique() == n_docs
    assert out["shard"].between(0, N_SHARDS - 1).all()
    # positions within each shard are exactly 1..len(shard)
    for _, g in out.groupby("shard"):
        assert sorted(g["pos"]) == list(range(1, len(g) + 1))


def test_shuffle_shard_is_reproducible_and_keyed_not_positional(spark):
    a = q_shuffle_shard(spark, SF_DIR).toPandas().set_index("doc_id")
    b = q_shuffle_shard(spark, SF_DIR).toPandas().set_index("doc_id")
    assert a.sort_index().equals(b.sort_index())


# ---------------------------------------------------------------------------
# q_token_budget
# ---------------------------------------------------------------------------


def _greedy_reference(pdf, budget):
    """Independent pandas reference: global greedy prefix in score order."""
    pdf = pdf.copy()
    pdf["ntok"] = pdf["text"].str.split(" ").map(len)
    pdf["score"] = pdf["n_chars"] / pdf["ntok"]
    pdf = pdf.sort_values(["score", "doc_id"], ascending=[False, True])
    keep, cum = [], 0
    for _, r in pdf.iterrows():
        if cum + r["ntok"] > budget:
            break
        cum += r["ntok"]
        keep.append(int(r["doc_id"]))
    return set(keep), cum


def test_token_budget_matches_global_greedy_reference(spark):
    got = q_token_budget(spark, SF_DIR).toPandas()
    want, want_cum = _greedy_reference(_docs_pdf(spark), TOKEN_BUDGET)
    assert set(got["doc_id"]) == want
    assert got["n_tokens"].sum() == want_cum <= TOKEN_BUDGET


def test_token_budget_plan_has_no_global_window_over_corpus(spark):
    # the whole point of the banded plan: the oracle's global cumsum shape
    # must NOT appear — only aggregate-bounded or per-band windows.
    assert unbounded_global_windows(q_token_budget(spark, SF_DIR)) == []


# ---------------------------------------------------------------------------
# q_vocab_coverage
# ---------------------------------------------------------------------------


def test_vocab_coverage_is_minimal_prefix_reaching_95pct(spark):
    out = q_vocab_coverage(spark, SF_DIR).toPandas().sort_values("cum")
    pdf = _docs_pdf(spark)
    counts = (
        pdf["text"].str.lower().str.split(" ").explode().value_counts()
    )
    total = int(counts.sum())
    kept = int(out["c"].sum())
    # reaches the target...
    assert kept * 20 >= total * 19
    # ...and is minimal: without its last (rarest) term it falls short
    assert (kept - int(out.iloc[-1]["c"])) * 20 < total * 19
    # counts agree with the independent pandas dictionary
    for term, c in zip(out["term"], out["c"]):
        assert counts[term] == c


def test_vocab_coverage_windows_are_aggregate_bounded(spark):
    assert unbounded_global_windows(q_vocab_coverage(spark, SF_DIR)) == []


# ---------------------------------------------------------------------------
# q_domain_temperature
# ---------------------------------------------------------------------------


def test_domain_temperature_flattens_the_mixture(spark):
    out = q_domain_temperature(spark, SF_DIR).toPandas()
    assert abs(out["weight"].sum() - 1.0) < 1e-3
    # tau=2 flattening: the weight ratio between the biggest and smallest
    # domain must be strictly milder than their token-share ratio
    big, small = out.loc[out["n_toks"].idxmax()], out.loc[out["n_toks"].idxmin()]
    assert 1.0 < big["weight"] / small["weight"] < big["n_toks"] / small["n_toks"]
    # repeat_factor == weight * N / n_toks (recomputed independently)
    n = out["n_toks"].sum()
    for _, r in out.iterrows():
        assert abs(r["repeat_factor"] - r["weight"] * n / r["n_toks"]) < 2e-3


def test_domain_temperature_upweights_tail_domains(spark):
    out = q_domain_temperature(spark, SF_DIR).toPandas()
    # under tau=2 every below-average domain is repeated MORE than once
    # relative to proportional sampling, and above-average ones less
    mean_toks = out["n_toks"].mean()
    tail = out[out["n_toks"] < mean_toks * 0.5]
    if len(tail):
        assert (tail["repeat_factor"] > 1.0).all()


# ---------------------------------------------------------------------------
# domain_resample (r7)
# ---------------------------------------------------------------------------


def test_domain_resample_tracks_expected_mixture(spark):
    """Per domain: every copy count is floor(rf) or ceil(rf), the realized
    doc count sits within a binomial-plausible band of n_docs·rf, and the
    output is exactly reproducible run-to-run (deterministic Bernoulli)."""
    import collections

    from tests.conftest import SF_DIR

    from projet_data_engineering_spark.operators.corpusmix import (
        q_domain_resample,
        q_domain_temperature,
    )

    rf = {
        r["source"]: r["repeat_factor"]
        for r in q_domain_temperature(spark, SF_DIR).collect()
    }
    rows = q_domain_resample(spark, SF_DIR).collect()
    rows2 = q_domain_resample(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))

    per_doc = collections.Counter((r["doc_id"], r["source"]) for r in rows)
    n_in = collections.Counter()
    n_out = collections.Counter()
    for (doc, src), c in per_doc.items():
        import math

        lo, hi = math.floor(rf[src]), math.ceil(rf[src])
        assert lo <= c <= max(hi, 1), (doc, src, c, rf[src])
        n_in[src] += 1
        n_out[src] += c
    # copy_idx is a contiguous 1..c run per doc
    idx = collections.defaultdict(set)
    for r in rows:
        idx[r["doc_id"]].add(r["copy_idx"])
    for doc, s in idx.items():
        assert s == set(range(1, len(s) + 1)), doc
    # realized count near expectation: ±4·sqrt(n) (≈4σ of the binomial)
    for src, n in n_in.items():
        import math

        expect = n * rf[src]
        assert abs(n_out[src] - expect) <= 4 * math.sqrt(n) + 1, (
            src, n_out[src], expect,
        )


def test_domain_resample_is_map_only(spark):
    from tests.conftest import SF_DIR

    from projet_data_engineering_spark.operators.corpusmix import (
        q_domain_resample,
    )
    from projet_data_engineering_spark.plans.explain import formatted_plan

    plan = formatted_plan(q_domain_resample(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # the |domains| weight table broadcasts; the corpus side never exchanges
    # except for the weight aggregate itself
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
