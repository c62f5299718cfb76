"""Skew-mitigation and sketch operators: salting must be result-invisible,
sketches must land within their error bounds."""

from __future__ import annotations

import pyspark.sql.functions as F

import __spark_entry__ as entrymod
from projet_data_engineering_spark.io import load_table
from projet_data_engineering_spark.operators.skew import salted_join
from tests.conftest import SF_DIR

Q = entrymod.queries()


def test_salted_join_matches_plain_join(spark):
    """Any n_salts must produce exactly the plain join's rows."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    plain = sorted(map(tuple, li.join(o, "l_orderkey").collect()))
    for n in (1, 4, 13):
        salted = sorted(
            map(
                tuple,
                salted_join(li, o, "l_orderkey", F.hash("l_linenumber"), n).collect(),
            )
        )
        assert salted == plain, f"n_salts={n}"


def test_salted_join_left_outer_keeps_unmatched(spark):
    """Outer semantics survive salting: unmatched big-side rows keep nulls."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    # shift keys so some miss
    o = load_table(spark, SF_DIR, "orders").select(
        (F.col("o_orderkey") + 1).alias("l_orderkey"), "o_orderstatus"
    )
    plain = li.join(o, "l_orderkey", "left").filter(
        F.col("o_orderstatus").isNull()
    ).count()
    salted = (
        salted_join(li, o, "l_orderkey", F.hash("l_linenumber"), 4, how="left")
        .filter(F.col("o_orderstatus").isNull())
        .count()
    )
    assert plain == salted and plain > 0


def test_approx_distinct_within_error_bound(spark):
    approx = {
        r["o_orderstatus"]: r["n_custkeys_approx"]
        for r in Q["q_approx_distinct"](spark, SF_DIR).collect()
    }
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in load_table(spark, SF_DIR, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        rel_err = abs(est - exact[k]) / max(exact[k], 1)
        assert rel_err <= 0.10, f"{k}: est={est} exact={exact[k]}"


def test_arrow_knn_matches_jvm_knn(spark):
    """The mapInPandas scoring path returns the identical top-20 as the
    JVM zip_with/aggregate fold."""
    jvm = [tuple(r) for r in Q["q_embed_knn"](spark, SF_DIR).collect()]
    arrow = [tuple(r) for r in Q["q_embed_knn_arrow"](spark, SF_DIR).collect()]
    assert arrow == jvm


def test_ivf_neighbors_subset_of_bruteforce_universe(spark):
    """IVF returns real neighbors: every (query, hit) pair's score must equal
    the brute-force cosine for that pair (IVF may miss pairs — it's
    approximate — but must never fabricate scores)."""
    from projet_data_engineering_spark.operators.similarity import as_double, cosine

    e = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    a, b = e.alias("a"), e.alias("b")
    all_pairs = {
        (r["q"], r["v"]): r["s"]
        for r in a.join(b, F.col("a.vec_id") < 3)
        .select(
            F.col("a.vec_id").alias("q"),
            F.col("b.vec_id").alias("v"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 4).alias("s"),
        )
        .collect()
    }
    for r in Q["q_ann_ivf"](spark, SF_DIR).collect():
        assert all_pairs[(r["query_id"], r["vec_id"])] == r["score"]


def test_sample_deterministic_and_bounded(spark):
    """Seeded sample: identical rows across re-runs; fraction within loose
    Bernoulli bounds."""
    a = sorted(r["doc_id"] for r in Q["q_sample"](spark, SF_DIR).collect())
    b = sorted(r["doc_id"] for r in Q["q_sample"](spark, SF_DIR).collect())
    assert a == b
    total = load_table(spark, SF_DIR, "documents").count()
    assert 0.1 * total <= len(a) <= 0.3 * total


def test_percentile_approx_close_to_exact(spark):
    approx = {
        r["l_returnflag"]: (r["p50_approx"], r["p95_approx"])
        for r in Q["q_percentile_approx"](spark, SF_DIR).collect()
    }
    exact = {
        r["l_returnflag"]: (r["p50"], r["p95"])
        for r in load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
        )
        .collect()
    }
    for k in exact:
        for a, e in zip(approx[k], exact[k]):
            assert abs(a - e) / max(abs(e), 1) < 0.05, (k, a, e)
