"""The composed curation pipeline (recipes/curation.py): stage-vs-standalone
parity and the invariants the composition must preserve (VERDICT r6 item 5).
Each stage is oracle-checked on its own as a registered query; these tests
pin that the COMPOSITION computes the same relations and that the funnel
accounting is self-consistent."""

import pytest

from pyspark.sql import functions as F

from projet_data_engineering_spark.io import load_table, spread
from projet_data_engineering_spark.recipes.curation import curate_corpus
from tests.conftest import SF_DIR


def _run(spark):
    docs = spread(load_table(spark, SF_DIR, "documents"), "doc_id")
    return docs, curate_corpus(docs)


def test_funnel_is_monotone_and_consistent(spark):
    docs, out = _run(spark)
    try:
        funnel = {
            r["stage"]: (r["n_docs"], r["n_tokens"])
            for r in out["funnel"].collect()
        }
        # docs only ever leave the corpus through stages 0->4
        chain = ["0_raw", "1_dedup", "2_quality", "3_decontaminated",
                 "4_redacted"]
        for a, b in zip(chain, chain[1:]):
            assert funnel[a][0] >= funnel[b][0]
            assert funnel[a][1] >= funnel[b][1]
        assert funnel["0_raw"][0] == docs.count()
        # stage 4 == stage 3 (redaction drops nothing, only rewrites)
        assert funnel["4_redacted"] == funnel["3_decontaminated"]
        # splits partition stage 4 exactly
        split_docs = sum(
            v[0] for k, v in funnel.items() if k.startswith("5_split_")
        )
        assert split_docs == funnel["4_redacted"][0]
        # packing conserves train tokens bit-for-bit
        train = funnel.get("5_split_train", (0, 0))
        assert funnel["6_train_windows"][1] == train[1]
    finally:
        out["_labels"].unpersist()
        out["_contaminated"].unpersist()


@pytest.mark.slow
def test_dedup_stage_matches_standalone_query(spark):
    """Stage-1 survivors equal q_dedup_apply's survivor relation (the
    standalone dedup-applied query) — same drop list, reused labels."""
    from projet_data_engineering_spark.operators.dedup import q_dedup_apply

    docs, out = _run(spark)
    try:
        standalone = {
            r["lang"]: r["n_docs"]
            for r in q_dedup_apply(spark, SF_DIR).collect()
        }
        funnel = {
            r["stage"]: r["n_docs"] for r in out["funnel"].collect()
        }
        assert funnel["1_dedup"] == sum(standalone.values())
    finally:
        out["_labels"].unpersist()
        out["_contaminated"].unpersist()


def test_no_contaminated_doc_and_no_eval_doc_survives(spark):
    """Every doc q_contamination flags (shares a 5-gram with the eval
    probe), and every eval-probe doc itself, is absent from the shipped
    splits."""
    from projet_data_engineering_spark.operators.textanalysis import (
        q_contamination,
    )

    _, out = _run(spark)
    try:
        shipped = {r["doc_id"] for r in out["splits"].collect()}
        flagged = {
            r["doc_id"] for r in q_contamination(spark, SF_DIR).collect()
        }
        assert flagged, "test corpus should contain contamination"
        assert not (shipped & flagged)
        assert not any(d % 97 == 0 for d in shipped)
    finally:
        out["_labels"].unpersist()
        out["_contaminated"].unpersist()


def test_split_is_leakage_safe_on_cluster_roots(spark):
    """Split membership is a pure function of the near-dup cluster ROOT.
    After dedup only roots ship (root == doc_id for every survivor), so the
    per-root check alone would be vacuous; the live property is about the
    DROPPED cluster members: had any of them shipped instead (loosened
    threshold, corpus growth re-introducing a near-dup), root-keying sends
    it to its root's split, while doc-id-keying would scatter real clusters
    across splits — assert both halves on the reused labels."""

    def bucket_of(col):
        return F.conv(
            F.substring(F.md5(col.cast("string")), 1, 2), 16, 10
        ).cast("int")

    def split_of(b):
        return (
            F.when(b < 13, "test").when(b < 26, "valid").otherwise("train")
        )

    _, out = _run(spark)
    try:
        assert (
            out["splits"].groupBy("root")
            .agg(F.countDistinct("split").alias("n"))
            .filter("n > 1")
            .count()
            == 0
        )
        # every shipped doc IS its cluster root -> keyed correctly
        assert out["splits"].filter("root <> doc_id").count() == 0
        members = out["_labels"].filter(F.col("doc_id") != F.col("root"))
        assert members.count() > 0, "corpus should contain near-dup clusters"
        judged = members.select(
            split_of(bucket_of(F.col("doc_id"))).alias("by_doc"),
            split_of(bucket_of(F.col("root"))).alias("by_root"),
        )
        # doc-keying would actually scatter (the leak root-keying closes)
        assert judged.filter("by_doc <> by_root").count() > 0
        # and the root-keyed assignment of a member equals its shipped
        # root's split wherever the root survived to ship
        shipped = out["splits"].select(
            F.col("root").alias("r"), F.col("split").alias("ship_split")
        )
        mism = (
            members.join(shipped, members["root"] == shipped["r"])
            .withColumn("member_split", split_of(bucket_of(F.col("root"))))
            .filter("member_split <> ship_split")
        )
        assert mism.count() == 0
    finally:
        out["_labels"].unpersist()
        out["_contaminated"].unpersist()


def test_redaction_scrubs_planted_pii(spark):
    """Plant synthetic PII in the text column; the pipeline's redaction
    stage must scrub it and count it, doc for doc."""
    docs = spread(load_table(spark, SF_DIR, "documents"), "doc_id")
    planted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" reach me at someone@example.com or +1-555-"),
            (F.col("doc_id") % 10000).cast("string"),
        ),
    )
    out = curate_corpus(planted)
    try:
        s = out["splits"]
        assert s.filter(F.col("n_pii") < 2).count() == 0
        assert (
            s.filter(
                F.col("redacted").contains("example.com")
                | F.col("redacted").rlike(r"\+1-555-[0-9]")
            ).count()
            == 0
        )
        assert s.filter(
            F.col("redacted").contains("<EMAIL>")
            & F.col("redacted").contains("<PHONE>")
        ).count() == s.count()
    finally:
        out["_labels"].unpersist()
        out["_contaminated"].unpersist()
