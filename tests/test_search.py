"""Search subsystem properties (SURVEY.md §5.2.3): match-set semantics are
exact (golden rows); BM25 scores are property-tested, not value-matched
(scores are engine-specific — parity with ES scores is a non-goal)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from projet_data_engineering_spark.operators.search import (
    bm25_scores,
    build_posting_lists,
    search_topk,
    should_search,
)

DOCS = [
    Row(doc_id=1, text="chocolate cake with dark chocolate icing"),
    Row(doc_id=2, text="vanilla cake"),
    Row(doc_id=3, text="chocolat tart"),  # 1 edit from 'chocolate' tokens? no: fuzzy vs contains
    Row(doc_id=4, text="fruit salad, no sugar"),
    Row(doc_id=5, text="1egg omelette with cheese"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS)


def test_should_search_min_match(docs):
    out = should_search(docs, "text", ["chocolate", "cake"], min_should_match=1)
    got = {r["doc_id"]: r["matched_clauses"] for r in out.collect()}
    assert got[1] == 2       # both clauses
    assert got[2] == 1       # cake only
    assert 4 not in got      # no clause → filtered


def test_fuzzy_clause_catches_typo(docs):
    # 'chocolate' (len 9 ⇒ fuzziness 2) fuzzy-matches token 'chocolat'
    out = should_search(docs, "text", ["chocolate"], min_should_match=1)
    ids = {r["doc_id"] for r in out.collect()}
    assert 3 in ids


def test_wildcard_catches_glued_token(docs):
    # reference app/main.py:128-136 — '*egg*' catches '1egg'
    out = should_search(docs, "text", ["egg"], min_should_match=1)
    ids = {r["doc_id"] for r in out.collect()}
    assert 5 in ids


def test_bm25_more_matches_scores_higher(docs):
    scores = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, "doc_id", "text", ["chocolate", "cake"]).collect()
    }
    # doc 1 matches both terms (chocolate ×2) — must outrank doc 2 (cake only)
    assert scores[1] > scores[2]


def test_topk_is_prefix_of_topk_plus_one(docs):
    top2 = [r["doc_id"] for r in search_topk(docs, "doc_id", "text", "chocolate cake", k=2).collect()]
    top3 = [r["doc_id"] for r in search_topk(docs, "doc_id", "text", "chocolate cake", k=3).collect()]
    assert top3[:2] == top2


def test_posting_lists_tf(docs):
    postings = {
        (r["term"], r["doc_id"]): r["tf"]
        for r in build_posting_lists(docs, "doc_id", "text").collect()
    }
    assert postings[("chocolate", 1)] == 2
    assert postings[("cake", 2)] == 1
    assert ("sugar", 4) in postings


def test_bm25_served_matches_scan_path_and_prunes(spark, tmp_path):
    """The materialized-index serving path (build_search_index + bm25_serve)
    must reproduce the scan path's BM25 scores exactly, and the serve scan
    must PRUNE to the query terms' buckets — the PartitionFilters line is
    the 100 TB contract (a query reads |terms| buckets, not the index)."""
    from projet_data_engineering_spark.operators.search import (
        bm25_serve,
        build_search_index,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=t)
            for i, t in enumerate(
                [
                    "spark joins streams with spark sql",
                    "vanilla cake recipe",
                    "stream processing with spark",
                    "join orders to lineitem",
                    "fruit salad no sugar",
                    "spark spark spark",
                ]
            )
        ]
    )
    idx = str(tmp_path / "idx")
    build_search_index(docs, "doc_id", "text", idx, n_buckets=16)

    served = bm25_serve(spark, idx, ["spark", "join"], n_buckets=16)
    scan = bm25_scores(docs, "doc_id", "text", ["spark", "join"])
    got = {r["doc_id"]: r["score"] for r in served.collect()}
    want = {r["doc_id"]: r["score"] for r in scan.collect()}
    assert got == want and got  # same docs, identical 4dp scores

    # Partition pruning: the postings scan must carry a term_bucket
    # PartitionFilter, and the pruned file set must be smaller than the
    # full index (16 buckets, 2 query terms -> at most 2 read).
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    pf = plan.split("PartitionFilters", 1)[1][:400]
    assert "term_bucket" in pf, plan
    import zlib

    for t in ("spark", "join"):
        assert str(zlib.crc32(t.encode()) % 16) in pf, pf
    # the index holds more buckets than the query touches, so the filter
    # genuinely prunes (otherwise the assertion above proves nothing)
    on_disk = {
        p.name
        for p in (tmp_path / "idx" / "postings").iterdir()
        if p.name.startswith("term_bucket=")
    }
    assert len(on_disk) > 2
    # serve-only plan touches no document column — the corpus is not in it
    assert "text#" not in plan


def test_bm25_fuzzy_served_matches_scan_path_and_prunes(spark, tmp_path):
    """The dictionary-expansion fuzzy serving path (bm25_serve_fuzzy) must
    reproduce bm25_scores_fuzzy's scores exactly, expand typo'd terms via
    the vocab artifact only, and prune the postings scan to the matched
    variants' buckets."""
    from projet_data_engineering_spark.operators.search import (
        bm25_scores_fuzzy,
        bm25_serve_fuzzy,
        build_search_index,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=t)
            for i, t in enumerate(
                [
                    "spark joins streams with spark sql",
                    "vanilla cake recipe",
                    "stream processing with spark",
                    "join orders to lineitem",
                    "fruit salad no sugar",
                    "spark spark spark",
                ]
            )
        ]
    )
    idx = str(tmp_path / "idx")
    build_search_index(docs, "doc_id", "text", idx, n_buckets=16)

    terms = ["strem", "joins"]  # both typo'd/inflected; AUTO fuzziness 1
    served = bm25_serve_fuzzy(spark, idx, terms)
    scan = bm25_scores_fuzzy(docs, "doc_id", "text", terms)
    got = {r["doc_id"]: r["score"] for r in served.collect()}
    want = {r["doc_id"]: r["score"] for r in scan.collect()}
    assert got == want and got  # same docs, identical 4dp scores

    # the postings scan carries a term_bucket PartitionFilter...
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    assert "term_bucket" in plan.split("PartitionFilters", 1)[1][:400], plan
    # ...and the corpus text column appears nowhere in the serve plan
    assert "text#" not in plan

    # vocab artifact exists, is term-unique, and covers every posting term
    vocab = {r["term"] for r in spark.read.parquet(f"{idx}/vocab").collect()}
    posting_terms = {
        r["term"] for r in spark.read.parquet(f"{idx}/postings").collect()
    }
    assert posting_terms <= vocab


def test_bm25_fuzzy_served_no_match_is_empty(spark, tmp_path):
    from projet_data_engineering_spark.operators.search import (
        bm25_serve_fuzzy,
        build_search_index,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma"), Row(doc_id=2, text="delta")]
    )
    idx = str(tmp_path / "idx")
    build_search_index(docs, "doc_id", "text", idx, n_buckets=8)
    assert bm25_serve_fuzzy(spark, idx, ["zzzzzzzzzz"]).count() == 0


def test_delete_neighborhood_sql_matches_python(spark):
    """The SQL delete-neighborhood (build side) and the driver-side python
    mirror (query side) must generate the SAME key sets — the equality the
    SymSpell intersection guarantee joins across."""
    from projet_data_engineering_spark.operators.search import (
        FUZZY_MAX_D,
        _delete_neighborhood_expr,
        _py_delete_neighborhood,
    )

    terms = ["a", "ab", "abc", "strem", "stream", "vector", "mississippi"]
    rows = (
        spark.createDataFrame([Row(term=t) for t in terms])
        .selectExpr("term", f"{_delete_neighborhood_expr('term')} AS keys")
        .collect()
    )
    for r in rows:
        assert set(r["keys"]) == _py_delete_neighborhood(
            r["term"], FUZZY_MAX_D
        ), r["term"]


def test_fuzzy_delete_key_expansion_is_lossless(spark, tmp_path):
    """The delete-key probe (bounded slice of the dictionary) must recover
    EXACTLY the term->qterm pairs the full |V| x |q| levenshtein theta-join
    finds — the SymSpell intersection guarantee, checked on the real
    fixture vocabulary with every AUTO fuzziness tier (0, 1, 2)."""
    from pyspark.sql import functions as F

    from projet_data_engineering_spark.io import load_table
    from projet_data_engineering_spark.operators.search import (
        auto_fuzziness,
        build_search_index,
        tokenize,
    )
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    idx = str(tmp_path / "idx")
    build_search_index(docs, "doc_id", "text", idx, n_buckets=16)
    terms = ["up", "strem", "vectr", "window", "aggregatee"]
    qt = [(t, auto_fuzziness(t)) for t in terms]
    qdf = spark.createDataFrame(qt, ["qterm", "fuzz"])
    full = {
        (r["term"], r["qterm"])
        for r in (
            docs.select(F.explode(tokenize(F.col("text"))).alias("term"))
            .distinct()
            .join(
                F.broadcast(qdf),
                (F.abs(F.length("term") - F.length("qterm")) <= F.col("fuzz"))
                & (F.levenshtein("term", "qterm") <= F.col("fuzz")),
            )
            .collect()
        )
    }
    # probe path: replicate bm25_serve_fuzzy's vmatch stage
    import zlib

    from projet_data_engineering_spark.operators.search import (
        _py_delete_neighborhood,
    )

    probe = [
        (k, qterm, fuzz)
        for qterm, fuzz in qt
        for k in sorted(_py_delete_neighborhood(qterm, fuzz))
    ]
    buckets = sorted({zlib.crc32(k.encode()) % 16 for k, _, _ in probe})
    probed = {
        (r["term"], r["qterm"])
        for r in (
            spark.read.parquet(f"{idx}/fuzzy")
            .filter(F.col("del_bucket").isin(buckets))
            .join(
                F.broadcast(
                    spark.createDataFrame(probe, ["del_key", "qterm", "fuzz"])
                ),
                "del_key",
            )
            .select("term", "qterm", "fuzz")
            .distinct()
            .filter(
                (F.abs(F.length("term") - F.length("qterm")) <= F.col("fuzz"))
                & (F.levenshtein("term", "qterm") <= F.col("fuzz"))
            )
            .collect()
        )
    }
    assert probed == full and full  # lossless AND the fixture exercises it


def test_bm25_fuzzy_served_prunes_the_dictionary_scan(spark, tmp_path):
    """The fuzzy serve plan must probe the delete-key index through a
    del_bucket PartitionFilter (the bounded-slice contract) — and never
    full-scan the vocab artifact."""
    from projet_data_engineering_spark.operators.search import (
        bm25_serve_fuzzy,
        build_search_index,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spark joins streams"),
            Row(doc_id=2, text="stream processing with spark"),
        ]
    )
    idx = str(tmp_path / "idx")
    build_search_index(docs, "doc_id", "text", idx, n_buckets=16)
    served = bm25_serve_fuzzy(spark, idx, ["strem"])
    served.collect()
    plan = served._jdf.queryExecution().executedPlan().toString()
    # scan locations are truncated in toString — identify scans by schema
    scans = [seg for seg in plan.split("FileScan") if "del_key" in seg[:700]]
    assert scans, plan
    for seg in scans:
        pf = seg.split("PartitionFilters", 1)[1][:200]
        assert "del_bucket" in pf and " IN " in pf, seg[:900]
        # the probe's own keys must ALSO reach the reader as a pushed
        # In(del_key, ...) — that, with the build's sorted 4 MB row
        # groups, is what bounds BYTES (the partition filter only bounds
        # directories; a multi-term query's keys hit most buckets)
        pushed = seg.split("PushedFilters", 1)[1][:300]
        assert "In(del_key" in pushed, seg[:900]
    # the vocab artifact (term+term_bucket only) is not read on the serve
    # path: every scan is postings (doc_id), fuzzy (del_key) or stats
    for seg in plan.split("FileScan")[1:]:
        head = seg[:700]
        assert (
            "doc_id" in head or "del_key" in head or "n_docs" in head
        ), head


def test_bm25_fuzzy_served_raises_in_filter_threshold(spark, tmp_path):
    """Above ~10 IN values Spark's parquet pushdown degrades to a [min,max]
    range that matches every sorted row group (probe keys span the
    keyspace) — serve must raise the session threshold past the probe size
    so the or-of-eq form survives to the reader (search.py measured this
    3.3x at a 1M-term dictionary: tools/bench_fuzzy_vocab.py)."""
    from projet_data_engineering_spark.operators.search import (
        bm25_serve_fuzzy,
        build_search_index,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spark joins streams vector tables"),
            Row(doc_id=2, text="stream processing with spark queries"),
        ]
    )
    idx = str(tmp_path / "idx")
    build_search_index(docs, "doc_id", "text", idx, n_buckets=16)
    # three typo'd terms ⇒ dozens of delete keys, far above the 10 default
    bm25_serve_fuzzy(spark, idx, ["strem", "vectr", "queris"]).collect()
    thresh = int(
        spark.conf.get("spark.sql.parquet.pushdown.inFilterThreshold")
    )
    assert thresh > 10, thresh
