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
