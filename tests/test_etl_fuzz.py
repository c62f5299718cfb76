"""Property/fuzz tests for the ETL parsers (hypothesis-generated inputs).

Spark 4 runs ANSI mode: a plain CAST on junk throws mid-job. These tests
feed arbitrary text through every parser in one batch and assert the
reference's contract — never throw, sentinel defaults on failure, exact
values on well-formed inputs — so one malformed row can't kill a stage."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from projet_data_engineering_spark.recipes.pipeline import (
    normalize_difficulty,
    parse_duration_min,
    parse_rating,
    parse_reviews_count,
)

# printable junk incl. digits, punctuation, accents, separators
JUNK = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "Z", "S")
    ),
    max_size=40,
)


def _run_parsers(spark, texts: list[str | None]) -> list[dict]:
    df = spark.createDataFrame([(t,) for t in texts], "raw string")
    return (
        df.select(
            "raw",
            normalize_difficulty(F.col("raw")).alias("difficulty"),
            parse_duration_min(F.col("raw")).alias("duration"),
            parse_reviews_count(F.col("raw")).alias("reviews"),
            parse_rating(F.col("raw")).alias("rating"),
        )
        .collect()
    )


@settings(max_examples=10, deadline=None)
@given(st.lists(st.one_of(st.none(), JUNK), min_size=1, max_size=30))
def test_parsers_never_throw_and_sentinels_hold(spark, texts):
    for r in _run_parsers(spark, texts):
        assert r["difficulty"] in ("Très facile", "Facile", "Difficile", "Moyen")
        assert r["duration"] is not None and r["duration"] >= 0
        assert r["reviews"] is not None and r["reviews"] >= 0
        assert r["rating"] is not None


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 23), st.integers(0, 59)),
        min_size=1,
        max_size=20,
    )
)
def test_duration_parse_exact_on_wellformed(spark, hm):
    texts = [f"cuisson {h} h {m} min" for h, m in hm]
    rows = _run_parsers(spark, texts)
    for (h, m), r in zip(hm, rows):
        assert r["duration"] == h * 60 + m


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(0, 50).map(lambda x: x / 10), min_size=1, max_size=20))
def test_rating_parse_exact_on_wellformed(spark, vals):
    texts = [str(v).replace(".", ",") + "/5" for v in vals]
    rows = _run_parsers(spark, texts)
    for v, r in zip(vals, rows):
        assert abs(r["rating"] - v) < 1e-9
