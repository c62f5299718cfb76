"""Golden tests for the recipe ETL chain (SURVEY.md §5.2.2): the reference's
behavioral quirks — cascade ordering, duration fallbacks, sentinels,
blacklist substitution — locked in against hand-computed expectations."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from projet_data_engineering_spark.recipes.pipeline import (
    PLACEHOLDER_IMG,
    clean_recipes,
)


def raw_row(**kw):
    base = dict(
        url="https://www.example.org/r/1",
        title="Tarte aux pommes",
        category="dessert",
        header_text="facile 45 min",
        rating_text="4,8/5",
        reviews_text="127 avis",
        image_url="https://img.example.org/tarte.jpg",
        ingredients=["3 pommes", "1 pâte"],
        steps=["Préchauffer le four.", "Cuire 45 min."],
        updated_at="2026-01-01 10:00:00",
    )
    base.update(kw)
    return Row(**base)


@pytest.fixture(scope="module")
def cleaned(spark):
    rows = [
        raw_row(),
        # order-sensitive cascade: 'très facile' must NOT normalize to 'Facile'
        raw_row(url="u2", title="Oeufs", header_text="très facile 1 h 30 min"),
        raw_row(url="u3", title="Ragoût", header_text="difficile 2 h"),
        raw_row(url="u4", title="Mystère", header_text="aucun temps indiqué"),
        raw_row(url="u5", title="Fallback", header_text="temps : 20 m"),
        raw_row(url="u6", title="Recette Inconnue"),  # filtered out
        raw_row(url="u7", title="SansImage", image_url=""),
        raw_row(url="u8", title="LogoImg", image_url="https://cdn/logo-big.png"),
        raw_row(url="u9", title="SansNote", rating_text="aucune note"),
        raw_row(url="u10", title="SansAvis", reviews_text="pas d'avis"),
        # duplicate url: only the newest survives
        raw_row(title="Tarte v2", updated_at="2026-02-01 10:00:00"),
        raw_row(url="u11", title="Heure", header_text="moyen 1 heure 15 min"),
    ]
    df = spark.createDataFrame(rows)
    return {r["name"]: r for r in clean_recipes(df).collect()}


def test_unknown_title_filtered(cleaned):
    assert "Recette Inconnue" not in cleaned


def test_dedup_keeps_newest(cleaned):
    assert "Tarte v2" in cleaned and "Tarte aux pommes" not in cleaned


def test_product_id_is_md5_of_url(cleaned):
    assert cleaned["Oeufs"]["product_id"] == hashlib.md5(b"u2").hexdigest()


def test_difficulty_cascade_order(cleaned):
    assert cleaned["Oeufs"]["difficulty"] == "Très facile"
    assert cleaned["Tarte v2"]["difficulty"] == "Facile"
    assert cleaned["Ragoût"]["difficulty"] == "Difficile"
    assert cleaned["Mystère"]["difficulty"] == "Moyen"


def test_duration_parse(cleaned):
    assert cleaned["Oeufs"]["duration_min"] == 90
    assert cleaned["Ragoût"]["duration_min"] == 120
    assert cleaned["Tarte v2"]["duration_min"] == 45
    assert cleaned["Heure"]["duration_min"] == 75  # 'heure' normalized to 'h'
    assert cleaned["Mystère"]["duration_min"] == 0  # no digits → sentinel
    assert cleaned["Fallback"]["duration_min"] == 20  # 'temps : N m' fallback


def test_rating_locale_cast_and_sentinel(cleaned):
    assert cleaned["Tarte v2"]["rating"] == 4.8
    assert cleaned["SansNote"]["rating"] == 0.0


def test_reviews_first_int_and_sentinel(cleaned):
    assert cleaned["Tarte v2"]["reviews_count"] == 127
    assert cleaned["SansAvis"]["reviews_count"] == 0


def test_image_blacklist(cleaned):
    assert cleaned["SansImage"]["image_url"] == PLACEHOLDER_IMG
    assert cleaned["LogoImg"]["image_url"] == PLACEHOLDER_IMG
    assert cleaned["Oeufs"]["image_url"].startswith("https://img.example.org")


def test_derived_text_fields(cleaned):
    assert cleaned["Oeufs"]["ingredients_text"] == "3 pommes, 1 pâte"
    assert cleaned["Oeufs"]["steps_text"] == "Préchauffer le four. Cuire 45 min."


@pytest.fixture(scope="module")
def cleaned_df(spark):
    rows = [
        raw_row(),
        raw_row(url="u2", title="Oeufs", header_text="très facile 1 h 30 min",
                ingredients=["6 oeufs", "sel"]),
        raw_row(url="u3", title="Ragoût", header_text="difficile 2 h",
                ingredients=["1 kg boeuf", "2 pommes de terre"]),
        raw_row(url="u5", title="Fallback", header_text="temps : 20 m"),
        raw_row(url="u7", title="SansImage", image_url=""),
    ]
    return clean_recipes(spark.createDataFrame(rows))


def test_dashboard_kpis_end_to_end(spark, cleaned_df):
    """§3.1 parity: the KPI header over the cleaned frame equals the
    hand-computed pandas-style values."""
    from projet_data_engineering_spark.recipes.dashboard import (
        dashboard_kpis,
        value_distributions,
    )

    cleaned = cleaned_df
    cats = [r["category"] for r in cleaned.select("category").distinct().collect()]
    row = dashboard_kpis(cleaned, cats).collect()[0]
    rows = cleaned.collect()
    assert row["n_recipes"] == len(rows)
    assert abs(row["avg_rating"] - sum(r["rating"] for r in rows) / len(rows)) < 1e-3
    from collections import Counter

    top = sorted(
        Counter(r["difficulty"] for r in rows).items(),
        key=lambda kv: (-kv[1], kv[0]),
    )[0][0]
    assert row["top_difficulty"] == top
    dist = value_distributions(cleaned, cats).collect()
    assert sum(r["n"] for r in dist) == len(rows)


def test_fridge_search_end_to_end(spark, cleaned_df):
    """§3.3 parity: a two-ingredient fridge query ranks recipes matching
    both clauses above single-clause matches; non-matching recipes drop."""
    from projet_data_engineering_spark.recipes.dashboard import fridge_search

    hits = fridge_search(cleaned_df, "pommes, pâte").collect()
    assert len(hits) > 0
    assert all(h["matched_clauses"] >= 1 for h in hits)
    # ranking is by matched clause count desc
    counts = [h["matched_clauses"] for h in hits]
    assert counts == sorted(counts, reverse=True)


# ---------------------------------------------------------------------------
# Golden run against the reference's real backup (VERDICT r1 item 7)
# ---------------------------------------------------------------------------

GOLDEN = "/root/reference/marmiton_data.json"


@pytest.fixture(scope="module")
def golden(spark):
    import os

    if not os.path.exists(GOLDEN):
        pytest.skip("reference backup not present")
    from projet_data_engineering_spark.recipes.pipeline import restore_backup

    return restore_backup(spark, GOLDEN)


def test_golden_collection_counts(golden):
    """README-advertised dataset shape: 1,502 recipes, 501/501/500 split."""
    collection, _ = golden
    assert collection.count() == 1502
    cats = {
        r["category"]: r["n"]
        for r in collection.groupBy("category").agg(F.count("*").alias("n")).collect()
    }
    assert cats == {"entree": 501, "plat-principal": 501, "dessert": 500}


def test_golden_index_dedup_and_text_fields(golden):
    """ES restore indexes by product_id: 12 duplicate ids collapse to 1,490
    docs, each with the derived search-text fields."""
    _, index = golden
    assert index.count() == 1490
    assert index.select("product_id").distinct().count() == 1490
    row = index.filter(F.col("ingredients_text") != "").limit(1).collect()[0]
    assert row["ingredients_text"] == ", ".join(row["ingredients"])
    assert row["steps_text"] == " ".join(row["steps"])


def test_golden_distributions(golden):
    """Difficulty and category distributions of the restored index are the
    reference's exact values (hand-counted from the backup)."""
    collection, _ = golden
    diff = {
        r["difficulty"]: r["n"]
        for r in collection.groupBy("difficulty").agg(F.count("*").alias("n")).collect()
    }
    assert diff == {"Très facile": 910, "Facile": 499, "Moyen": 87, "Difficile": 6}
    assert collection.filter(F.col("duration_min") == 0).count() == 0
    assert collection.filter(F.col("rating") == 0.0).count() == 58


def test_golden_product_id_is_md5_of_url(golden):
    """Every backup record's key is md5(url) — the scraper invariant
    (scraper/main.py:139) holds over the real data end-to-end."""
    collection, _ = golden
    bad = collection.filter(F.md5(F.col("url")) != F.col("product_id")).count()
    assert bad == 0


def test_canonicalize_url_edge_cases(spark):
    """The normalizer in front of the reference's md5(url) key: every pair
    below must collapse (or stay distinct) exactly as a URL RFC reading
    says."""
    from projet_data_engineering_spark.operators.etl import canonicalize_url

    cases = [
        # (raw, canonical)
        ("HTTP://WWW.Ex.COM:80/a/b", "http://www.ex.com/a/b"),
        ("https://ex.com:443/a", "https://ex.com/a"),
        ("https://ex.com:8443/a", "https://ex.com:8443/a"),  # kept
        ("http://ex.com", "http://ex.com/"),                 # bare host
        ("http://ex.com///", "http://ex.com/"),
        ("http://ex.com/a/?b=2&a=1", "http://ex.com/a?a=1&b=2"),
        ("http://ex.com/a?utm_source=x&utm_campaign=y", "http://ex.com/a"),
        ("http://ex.com/a?fbclid=123&z=1#frag", "http://ex.com/a?z=1"),
        ("http://ex.com/a#frag", "http://ex.com/a"),
        # params are data when not tracking: distinct stays distinct
        ("http://ex.com/a?id=1", "http://ex.com/a?id=1"),
    ]
    df = spark.createDataFrame([(i, r) for i, (r, _c) in enumerate(cases)],
                               "i int, url string")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonicalize_url("url").alias("c")).collect()
    }
    for i, (_raw, want) in enumerate(cases):
        assert got[i] == want, (i, _raw, got[i], want)
