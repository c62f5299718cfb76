"""The reference app's two query entry points, composed end-to-end
(SURVEY.md §3.1 / §3.3) over a cleaned recipes frame.

The reference materializes every matching document client-side and
aggregates in pandas (``app/main.py:41-68``); here each entry point is one
DataFrame plan — the category predicate reaches the parquet scan, only
aggregated results reach the driver."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from projet_data_engineering_spark.operators.search import should_search


def dashboard_kpis(recipes: DataFrame, categories: list[str]) -> DataFrame:
    """§3.1 — the KPI header (``app/main.py:36-57``): total count, mean
    rating, mean duration, top difficulty, for the selected categories.
    One filtered scan, one aggregation; the mode needs a second tiny pass
    over |distinct difficulty| pre-aggregated rows only."""
    sel = recipes.filter(F.col("category").isin(*categories))
    mode_row = (
        sel.groupBy("difficulty")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("difficulty"))
        .limit(1)
        .select(F.col("difficulty").alias("top_difficulty"))
    )
    kpis = sel.agg(
        F.count("*").alias("n_recipes"),
        F.round(F.avg("rating"), 4).alias("avg_rating"),
        F.round(F.avg("duration_min"), 4).alias("avg_duration_min"),
    )
    return kpis.crossJoin(F.broadcast(mode_row))


def value_distributions(recipes: DataFrame, categories: list[str]) -> DataFrame:
    """§3.1 — the distribution charts (``app/main.py:61-65``):
    value_counts over difficulty, long-form."""
    return (
        recipes.filter(F.col("category").isin(*categories))
        .groupBy("difficulty")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("difficulty"))
    )


def fridge_search(
    recipes: DataFrame, ingredients_csv: str, k: int = 500
) -> DataFrame:
    """§3.3 — fridge mode (``app/main.py:101-154``): CSV ingredient list →
    per-ingredient should-clauses over ``ingredients_text`` with
    minimum_should_match=1, ranked by matched-clause count, top-k.
    Client-side tokenization mirrors ``app/main.py:107,111`` (split, strip,
    lower, drop empties); the whole search is one narrow map + top-k."""
    clauses = [
        c.strip().lower() for c in ingredients_csv.split(",") if c.strip()
    ]
    hits = should_search(recipes, "ingredients_text", clauses, min_should_match=1)
    return (
        hits.select(
            "product_id", "name", "category", "matched_clauses"
        )
        .orderBy(F.desc("matched_clauses"), F.asc("product_id"))
        .limit(k)
    )
