"""The reference's recipe ETL chain, re-expressed as one Column-algebra pass.

Reproduces, with behavioral fidelity (sentinels and cascade ordering
preserved, not "fixed"), the scraper's row-at-a-time cleaning logic:

- ``product_id = md5(url)``                      (scraper/main.py:139)
- drop unparsable titles ('Recette Inconnue')    (scraper/main.py:141-142)
- difficulty cascade, ORDER-SENSITIVE:
  'très facile' before 'facile', then 'difficile', default 'Moyen'
                                                 (scraper/main.py:167-182)
- duration parse: hours/minutes regex + 'temps : N m' fallback, 0 sentinel
                                                 (scraper/main.py:185-205)
- reviews_count: first integer in free text, 0 default
                                                 (scraper/main.py:208-214)
- rating: comma-decimal + '/5' strip, 0.0 sentinel
                                                 (scraper/main.py:216-220)
- image blacklist → Unsplash placeholder         (scraper/main.py:151-164)
- derived search fields ingredients_text / steps_text
                                                 (scraper/main.py:275-276)

Everything is built-in expressions — the whole chain is one narrow map stage
inside whole-stage codegen, embarrassingly parallel at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PLACEHOLDER_IMG = (
    "https://images.unsplash.com/photo-1546069901-ba9599a7e63c?w=400"
)
IMG_BLACKLIST = ("placeholder", "logo", "default", "no-photo", "p_global_en_tete")
UNKNOWN_TITLE = "Recette Inconnue"


def product_id(url: Column) -> Column:
    """F1 — stable content key (scraper/main.py:139)."""
    return F.md5(url)


def normalize_difficulty(header: Column) -> Column:
    """F14 — order-sensitive cascade (scraper/main.py:167-182). 'très facile'
    MUST be tested before 'facile' (substring shadowing); default 'Moyen'."""
    lo = F.lower(F.coalesce(header, F.lit("")))
    return (
        F.when(lo.contains("très facile"), "Très facile")
        .when(lo.contains("facile"), "Facile")
        .when(lo.contains("difficile"), "Difficile")
        .when(lo.contains("moyen"), "Moyen")
        .otherwise("Moyen")
    )


def parse_duration_min(header: Column) -> Column:
    """F8/F10/F12/F13 — '1 h 30 min' → 90; 'temps : 20 m' fallback; 0 on
    failure (scraper/main.py:185-205). The reference first normalizes
    'heure'→'h' (scraper/main.py:186)."""
    t = F.regexp_replace(F.lower(F.coalesce(header, F.lit(""))), "heures?", "h")
    hours = F.regexp_extract(t, r"(\d+)\s*h", 1).try_cast("int")
    mins = F.regexp_extract(t, r"(\d+)\s*min", 1).try_cast("int")
    fallback = F.regexp_extract(t, r"temps\s*[:\s]\s*(\d+)\s*m", 1).try_cast("int")
    primary = F.coalesce(hours, F.lit(0)) * 60 + F.coalesce(mins, F.lit(0))
    return (
        F.when(~t.rlike("[0-9]"), 0)
        .when(primary > 0, primary)
        .otherwise(F.coalesce(fallback, F.lit(0)))
    )


def parse_reviews_count(text: Column) -> Column:
    """F9 — first integer anywhere in the text, 0 default
    (scraper/main.py:208-214)."""
    return F.coalesce(
        F.regexp_extract(F.coalesce(text, F.lit("")), r"(\d+)", 1).try_cast("int"),
        F.lit(0),
    )


def parse_rating(text: Column) -> Column:
    """F11 — '4,8/5' → 4.8; 0.0 sentinel on failure (scraper/main.py:216-220)."""
    cleaned = F.regexp_replace(
        F.regexp_replace(F.coalesce(text, F.lit("")), "/5", ""), ",", "."
    )
    return F.coalesce(F.trim(cleaned).try_cast("double"), F.lit(0.0))


def clean_image_url(url: Column) -> Column:
    """F15 — empty or blacklisted image URL → placeholder
    (scraper/main.py:151-164)."""
    pattern = "|".join(IMG_BLACKLIST)
    bad = url.isNull() | (url == "") | F.lower(url).rlike(pattern)
    return F.when(bad, F.lit(PLACEHOLDER_IMG)).otherwise(url)


def clean_recipes(raw: DataFrame) -> DataFrame:
    """The full chain over a ``recipes_raw``-shaped frame (FIXTURES.md §B):
    url, title, header_text, rating_text, reviews_text, image_url,
    ingredients, steps, updated_at → the reference's record schema
    (SURVEY.md §1.2)."""
    return (
        raw.filter(F.col("title") != UNKNOWN_TITLE)  # P3 (scraper/main.py:141-142)
        .select(
            product_id(F.col("url")).alias("product_id"),
            F.trim(F.col("title")).alias("name"),
            F.col("category"),
            F.col("url"),
            clean_image_url(F.col("image_url")).alias("image_url"),
            normalize_difficulty(F.col("header_text")).alias("difficulty"),
            parse_rating(F.col("rating_text")).alias("rating"),
            parse_reviews_count(F.col("reviews_text")).alias("reviews_count"),
            parse_duration_min(F.col("header_text")).alias("duration_min"),
            F.col("ingredients"),
            F.col("steps"),
            F.col("updated_at"),
            # S8 — derived ES text fields (scraper/main.py:275-276)
            F.array_join(F.col("ingredients"), ", ").alias("ingredients_text"),
            F.array_join(F.col("steps"), " ").alias("steps_text"),
        )
        # D1/D2 — keyed dedup, deterministic keeper (scraper/main.py:263)
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("product_id").orderBy(
                    F.desc("updated_at"), F.asc("name")
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# Backup restore (reference restore_data.py)
# ---------------------------------------------------------------------------

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BACKUP_SCHEMA = StructType(
    [
        StructField("product_id", StringType()),
        StructField("name", StringType()),
        StructField("category", StringType()),
        StructField("url", StringType()),
        StructField("image_url", StringType()),
        StructField("difficulty", StringType()),
        StructField("rating", DoubleType()),
        StructField("reviews_count", LongType()),
        StructField("duration_min", LongType()),
        StructField("ingredients", ArrayType(StringType())),
        StructField("steps", ArrayType(StringType())),
        StructField("updated_at", StringType()),
    ]
)


def restore_backup(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """S4/S5 — the reference's disaster-recovery path (restore_data.py:29-49)
    as two DataFrames:

    - the COLLECTION view: truncate-and-load of every backup record
      (``delete_many`` + ``insert_many``, restore_data.py:31-33) — duplicates
      per ``product_id`` survive, exactly like Mongo with auto ``_id``;
    - the INDEX view: one doc per ``product_id``, LAST write wins in file
      order (``es.index(id=product_id)`` in a sequential loop,
      restore_data.py:43-49), with the derived ``ingredients_text`` /
      ``steps_text`` search fields (restore_data.py:45-47).

    File order is reconstructed with ``monotonically_increasing_id`` over the
    single-file multiLine read (ordering is well-defined within a file split;
    a multi-file backup would carry an explicit ingest sequence column
    instead).
    """
    from projet_data_engineering_spark.io import read_json_source

    collection = read_json_source(spark, path, BACKUP_SCHEMA)
    seq = collection.withColumn("_seq", F.monotonically_increasing_id())
    index = (
        seq.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("product_id").orderBy(F.desc("_seq"))
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_seq")
        .withColumn("ingredients_text", F.array_join("ingredients", ", "))
        .withColumn("steps_text", F.array_join("steps", " "))
    )
    return collection, index
