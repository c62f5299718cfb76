"""Skew-mitigation operators: salted aggregation and salted joins.

At 100 TB, hot keys are the failure mode SURVEY.md §4 flags for every
shuffle-on-key plan: one executor drags the stage while the rest idle. AQE
(`spark.sql.adaptive.skewJoin`) re-plans many cases at runtime; these
operators are the explicit, composable form for when the skew is known up
front (low-cardinality group keys, boilerplate-heavy dedup buckets) or AQE's
thresholds don't trigger.

Both produce results identical to their unsalted forms — the salt is an
internal partitioning detail — so every query here is oracle-checked against
plain GROUP BY / JOIN SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_data_engineering_spark.io import load_table
from projet_data_engineering_spark.registry import query


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    salt_expr: Column,
    n_salts: int,
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
) -> DataFrame:
    """Two-stage aggregation: groupBy(keys + salt) partial, then groupBy(keys)
    final. The first shuffle spreads each hot key over ``n_salts`` reducers;
    the second moves only ``|keys| * n_salts`` pre-aggregated rows.

    ``partial_aggs`` maps intermediate column name -> aggregate over raw rows;
    ``final_aggs`` maps output name -> aggregate over the intermediates.
    Decompose non-distributive measures yourself (avg = sum/count).
    """
    partial = df.withColumn("_salt", F.pmod(salt_expr, F.lit(n_salts))).groupBy(
        *group_cols, "_salt"
    )
    mid = partial.agg(*[c.alias(n) for n, c in partial_aggs.items()])
    return mid.groupBy(*group_cols).agg(
        *[c.alias(n) for n, c in final_aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_expr: Column,
    n_salts: int,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a salted key: the big (skewed) side gets a deterministic
    salt in [0, n_salts); the small side is replicated n_salts times via a
    sequence explode. Same-key rows on the big side now land on ``n_salts``
    reducers instead of one. Cost: small side shuffles n_salts copies — use
    single-digit n_salts, or broadcast the small side and skip salting.

    ``salt_expr`` must be deterministic per-row (hash of a row-local column),
    never rand(): retried tasks must re-derive the same salt.
    """
    b = big.withColumn("_salt", F.pmod(salt_expr, F.lit(n_salts)))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = b.join(s, on=[key, "_salt"], how=how)
    return joined.drop("_salt")


# ---------------------------------------------------------------------------
# Driver queries
# ---------------------------------------------------------------------------


@query(
    "q_salted_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_quantity) / COUNT(*), 4) AS avg_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation on ``l_returnflag`` — 3 distinct values
    over the whole fact table, the textbook hot-key groupBy. The oracle is the
    plain GROUP BY: salting must be invisible in the result."""
    li = load_table(spark, sf_dir, "lineitem")
    mid = salted_agg(
        li,
        ["l_returnflag"],
        F.hash("l_orderkey"),
        16,
        partial_aggs={
            "pn": F.count("*"),
            "psum": F.sum("l_quantity"),
        },
        final_aggs={
            "n": F.sum("pn"),
            "sum_qty": F.round(F.sum("psum"), 2),
            "avg_qty": F.round(F.sum("psum") / F.sum("pn"), 4),
        },
    )
    return mid.select("l_returnflag", "n", "sum_qty", "avg_qty")


@query(
    "q_join_salted",
    oracle="""
    SELECT o.o_orderstatus,
           COUNT(*) AS n,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-to-fact equi-join (8 salts), then revenue per status.
    Salt comes from ``l_linenumber`` — row-local, deterministic under task
    retry. Result must hash-match the unsalted join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus")
    )
    j = salted_join(li, o, "l_orderkey", F.hash("l_linenumber"), 8)
    return j.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )
