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


# ---------------------------------------------------------------------------
# Bloom-filter join pruning (r7): cut the fact shuffle before the Exchange
# ---------------------------------------------------------------------------

BLOOM_NWORDS = 1024            # 64 KiB packed bitmap — fixed, corpus-independent
BLOOM_NBITS = BLOOM_NWORDS * 64
BLOOM_HASHES = 2


def _bloom_positions(key: Column) -> list[Column]:
    """BLOOM_HASHES bit positions for a key: xxhash64 under distinct seeds,
    pmod'd into the bitmap. xxhash64 is the same JVM hash Spark's own
    runtime bloom filter uses — fast, and never leaves codegen."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(BLOOM_NBITS))
        for i in range(BLOOM_HASHES)
    ]


def bloom_bitmap(keys: DataFrame, key: str) -> list[int]:
    """Build the packed blocked-bloom bitmap from the build side's keys:
    explode each key's bit positions, OR them into 64-bit words with one
    tiny groupBy, and collect. The collect is BOUNDED at exactly
    BLOOM_NWORDS rows regardless of build-side cardinality — the bitmap is
    the fixed-size summary that makes this safe where collecting the keys
    themselves (or broadcasting a corpus-sized drop list — the r6 lesson)
    is not."""
    pos = keys.select(
        F.explode(F.array(*_bloom_positions(F.col(key)))).alias("pos")
    )
    words = (
        pos.select(
            F.shiftright("pos", 6).alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))"
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("mask"))
    )
    bitmap = [0] * BLOOM_NWORDS
    for r in words.collect():
        bitmap[r["w"]] = r["mask"]
    return bitmap


def bloom_might_contain(key: Column, bitmap: list[int]) -> Column:
    """Membership predicate over a literal bitmap: for each hash, look up
    the word and test the bit. Pure Column algebra (array literal +
    element_at + shift), so the filter rides whole-stage codegen on the
    fact scan — BEFORE any exchange. False positives possible (the exact
    join after the filter removes them), false negatives impossible
    (pytest property)."""
    arr = F.lit(bitmap)
    cond = F.lit(True)
    for pos in _bloom_positions(key):
        word = F.element_at(arr, F.shiftright(pos, 6).cast("int") + 1)
        bit = F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            F.pmod(pos, F.lit(64)).cast("int"),
        )
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


@query(
    "q_bloom_join",
    oracle="""
    SELECT l.l_partkey AS partkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l.l_quantity), 2) AS sum_qty,
           ROUND(SUM(l.l_extendedprice), 2) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#23' AND p.p_size <= 5
    GROUP BY l.l_partkey
    """,
)
def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective dim⋈fact join with an explicit bloom-filter prefilter on
    the fact side (TPC-H-Q17 shape: a brand/size slice of ``part`` against
    ``lineitem``).

    The build side's keys fold into a fixed 64 KiB packed bitmap
    (:func:`bloom_bitmap`); the fact scan tests membership in codegen and
    drops ~99.8% of its rows BEFORE the join exchange (123 of 60 000
    survive at sf0.01). The join is hinted ``merge`` to model the at-scale
    case the bloom exists for: when BOTH sides must shuffle (build side too
    big to broadcast), the bloom is what keeps the fact exchange
    proportional to matches instead of corpus. False positives are
    harmless — the exact join removes them — so the result hash-matches the
    plain-join oracle.

    At 100 TB: Spark injects this automatically when
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` is on and the
    planner sees both sides in one query; the explicit form is for when it
    cannot — the build side arrives from a separate pipeline stage (a
    curated id list, yesterday's index) or the filter must be reused across
    many fact scans. The bitmap stays 64 KiB however large the corpus —
    compare the r6 drop-list lesson where an O(corpus) broadcast was the
    scale-killer."""
    part = load_table(spark, sf_dir, "part")
    dim = part.filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 5)
    ).select("p_partkey")
    bitmap = bloom_bitmap(dim, "p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pruned = li.filter(bloom_might_contain(F.col("l_partkey"), bitmap))
    joined = pruned.join(
        dim.hint("merge"), pruned["l_partkey"] == dim["p_partkey"]
    )
    return joined.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.count("*").alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )
