"""Reproducible corpus sampling + production-scale clustering (round 3).

Training-data pipelines need SAMPLES that are (a) uniform, (b) reproducible
across runs and engines, and (c) cheap at 100 TB. ``rand()``-based sampling
fails (b) — the hash-order trick here is the industry-standard fix: order by
a cryptographic hash of the key and keep the bottom k. Any engine computing
md5 gets the identical sample, and Spark executes it as TakeOrderedAndProject
(per-partition top-k heap + driver merge of k·p rows — no full sort, no
shuffle of the corpus).

Also registers the driver-checkable query for the large-star/small-star
connected-components variant (``dedup.connected_components_lss``) against
the same recursive-closure oracle as the label-propagation version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_data_engineering_spark.io import load_table, spread
from projet_data_engineering_spark.operators.dedup import (
    _clusters_oracle,
    connected_components_lss,
    minhash_candidate_pairs,
)
from projet_data_engineering_spark.registry import query


@query(
    "q_sample_bottomk",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    LIMIT 200
    """,
)
def q_sample_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform sample: bottom-200 documents by md5(doc_id).

    Statistically equivalent to a uniform 200-row sample (a good hash is
    uniform on keys) but exactly reproducible — rerun it next month on the
    grown corpus and previously-sampled docs stay sampled unless pushed out,
    which is what makes eval holdouts and debugging subsets stable. Executes
    as TakeOrderedAndProject; md5 is unique on distinct keys, the extra
    doc_id tie-break just pins determinism for the oracle compare."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", "lang")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .limit(200)
    )


@query("q_dedup_clusters_lss", oracle=_clusters_oracle())
def q_dedup_clusters_lss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash candidate pairs → large-star/small-star connected components.
    Same contract and same DuckDB recursive-CTE oracle as q_dedup_clusters;
    the difference is the round bound — O(log n) rounds vs O(diameter) — so
    this is the variant that survives a path-shaped billion-node component.
    See ``dedup.connected_components_lss``."""
    d = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    pairs = minhash_candidate_pairs(d, "doc_id", "text")
    return connected_components_lss(pairs)


# ---------------------------------------------------------------------------
# KMV (bottom-k / k-minimum-values) distinct-count sketch (r8)
# ---------------------------------------------------------------------------
#
# The DETERMINISTIC, MERGEABLE cardinality estimator next to
# ``relational.q_approx_distinct`` (HyperLogLog++, engine-specific and
# therefore rows-only at the driver gate): hash every key with md5, keep the
# k smallest distinct hash fractions per group, estimate D ≈ (k−1)/u₍ₖ₎
# (Bar-Yossef et al. 2002). Every step is engine-neutral arithmetic —
# md5 hex, a 13-hex-digit base-16 expansion (52 bits, exact in a double),
# one IEEE division — so unlike HLL++ the estimate itself is hash-oracled,
# not just error-bounded. Mergeability (union of sketches = sketch of
# union, EXACTLY) is what makes it a planning primitive at 100 TB:
# per-shard sketches of k doubles roll up to corpus cardinality without
# re-scanning, pytest-proven in tests/test_skew_approx.py.

KMV_K = 256  # sketch size: relative error ~1/sqrt(k) ≈ 6.25%

_HEX_ALPHABET = "0123456789abcdef"


def hex13_long_sql(expr: str) -> str:
    """Portable SQL (Spark + DuckDB dialect intersection): the first 13 hex
    digits of md5(expr) read as a base-16 BIGINT — a uniform 52-bit integer
    hash computed by IDENTICAL integer arithmetic in both engines (bare
    integer literals parse as BIGINT in both; no floats, so no decimal-
    literal trap — Spark parses ``281474976710656.0`` as DECIMAL). Shared
    by the KMV fraction here and the Count-Min buckets in textanalysis.
    Coefficients are CAST AS BIGINT: small powers of 16 parse as INT and
    the INT×INT product overflows under Spark's ANSI mode."""
    digits = " + ".join(
        f"(instr('{_HEX_ALPHABET}', substring(md5(CAST({expr} AS STRING)),"
        f" {i + 1}, 1)) - 1) * CAST({16 ** (12 - i)} AS BIGINT)"
        for i in range(13)
    )
    return f"({digits})"


def _kmv_u_sql(key_expr: str) -> str:
    """Uniform hash fraction u ∈ [0, 1): the 52-bit integer hash over 2⁵².
    Exactly representable in a double (every partial sum is an integer
    < 2⁵²), so the doubles are bit-equal across engines and the oracle
    hash compare is exact, not tolerance-based."""
    return (
        f"(CAST({hex13_long_sql(key_expr)} AS DOUBLE)"
        f" / CAST({1 << 52} AS DOUBLE))"
    )


def kmv_sketch(df: DataFrame, grp: str, key: str, k: int = KMV_K) -> DataFrame:
    """(grp, n_seen, ks) — the bottom-k DISTINCT hash fractions of ``key``
    per group plus the count of distinct hashes retained (n_seen < k means
    the sketch is exhaustive and the estimate is exact). The artifact is
    k doubles per group — the thing a 100 TB planner persists per shard.

    Execution: one distinct on (grp, u) (map-side combined), one per-group
    window rank over the distinct hashes, one bounded collect_list (≤ k
    rows per group by the rank filter). The per-group sort ranks DISTINCT
    hashes, not corpus rows — at web scale the distinct set is the
    expensive part and is exactly what exact countDistinct would shuffle
    anyway; the sketch's win is the O(k) artifact and the merge rule."""
    u = F.expr(_kmv_u_sql(key))
    # no .distinct() here — kmv_from_hashes dedups; stacking a second
    # Distinct would be a redundant full-width aggregation
    hashed = df.select(F.col(grp).alias("grp"), u.alias("u"))
    return kmv_from_hashes(hashed, k)


N_SALT = 64  # phase-1 fan-out of the two-phase bottom-k


def bottom_k_rows(
    df: DataFrame,
    grp_cols: list[str],
    order_cols: list[str],
    k: int,
    salt: Column,
) -> DataFrame:
    """Deterministic bottom-k rows per group WITHOUT a single-task
    per-group sort (r9, found by the four-point scale protocol): a window
    partitioned only by a low-cardinality group serializes the whole
    corpus into |groups| tasks and fully sorts each — q_percentile_sampled
    measured 44 s at sf5 in exactly that shape. Phase 1 ranks within
    (group, salt) — ``N_SALT``× the parallelism, each task sorting a
    1/N_SALT slice — and keeps k rows per slice; phase 2 ranks the
    ≤ N_SALT·k survivors per group (a BOUNDED intermediate, so its
    per-group window is one small task by construction). Bottom-k of a
    group equals bottom-k of the union of its per-salt bottom-ks, so the
    result set is IDENTICAL to the single-window form — the oracle SQL
    keeps the straightforward one-window transcription.

    ``salt`` must be deterministic in the row (it only routes rows to
    phase-1 partitions; any function works, but nondeterminism would
    break replay). Emits ``rn``, the final per-group rank."""
    from pyspark.sql import Window

    w1 = Window.partitionBy(*grp_cols, "_salt").orderBy(*order_cols)
    w2 = Window.partitionBy(*grp_cols).orderBy(*order_cols)
    return (
        df.withColumn("_salt", salt)
        .withColumn("_rn1", F.row_number().over(w1))
        .where(F.col("_rn1") <= k)
        .withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= k)
        .drop("_salt", "_rn1")
    )


def kmv_from_hashes(hashed: DataFrame, k: int = KMV_K) -> DataFrame:
    """Rank an already-hashed (grp, u) frame into the (grp, n_seen, ks)
    sketch — the half of :func:`kmv_sketch` the streaming server reuses to
    fold batch partials (their union IS a hash frame). Two-phase bottom-k
    (:func:`bottom_k_rows`): the per-group rank never sorts the full
    distinct-hash set in one task."""
    salt = F.pmod((F.col("u") * F.lit(1 << 20)).cast("long"), F.lit(N_SALT))
    return (
        bottom_k_rows(hashed.distinct(), ["grp"], ["u"], k, salt)
        .groupBy("grp")
        .agg(
            F.max("rn").alias("n_seen"),
            F.sort_array(F.collect_list("u")).alias("ks"),
        )
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = KMV_K) -> DataFrame:
    """Union rule: bottom-k of the UNION of two sketches' hash sets — the
    sketch the two-shard corpus would have produced, exactly (bottom-k of a
    union is the bottom-k of the union of bottom-ks). Bounded array ops on
    ≤ 2k doubles per group; full outer so one-sided groups survive."""
    ab = (
        a.select("grp", F.col("ks").alias("ka"))
        .join(b.select("grp", F.col("ks").alias("kb")), "grp", "full_outer")
        .select(
            "grp",
            F.slice(
                F.array_sort(
                    F.array_distinct(
                        F.concat(
                            F.coalesce("ka", F.expr("CAST(array() AS array<double>)")),
                            F.coalesce("kb", F.expr("CAST(array() AS array<double>)")),
                        )
                    )
                ),
                1,
                k,
            ).alias("ks"),
        )
    )
    return ab.select("grp", F.size("ks").alias("n_seen"), "ks")


def kmv_estimate(sketch: DataFrame, k: int = KMV_K) -> DataFrame:
    """(grp, distinct_est): (k−1)/u₍ₖ₎ when the sketch is full, else the
    exact retained count (a sketch smaller than k IS the distinct set)."""
    return sketch.select(
        "grp",
        F.when(F.col("n_seen") < k, F.col("n_seen").cast("double"))
        .otherwise(
            F.round((F.lit(k - 1) / F.element_at("ks", k)), 4)
        )
        .alias("distinct_est"),
    )


_KMV_ORACLE = f"""
    WITH h AS (
        SELECT DISTINCT o_orderpriority AS grp,
               {_kmv_u_sql('o_custkey')} AS u
        FROM orders
    ),
    r AS (
        SELECT grp, u,
               ROW_NUMBER() OVER (PARTITION BY grp ORDER BY u) AS rn
        FROM h
    ),
    s AS (
        SELECT grp, MAX(rn) AS n_seen,
               MAX(CASE WHEN rn = {KMV_K} THEN u END) AS kth_u
        FROM r WHERE rn <= {KMV_K} GROUP BY grp
    )
    SELECT grp AS o_orderpriority,
           CASE WHEN n_seen < {KMV_K} THEN CAST(n_seen AS DOUBLE)
                ELSE ROUND(({KMV_K} - 1) / kth_u, 4) END AS distinct_est
    FROM s
    """


@query("q_kmv_distinct", oracle=_KMV_ORACLE)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order priority, estimated from the KMV
    bottom-{k} sketch — the deterministic twin of q_approx_distinct whose
    ESTIMATE the DuckDB oracle reproduces bit-for-bit (both engines walk
    the same md5 → 52-bit fraction → (k−1)/u₍ₖ₎ lattice). Error-bound and
    merge-law pytests live in tests/test_skew_approx.py.

    Reference anchor: the reference counts distinct product_ids by
    collection scan (scraper/main.py:263); this is the bounded-memory
    shape that count takes when the collection is 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    return kmv_estimate(
        kmv_sketch(o, "o_orderpriority", "o_custkey")
    ).select(F.col("grp").alias("o_orderpriority"), "distinct_est")


# ---------------------------------------------------------------------------
# Deterministic sampled percentiles (r8) — the q_kmv_distinct of quantiles
# ---------------------------------------------------------------------------

PSAMPLE_K = 4096  # per-group sample size: p50/p95 sampling error ~1/sqrt(k)


_PSAMPLE_ORACLE = f"""
    WITH r AS (
        SELECT l_returnflag, l_quantity,
               ROW_NUMBER() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY md5(CAST(l_orderkey AS STRING) || '-' ||
                                CAST(l_linenumber AS STRING)),
                            l_orderkey, l_linenumber) AS rn
        FROM lineitem
    )
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50_est,
           ROUND(quantile_cont(l_quantity, 0.95), 4) AS p95_est
    FROM r WHERE rn <= {PSAMPLE_K}
    GROUP BY l_returnflag
    """


@query("q_percentile_sampled", oracle=_PSAMPLE_ORACLE)
def q_percentile_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentiles from a DETERMINISTIC per-group hash sample — the
    bounded-memory quantile path whose ESTIMATE the oracle reproduces
    exactly, complementing the rows-only ``q_percentile_approx`` the way
    ``q_kmv_distinct`` complements ``q_approx_distinct``: Spark's
    percentile_approx sketch is engine-specific, but exact percentiles
    over the md5-bottom-k sample are pure engine-neutral arithmetic, so
    the driver hash-checks the whole estimator. Statistically the sample
    is uniform per group (md5 on the (orderkey, linenumber) primary key),
    error ~1/sqrt(k); the bottom-k-by-hash cut runs as the two-phase
    salted rank (:func:`bottom_k_rows` — the r9 fix for the measured
    3-task whole-corpus sort this query shipped with), and the percentile
    aggregates k rows per group instead of the corpus. Closeness to the
    exact percentiles is pinned in tests/test_skew_approx.py."""
    li = load_table(spark, sf_dir, "lineitem")
    h = F.md5(
        F.concat_ws(
            "-",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        )
    )
    salt = F.pmod(F.crc32(h), F.lit(N_SALT))
    return (
        bottom_k_rows(
            li.select(
                "l_returnflag", "l_quantity", "l_orderkey", "l_linenumber"
            ).withColumn("_h", h),
            ["l_returnflag"],
            ["_h", "l_orderkey", "l_linenumber"],
            PSAMPLE_K,
            salt,
        )
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50_est"),
            F.round(F.expr("percentile(l_quantity, 0.95)"), 4).alias("p95_est"),
        )
    )


# ---------------------------------------------------------------------------
# CMS join-size estimation (r8) — the sketch-algebra planner primitive
# ---------------------------------------------------------------------------
#
# The third operation of Count-Min algebra: a point query is a MIN over
# rows, a merge is a cell-wise SUM, and a JOIN-SIZE estimate is the row-wise
# INNER PRODUCT — est |A ⋈ B on k| = min_i Σ_b cA[i,b]·cB[i,b] (Alon-
# Matias-Szegedy / Cormode-Muthukrishnan). Never an underestimate;
# expected overshoot ‖a‖₁·‖b‖₁/w, so unlike the w=16 demo sketch this
# uses w = 16⁴ = 65 536 buckets (4 hex digits of one md5 per row — the
# textanalysis trick widened). This is what a 100 TB planner consults
# before picking a join strategy: two O(d·w) artifacts built in one scan
# each, no key ever shuffled.

CMS_JS_D = 4       # hash rows
CMS_JS_P = 4       # hex digits per bucket: w = 16^p = 65536
CMS_JS_W = 16 ** CMS_JS_P


def _js_bucket_sql(i: int, h_expr: str) -> str:
    """Row-``i`` bucket: hex digits [8i+1 .. 8i+p] of an md5-hex column as
    a base-16 integer — disjoint digit windows per row, identical text in
    both engines (BIGINT coefficient casts: the ANSI INT-overflow trap)."""
    terms = " + ".join(
        f"(instr('{_HEX_ALPHABET}', substring({h_expr}, {8 * i + 1 + j}, 1))"
        f" - 1) * CAST({16 ** (CMS_JS_P - 1 - j)} AS BIGINT)"
        for j in range(CMS_JS_P)
    )
    return f"({terms})"


def cms_key_sketch(df: DataFrame, key: str) -> DataFrame:
    """(i, bucket, cnt) over ``key``'s OCCURRENCES (one per row — join
    cardinality needs multiplicities, not distincts). One digest + d
    window reads per row, map-side combined to O(d·w) state."""
    h = F.md5(F.col(key).cast("string"))
    probes = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.expr(_js_bucket_sql(i, "h")).alias("bucket"),
            )
            for i in range(CMS_JS_D)
        ]
    )
    return (
        df.select(h.alias("h"))
        .select(F.explode(probes).alias("p"))
        .select("p.i", "p.bucket")
        .groupBy("i", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_join_size(a: DataFrame, b: DataFrame) -> DataFrame:
    """1-row (est_join_size) from two key sketches: min over rows of the
    per-row inner product. The join is (i, bucket) on two O(d·w) frames —
    nothing corpus-sized moves.

    The per-row dot products are stacked on a generated ``0..d-1`` spine
    (left join + COALESCE 0): a hash row with zero overlapping buckets has
    a true inner product of 0 and must drag the min to 0, and two sketches
    with no overlap at all must estimate 0 rather than NULL. Without the
    spine those rows vanish from the aggregate and the min only ranges
    over rows that happened to collide — overstating (or nulling) the
    disjoint-key case, the one regime where CMS's never-underestimate
    guarantee needs all d rows evaluated. (ADVICE r8.)"""
    spark = a.sparkSession
    spine = spark.range(CMS_JS_D).select(F.col("id").cast("int").alias("i"))
    dots = (
        a.select("i", "bucket", F.col("cnt").alias("ca"))
        .join(
            b.select("i", "bucket", F.col("cnt").alias("cb")),
            ["i", "bucket"],
        )
        .groupBy("i")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    prod = spine.join(dots, "i", "left").select(
        F.coalesce(F.col("dot"), F.lit(0)).alias("dot")
    )
    return prod.agg(F.min("dot").cast("bigint").alias("est_join_size"))


def _js_side_ctes(name: str, table: str, key: str) -> str:
    """Per-key counts then buckets (linearity: O(|keys|) hashes), unioned
    across the d rows — the oracle half for one join side."""
    probes = " UNION ALL ".join(
        f"SELECT {i} AS i, {_js_bucket_sql(i, 'h')} AS bucket, c"
        f" FROM {name}_k"
        for i in range(CMS_JS_D)
    )
    return f"""{name}_k AS (
        SELECT md5(CAST({key} AS STRING)) AS h, COUNT(*) AS c
        FROM {table} GROUP BY {key}
    ),
    {name}_s AS (
        SELECT i, bucket, SUM(c) AS cnt FROM ({probes}) GROUP BY i, bucket
    )"""


_CMS_JOIN_ORACLE = f"""
    WITH {_js_side_ctes('oa', 'orders', 'o_orderkey')},
    {_js_side_ctes('lb', 'lineitem', 'l_orderkey')},
    dots AS (
        SELECT a.i, SUM(a.cnt * b.cnt) AS dot
        FROM oa_s a JOIN lb_s b ON a.i = b.i AND a.bucket = b.bucket
        GROUP BY a.i
    )
    SELECT CAST(MIN(COALESCE(d.dot, 0)) AS BIGINT) AS est_join_size
    FROM range({CMS_JS_D}) s(i) LEFT JOIN dots d ON d.i = s.i
    """


@query("q_cms_join_size", oracle=_CMS_JOIN_ORACLE)
def q_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """|orders ⋈ lineitem ON orderkey| estimated from two Count-Min key
    sketches — the inner-product member of the sketch algebra (point
    query = min, merge = sum, join size = inner product), and the number
    a 100 TB planner consults before choosing a join strategy. The
    oracle rebuilds both sketches and the inner product, so the gate
    proves the estimator; the never-undershoot and error-bound
    properties are pinned in tests/test_skew_approx.py."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return cms_join_size(
        cms_key_sketch(o, "o_orderkey"),
        cms_key_sketch(li, "l_orderkey"),
    )
