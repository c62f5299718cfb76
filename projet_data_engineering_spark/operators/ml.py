"""Iterative ML primitives over the embeddings table (round 3 extension).

K-means is the workhorse behind the IVF index (``similarity.q_ann_ivf``
assigns to FIXED centroids; this module TRAINS them) and behind
cluster-balanced corpus sampling. The implementation is the canonical
distributed Lloyd's algorithm shape:

- centroids live in a k-row DataFrame that BROADCASTS onto the corpus —
  assignment is map-only, the corpus never shuffles for it;
- the update step is one groupBy(cid) with map-side combine (k·dim partial
  sums per partition);
- determinism: seeds are the bottom-k vectors by md5(vec_id) (reproducible
  across engines and runs — the ``q_sample_bottomk`` trick), distances fold
  left-to-right over double-cast elements, argmin ties break on centroid
  id, and intermediate centroids round to 6dp on BOTH engines so
  float-summation drift cannot compound across iterations. That is what
  makes a 2-iteration run bit-comparable to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_data_engineering_spark.io import load_table
from projet_data_engineering_spark.registry import query

K = 4
ITERS = 2
DIM = 64


def _dist2(e, c):
    """Squared L2 distance as a strict left-to-right fold (engine-stable)."""
    return F.aggregate(
        F.zip_with(e, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign(e: DataFrame, cents: DataFrame) -> DataFrame:
    """Map-only assignment: crossJoin the broadcast k-row centroid table,
    keep the (d2, cid)-min row per vector. cid is unique per candidate so
    the struct-min is total-ordered — no nondeterministic ties."""
    joined = e.crossJoin(F.broadcast(cents)).withColumn(
        "d2", _dist2(F.col("e"), F.col("ce"))
    )
    best = joined.groupBy("vec_id").agg(
        F.min(F.struct("d2", "cid", "e")).alias("b")
    )
    return best.select("vec_id", "b.cid", "b.e", "b.d2")


def kmeans_centroids(
    emb: DataFrame, k: int = K, iters: int = ITERS, dim: int = DIM
) -> DataFrame:
    """Lloyd's k-means TRAINING, ``iters`` rounds from md5-deterministic
    seeds; returns the (cid, ce) centroid artifact — the k-row model that
    downstream consumers (IVF coarse quantizer, cluster-balanced sampling)
    broadcast. Determinism contract is the module docstring's: seeds by
    md5(vec_id), 6dp-rounded means, so the artifact is bit-comparable to
    the DuckDB transcription (:func:`kmeans_centroid_ctes`)."""
    e = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    seed_order = [F.md5(F.col("vec_id").cast("string")), F.col("vec_id")]
    seeds = e.orderBy(*seed_order).limit(k)
    w = Window.orderBy(*seed_order)
    cents = seeds.select(
        F.row_number().over(w).alias("cid"), F.col("e").alias("ce")
    )
    for _ in range(iters):
        assigned = _assign(e, cents)
        means = assigned.groupBy("cid").agg(
            *[
                F.round(F.avg(F.element_at("e", i + 1)), 6).alias(f"m{i}")
                for i in range(dim)
            ]
        )
        cents = means.select(
            "cid", F.array(*[F.col(f"m{i}") for i in range(dim)]).alias("ce")
        )
    return cents


def kmeans_stats(emb: DataFrame, k: int = K, iters: int = ITERS, dim: int = DIM) -> DataFrame:
    """Lloyd's k-means, ``iters`` rounds from md5-deterministic seeds;
    returns (centroid_id, n_members, inertia) for the final assignment.

    At 100 TB: assignment never shuffles the corpus (broadcast centroids),
    each update is one aggregate; for deep runs add a localCheckpoint on
    the k-row centroid frame every few rounds (it is the only thing whose
    lineage grows) — at 2 rounds the plan stays shallow without it."""
    e = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    final = _assign(e, kmeans_centroids(emb, k, iters, dim))
    return (
        final.groupBy(F.col("cid").alias("centroid_id"))
        .agg(
            F.count("*").alias("n_members"),
            F.round(F.sum("d2"), 3).alias("inertia"),
        )
    )


def kmeans_centroid_ctes(
    k: int = K, iters: int = ITERS, dim: int = DIM, prefix: str = ""
) -> tuple[list[str], str]:
    """DuckDB CTE transcription of :func:`kmeans_centroids`, unrolled per
    iteration. Returns (cte_list, final_centroid_cte_name) — the final CTE
    has columns (cid, ce). ``prefix`` namespaces the CTEs so a consumer
    query (IVF, recall) can splice them next to its own. Shared by
    q_kmeans / q_ann_ivf / q_ann_recall so all three oracles train the
    SAME centroids the Spark side does."""
    p = prefix
    d2 = (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> ({p}emb.e[i] - c.ce[i]) * ({p}emb.e[i] - c.ce[i])))"
    )
    ctes = [
        f"{p}emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e "
        "FROM embeddings)",
        f"""{p}c0 AS (
            SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
                       AS cid,
                   e AS ce
            FROM (SELECT vec_id, e FROM {p}emb
                  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k})
        )""",
    ]
    for t in range(iters):
        ctes.append(
            f"""{p}a{t} AS (
            SELECT vec_id, e, cid, d2 FROM (
                SELECT {p}emb.vec_id, {p}emb.e, c.cid, {d2} AS d2,
                       ROW_NUMBER() OVER (
                           PARTITION BY {p}emb.vec_id
                           ORDER BY {d2}, c.cid
                       ) AS rn
                FROM {p}emb CROSS JOIN {p}c{t} c
            ) WHERE rn = 1
        )"""
        )
        ctes.append(
            f"""{p}c{t + 1} AS (
            SELECT cid, list(m ORDER BY i) AS ce FROM (
                SELECT cid, g.i AS i, ROUND(AVG(e[g.i]), 6) AS m
                FROM {p}a{t} CROSS JOIN
                     (SELECT UNNEST(generate_series(1, {dim})) AS i) g
                GROUP BY cid, g.i
            ) GROUP BY cid
        )"""
        )
    return ctes, f"{p}c{iters}"


def _kmeans_oracle(k: int = K, iters: int = ITERS, dim: int = DIM) -> str:
    """Unrolled-iteration DuckDB transcription of :func:`kmeans_stats`:
    trained centroids (shared CTE builder) + one final assignment pass."""
    ctes, cfinal = kmeans_centroid_ctes(k, iters, dim)
    d2 = (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        "i -> (emb.e[i] - c.ce[i]) * (emb.e[i] - c.ce[i])))"
    )
    ctes = ctes + [
        f"""afinal AS (
            SELECT vec_id, e, cid, d2 FROM (
                SELECT emb.vec_id, emb.e, c.cid, {d2} AS d2,
                       ROW_NUMBER() OVER (
                           PARTITION BY emb.vec_id
                           ORDER BY {d2}, c.cid
                       ) AS rn
                FROM emb CROSS JOIN {cfinal} c
            ) WHERE rn = 1
        )"""
    ]
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT cid AS centroid_id, COUNT(*) AS n_members,
           ROUND(SUM(d2), 3) AS inertia
    FROM afinal
    GROUP BY cid
    """


@query("q_kmeans", oracle=_kmeans_oracle())
def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train k=4 centroids over the embeddings table with 2 Lloyd's rounds
    and report cluster sizes + inertia — the training step upstream of the
    IVF index (``q_ann_ivf``). See :func:`kmeans_stats` for the scale and
    determinism design."""
    return kmeans_stats(load_table(spark, sf_dir, "embeddings"))
