"""Product quantization (PQ) for the embedding store + ADC approximate search.

The third compression/ANN tier next to scalar int8 quantization
(``similarity.q_embed_quantize``) and the IVF coarse index
(``similarity.q_ann_ivf``): split the 64-dim vector into M=16 contiguous
4-dim subspaces, train an independent k-means codebook per subspace
(K=16, 2 Lloyd's rounds — ``operators.ml.kmeans_centroids``, the
md5-deterministic-seed trainer the IVF quantizer already uses), and store
each vector as M small integer codes. This is the classic Jégou et al.
(TPAMI 2011) layout: at 100 TB, 64 float32 (256 B) become M codes
(M bytes at K≤256 — 16 B here, 16×) plus ONE shared M·K·subdim codebook —
a ~16× smaller scan for the distance pass, and the reason real vector
stores run IVF **+PQ** rather than raw floats in the inverted lists.
The M/K choice is measured, not guessed: on this near-isotropic synthetic
corpus, 4 subspaces × 4 codes ranks no better than chance (quantization
error ~20× the NN gap), while 16×16 recovers ADC recall@5 ≈ 0.33 and
rerank@50 up to 1.0 (see ``q_ann_pq_rerank``).

Asymmetric distance computation (ADC): a query computes its M·K-entry
distance table against the codebooks ONCE (a per-query constant — M·K
doubles), then every corpus vector's approximate distance is M table
lookups on its codes. On Spark that is: codes table ``crossJoin`` the
1-row broadcast query artifact → map-only lookup + add per row → the only
shuffle is the final per-query top-k. The corpus never moves.

Determinism contract (same as the k-means family): codebooks round
centroids to 6 dp per Lloyd's round; every subspace distance rounds to
6 dp BEFORE the argmin, ties break toward the LOWEST code id; ADC sums
the rounded entries and rounds again — both engines walk identical
lattices, so the driver hash check is exact, not tolerance-based.

Reference anchor: the reference delegates all vector workloads to an
external service (``app/main.py``'s Elasticsearch search tier); this
family is the Spark-native shape those workloads take when the corpus is
too large to hold uncompressed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_data_engineering_spark.io import load_table
from projet_data_engineering_spark.operators.ml import (
    DIM,
    _dist2,
    kmeans_centroid_ctes,
)
from projet_data_engineering_spark.operators.similarity import as_double
from projet_data_engineering_spark.registry import query

PQ_M = 16          # subspaces
PQ_SUBDIM = 4      # dims per subspace (PQ_M * PQ_SUBDIM == DIM)
PQ_K = 16          # codes per subspace codebook (64-bit codes total)
PQ_ITERS = 2       # Lloyd's rounds per codebook
PQ_NQ = 3          # query panel: vec_id < PQ_NQ
PQ_TOPK = 5
PQ_SHORTLIST = 50  # ADC candidates kept for the exact rerank tier

assert PQ_M * PQ_SUBDIM == DIM


def _sub(v: Column, m: int) -> Column:
    """m-th contiguous subvector (1-based slice, same bounds as the oracle's
    DuckDB list slice)."""
    return F.slice(v, m * PQ_SUBDIM + 1, PQ_SUBDIM)


def pq_codebooks(emb: DataFrame) -> DataFrame:
    """Train the M independent subspace codebooks → (m, cid, ce).

    The math per subspace is :func:`ml.kmeans_centroids` exactly (seeds =
    bottom-K vectors by md5(vec_id) — identical seed ROWS across subspaces,
    different seed VALUES because the slice differs; raw-d2 argmin with
    lowest-cid ties; 6-dp-rounded means) — the oracle transcribes it with
    the SAME shared CTE builder, sliced source expression. But the M runs
    are fused into ONE loop over the long format (vec_id, m, ev): one
    broadcast of all M·K candidate centroids per Lloyd's round, one
    groupBy(m, cid) update — ~2 stages per round for all 16 subspaces
    instead of ~3 stages × 16 trainings (stage overhead, not data volume,
    dominated the naive version at small SF; at 100 TB the fused loop also
    reads the corpus once per round instead of M times)."""
    e = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    subparts = F.array(
        *[
            F.struct(F.lit(m).alias("m"), _sub(F.col("v"), m).alias("ev"))
            for m in range(PQ_M)
        ]
    )
    long = e.select("vec_id", F.explode(subparts).alias("p")).select(
        "vec_id", "p.m", "p.ev"
    )
    seed_order = [F.md5(F.col("vec_id").cast("string")), F.col("vec_id")]
    w = Window.orderBy(*seed_order)
    seeds = (
        e.orderBy(*seed_order)
        .limit(PQ_K)
        .select(F.row_number().over(w).alias("cid"), "v")
    )
    books = seeds.select(
        "cid",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"), _sub(F.col("v"), m).alias("ce")
                    )
                    for m in range(PQ_M)
                ]
            )
        ).alias("p"),
    ).select("p.m", "cid", "p.ce")
    for _ in range(PQ_ITERS):
        art = (
            books.select(F.struct("m", "cid", "ce").alias("b"))
            .agg(F.array_sort(F.collect_list("b")).alias("books"))
            .localCheckpoint(eager=True)
        )
        # Raw-d2 argmin (NOT rounded — training matches kmeans_centroids;
        # only the ENCODE argmin rounds), ties toward the lowest cid.
        best = F.array_min(
            F.transform(
                F.filter(F.col("books"), lambda b: b["m"] == F.col("m")),
                lambda b: F.struct(
                    _dist2(F.col("ev"), b["ce"]).alias("d2"),
                    b["cid"].alias("cid"),
                ),
            )
        )
        assigned = long.crossJoin(F.broadcast(art)).select(
            "vec_id", "m", "ev", best["cid"].alias("cid")
        )
        means = assigned.groupBy("m", "cid").agg(
            *[
                F.round(F.avg(F.element_at("ev", i + 1)), 6).alias(f"d{i}")
                for i in range(PQ_SUBDIM)
            ]
        )
        books = means.select(
            "m",
            "cid",
            F.array(*[F.col(f"d{i}") for i in range(PQ_SUBDIM)]).alias("ce"),
        )
    return books


def _book_artifact(emb: DataFrame) -> DataFrame:
    """1-row broadcastable codebook artifact with ONE COLUMN PER SUBSPACE
    (``bk0``..``bk{M-1}``, each a cid-sorted array of struct(cid, ce)).

    The per-m split happens HERE, on the single artifact row — a corpus row
    then reads its subspace's K entries directly instead of filtering the
    full M·K array M times (the flat-array version compiled a 16× larger
    expression tree per row; the encode stage was codegen-bound, not
    data-bound). Eagerly materialized for the same reason as
    ``similarity._ivf_cent_artifact``: later broadcasts build from the
    stored row instead of re-running training in a broadcast-build thread."""
    flat = (
        pq_codebooks(emb)
        .select(F.struct("m", "cid", "ce").alias("b"))
        .agg(F.array_sort(F.collect_list("b")).alias("books"))
    )

    def bk(m: int) -> Column:
        # NB: the subspace index must be captured OUTSIDE the lambda — a
        # two-parameter lambda (`lambda b, m=m`) is interpreted by Spark's
        # higher-order `filter` as (element, array_index), silently binding
        # m to the element position (caught by the oracle gate).
        mm = F.lit(m)
        return F.transform(
            F.filter(F.col("books"), lambda b: b["m"] == mm),
            lambda b: F.struct(b["cid"].alias("cid"), b["ce"].alias("ce")),
        )

    return flat.select(
        *[bk(m).alias(f"bk{m}") for m in range(PQ_M)]
    ).localCheckpoint(eager=True)


def _code(m: int) -> Column:
    """Argmin struct (d2, cid) of subspace ``m`` against its broadcast
    ``bk{m}`` codebook column, for a row's double vector ``v``. 6-dp
    rounding before the argmin + lowest-cid tie-break = the cross-engine
    contract."""
    sub = _sub(F.col("v"), m)
    cands = F.transform(
        F.col(f"bk{m}"),
        lambda b: F.struct(
            F.round(_dist2(sub, b["ce"]), 6).alias("d2"),
            b["cid"].alias("cid"),
        ),
    )
    return F.array_min(cands)


def pq_encode(emb: DataFrame) -> DataFrame:
    """(vec_id, v, c1..cM, recon_err): PQ codes per vector plus the exact
    squared reconstruction error (= sum of the chosen per-subspace
    distances — the quantity PQ training minimizes). Map-only over the
    corpus: one crossJoin against the 1-row codebook artifact, zero
    shuffles. At 100 TB the (vec_id, c1..cM) projection IS the stored
    index — M bytes a row."""
    v = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    enc = v.crossJoin(F.broadcast(_book_artifact(emb))).select(
        "vec_id", "v", *[_code(m).alias(f"s{m}") for m in range(PQ_M)]
    )
    err = F.round(
        sum(F.col(f"s{m}")["d2"] for m in range(PQ_M)), 6
    ).alias("recon_err")
    return enc.select(
        "vec_id",
        "v",
        *[F.col(f"s{m}")["cid"].alias(f"c{m + 1}") for m in range(PQ_M)],
        err,
    )


def _books_ctes() -> str:
    """Spliceable DuckDB CTE chain: per-subspace codebooks (the SHARED
    k-means transcription, sliced source expression), the unioned ``books``
    model, the full-vector ``v`` scan, the dense (vector × codebook-entry)
    distance grid ``alldt``, and the argmin ``codes``. Every PQ oracle
    splices this so all three train the same lattice the Spark side does."""
    ctes: list[str] = []
    unions: list[str] = []
    for m in range(PQ_M):
        lo, hi = m * PQ_SUBDIM + 1, (m + 1) * PQ_SUBDIM
        sub_ctes, final = kmeans_centroid_ctes(
            PQ_K,
            PQ_ITERS,
            PQ_SUBDIM,
            prefix=f"pq{m}",
            e_expr=f"(CAST(embedding AS DOUBLE[]))[{lo}:{hi}]",
        )
        ctes.extend(sub_ctes)
        unions.append(f"SELECT {m} AS m, cid, ce FROM {final}")
    ctes.append("books AS (" + " UNION ALL ".join(unions) + ")")
    ctes.append(
        "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e "
        "FROM embeddings)"
    )
    ctes.append(
        f"""alldt AS (
        SELECT v.vec_id, b.m, b.cid,
               ROUND(list_sum(list_transform(generate_series(1, {PQ_SUBDIM}),
                   i -> (v.e[b.m * {PQ_SUBDIM} + i] - b.ce[i])
                      * (v.e[b.m * {PQ_SUBDIM} + i] - b.ce[i]))), 6) AS d2
        FROM v CROSS JOIN books b
    )"""
    )
    ctes.append(
        """codes AS (
        SELECT vec_id, m, cid, d2 FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id, m ORDER BY d2, cid) AS rn
            FROM alldt
        ) WHERE rn = 1
    )"""
    )
    return ",\n    ".join(ctes)


_CODE_COLS = ", ".join(
    f"CAST(MAX(CASE WHEN m = {m} THEN cid END) AS BIGINT) AS c{m + 1}"
    for m in range(PQ_M)
)

_PQ_ENCODE_ORACLE = f"""
    WITH {_books_ctes()}
    SELECT vec_id, {_CODE_COLS},
           ROUND(SUM(d2), 6) AS recon_err
    FROM codes GROUP BY vec_id
    """

# ADC from the oracle side: the query's own rows of the dense distance grid
# ARE its distance table, so approximate distance = the 4-row sum of grid
# entries matched on the corpus vector's codes.
_PQ_SCORED_CTE = f"""scored AS (
        SELECT q.vec_id AS query_id, c.vec_id,
               ROUND(SUM(q.d2), 6) AS adist
        FROM codes c JOIN alldt q
          ON q.m = c.m AND q.cid = c.cid
         AND q.vec_id < {PQ_NQ} AND c.vec_id <> q.vec_id
        GROUP BY q.vec_id, c.vec_id
    )"""

_PQ_ANN_ORACLE = f"""
    WITH {_books_ctes()},
    {_PQ_SCORED_CTE}
    SELECT query_id, vec_id, adist, rank FROM (
        SELECT query_id, vec_id, adist,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adist, vec_id) AS rank
        FROM scored
    ) WHERE rank <= {PQ_TOPK}
    """


@query("q_pq_encode", oracle=_PQ_ENCODE_ORACLE)
def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantize the embedding store: 4 trained subspace codebooks,
    4 codes + exact reconstruction error per vector. The compression tier a
    100 TB vector corpus applies before its inverted lists (IVF**+PQ**);
    reconstruction error is the contract column — the oracle recomputes the
    whole lattice (training included), so a wrong slice bound, rounding
    mode, or tie-break fails the hash, not just a unit test."""
    return pq_encode(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        *[F.col(f"c{m + 1}").cast("bigint").alias(f"c{m + 1}") for m in range(PQ_M)],
        "recon_err",
    )


def adc_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, vec_id, adist) for the full panel×corpus ADC scan —
    shared by ``q_ann_pq`` (top-5) and ``q_ann_pq_rerank`` (shortlist)."""
    e = load_table(spark, sf_dir, "embeddings")
    enc = pq_encode(e)
    codes = enc.select(
        "vec_id", *[f"c{m + 1}" for m in range(PQ_M)]
    )

    # Per-query distance tables as maps cid → d2 (no positional assumption:
    # a codebook entry that lost all members during training simply has no
    # map key, on both engines).
    def dtab(m: int) -> Column:
        sub = _sub(F.col("v"), m)
        return F.map_from_entries(
            F.transform(
                F.col(f"bk{m}"),
                lambda b: F.struct(
                    b["cid"].alias("key"),
                    F.round(_dist2(sub, b["ce"]), 6).alias("value"),
                ),
            )
        )

    v = e.select("vec_id", as_double(F.col("embedding")).alias("v"))
    qart = (
        v.filter(F.col("vec_id") < PQ_NQ)
        .crossJoin(F.broadcast(_book_artifact(e)))
        .select(
            F.struct(
                F.col("vec_id").alias("query_id"),
                *[dtab(m).alias(f"dt{m}") for m in range(PQ_M)],
            ).alias("q")
        )
        .agg(F.collect_list("q").alias("qs"))
        .localCheckpoint(eager=True)
    )
    adist = F.round(
        sum(
            F.element_at(F.col(f"q.dt{m}"), F.col(f"c{m + 1}"))
            for m in range(PQ_M)
        ),
        6,
    )
    return (
        codes.crossJoin(F.broadcast(qart))
        .select("vec_id", *[f"c{m + 1}" for m in range(PQ_M)], F.explode("qs").alias("q"))
        .filter(F.col("vec_id") != F.col("q.query_id"))
        .select(
            F.col("q.query_id").alias("query_id"),
            "vec_id",
            adist.alias("adist"),
        )
    )


@query("q_ann_pq", oracle=_PQ_ANN_ORACLE)
def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC approximate top-5 for the 3-query panel, entirely from PQ codes:
    each query folds its M·K distance table into a broadcast map artifact,
    and every corpus vector is scored by M map lookups on its codes — the
    compressed-domain scan that replaces full-precision cosine at 100 TB.
    Map-only until the final per-query top-k (the one shuffle)."""
    scored = adc_scored(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("query_id", "vec_id", "adist", "rank")
    )


_D2_FULL = (
    f"list_sum(list_transform(generate_series(1, {DIM}), "
    "i -> (v.e[i] - q.qv[i]) * (v.e[i] - q.qv[i])))"
)

_PQ_RECALL_ORACLE = f"""
    WITH {_books_ctes()},
    q AS (SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < {PQ_NQ}),
    truth AS (
        SELECT query_id, vec_id FROM (
            SELECT q.query_id, v.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                       ORDER BY ROUND({_D2_FULL}, 6), v.vec_id) AS rn
            FROM v CROSS JOIN q WHERE v.vec_id <> q.query_id
        ) WHERE rn <= {PQ_TOPK}
    ),
    {_PQ_SCORED_CTE},
    pq5 AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY adist, vec_id) AS rank
            FROM scored
        ) WHERE rank <= {PQ_TOPK}
    )
    SELECT t.query_id, 'pq' AS method,
           CAST(COUNT(p.vec_id) AS BIGINT) AS n_hits,
           ROUND(COUNT(p.vec_id) / {PQ_TOPK}.0, 4) AS recall
    FROM truth t LEFT JOIN pq5 p
      ON p.query_id = t.query_id AND p.vec_id = t.vec_id
    GROUP BY t.query_id
    """


@query("q_pq_recall", oracle=_PQ_RECALL_ORACLE)
def q_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the ADC compressed-domain scan against the exact
    full-precision L2 top-5 — the accuracy contract the PQ tier ships with,
    mirroring ``q_ann_recall`` for the LSH/IVF tiers. The truth side costs
    one full-precision pass over the query panel only — which is the point:
    at 100 TB you measure recall on a sampled panel, then serve from
    codes."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", as_double(F.col("embedding")).alias("v"))
    q = v.filter(F.col("vec_id") < PQ_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    truth = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(_dist2(F.col("v"), F.col("qv")), 6).alias("d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("vec_id"))
    truth = (
        truth.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PQ_TOPK)
        .select("query_id", "vec_id")
    )
    pq5 = q_ann_pq(spark, sf_dir).select("query_id", "vec_id")
    hits = (
        truth.join(pq5, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        truth.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.lit("pq").alias("method"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            F.round(F.coalesce("n_hits", F.lit(0)) / float(PQ_TOPK), 4).alias(
                "recall"
            ),
        )
    )


_PQ_RERANK_ORACLE = f"""
    WITH {_books_ctes()},
    {_PQ_SCORED_CTE},
    shortlist AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY adist, vec_id) AS rn
            FROM scored
        ) WHERE rn <= {PQ_SHORTLIST}
    ),
    q AS (SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < {PQ_NQ})
    SELECT query_id, vec_id, d2, rank FROM (
        SELECT s.query_id, s.vec_id,
               ROUND({_D2_FULL}, 6) AS d2,
               ROW_NUMBER() OVER (PARTITION BY s.query_id
                   ORDER BY ROUND({_D2_FULL}, 6), s.vec_id) AS rank
        FROM shortlist s
        JOIN v ON v.vec_id = s.vec_id
        JOIN q ON q.query_id = s.query_id
    ) WHERE rank <= {PQ_TOPK}
    """


@query("q_ann_pq_rerank", oracle=_PQ_RERANK_ORACLE)
def q_ann_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production IVFADC+refine shape: ADC picks a fixed-size shortlist
    ({PQ_SHORTLIST} candidates) in the compressed domain, then ONLY the
    shortlist is reranked with exact full-precision L2 — the expensive
    metric touches R rows per query instead of the corpus. On this data the
    rerank lifts recall@5 from ~0.33 (raw ADC, ``q_pq_recall``) to 0.6–1.0.
    At 100 TB the shortlist join is a broadcast semi-join of ≤ |queries|·R
    ids against the vector table: corpus scan stays compressed, exact reads
    are point lookups."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", as_double(F.col("embedding")).alias("v"))
    scored = adc_scored(spark, sf_dir)
    ws = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    shortlist = (
        scored.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= PQ_SHORTLIST)
        .select("query_id", "vec_id")
    )
    q = v.filter(F.col("vec_id") < PQ_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    reranked = (
        shortlist.join(v, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(_dist2(F.col("v"), F.col("qv")), 6).alias("d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("vec_id"))
    return (
        reranked.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("query_id", "vec_id", "d2", "rank")
    )
