"""Corpus assembly operators: shard-shuffle, budget selection, mixtures.

The last mile of a training-data pipeline, after cleaning and dedup: put
the corpus in a reproducible shuffled order split into shards, select the
best documents under a token budget, size the tokenizer vocabulary, and
weight the domain mixture. The reference reaches this stage implicitly —
its per-document upserts (``scraper/main.py:263``) build one collection a
dashboard reads — but at pretraining scale these four are explicit,
corpus-wide operators, so they are registered here as first-class,
oracle-checked queries.

Scale notes (the part that matters at 100 TB):

- The shard-shuffle NEVER runs a global ``row_number`` — positions are
  windowed PER SHARD, and the shard count is a knob that grows with the
  corpus, so each window partition stays task-sized.
- Budget selection never runs a corpus-wide cumulative sum either: a
  two-level prefix sum aggregates per score-band totals (tiny), takes
  whole bands wholesale, and only the single BOUNDARY band gets a
  row-level running sum. The oracle states the same selection as one
  global window — fine for DuckDB at test SF, fatal on a cluster — and
  the hash compare proves the banded plan computes the identical set.
- Vocabulary coverage windows over the AGGREGATED term dictionary
  (|vocab| rows, not corpus rows); the coverage cutoff is evaluated in
  integer arithmetic so no float boundary can flip membership.
- Mixture weights are pure aggregate arithmetic; temperature tau=2 uses
  ``sqrt``, which IEEE defines exactly, so Spark and DuckDB agree
  bit-for-bit before rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_data_engineering_spark.io import load_table
from projet_data_engineering_spark.registry import query

N_SHARDS = 64
TOKEN_BUDGET = 10_000
COVERAGE_NUM, COVERAGE_DEN = 19, 20  # keep terms while prior coverage < 95%


def _ntok(col: str = "text") -> F.Column:
    return F.size(F.split(col, " "))


@query(
    "q_shuffle_shard",
    oracle=f"""
    SELECT doc_id, shard,
           ROW_NUMBER() OVER (
               PARTITION BY shard ORDER BY h, doc_id
           ) AS pos
    FROM (
        SELECT doc_id,
               md5(CAST(doc_id AS VARCHAR)) AS h,
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                    AS INT) % {N_SHARDS} AS shard
        FROM documents
    )
    """,
)
def q_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding — the write-side order every
    training run consumes. ``rand()`` breaks reproducibility; instead both
    the shard AND the within-shard order derive from md5(key), so any
    engine (and any re-run on a grown corpus) produces the identical
    layout. One shuffle, partitioned BY SHARD: position is
    ``row_number`` windowed per shard, never globally, so no single task
    ever sees more than corpus/N_SHARDS rows — N_SHARDS is the scale
    knob (64 here; ~100k shards at 100 TB keeps shards ~1 GB)."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    shard = F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % N_SHARDS
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        d.select("doc_id", h.alias("h"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shard", "pos")
    )


@query(
    "q_token_budget",
    oracle=f"""
    SELECT doc_id, n_tokens
    FROM (
        SELECT doc_id,
               CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
               SUM(len(str_split(text, ' '))) OVER (
                   ORDER BY CAST(n_chars AS DOUBLE) / len(str_split(text, ' '))
                            DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM documents
    )
    WHERE cum <= {TOKEN_BUDGET}
    """,
)
def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select the best documents until a token budget is exhausted (quality
    proxy: mean word length, desc; ties by doc_id). The oracle writes the
    textbook form — one GLOBAL cumulative sum — which serializes the whole
    corpus through one task and is exactly what must NOT run at 100 TB.

    The Spark plan is the scalable two-level prefix sum instead: (1) band
    scores at 0.1 granularity and aggregate per-band token totals (tiny);
    (2) a cumulative sum over the BAND table (bounded window over an
    aggregate — plan-audit-clean) splits bands into taken-wholesale /
    boundary / dropped; (3) only the one boundary band gets a row-level
    running sum, windowed BY BAND. Banding is monotone in score, so the
    selected set is identical — the hash compare against the global-window
    oracle proves it on every run. Two small shuffles + one broadcast."""
    d = load_table(spark, sf_dir, "documents")
    ntok = _ntok()
    score = F.col("n_chars").cast("double") / ntok
    scored = d.select(
        "doc_id",
        ntok.cast("bigint").alias("n_tokens"),
        score.alias("score"),
        F.floor(score * 10).cast("int").alias("band"),
    )
    bands = scored.groupBy("band").agg(F.sum("n_tokens").alias("band_toks"))
    wb = Window.orderBy(F.desc("band")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bands = bands.select(
        "band",
        F.sum("band_toks").over(wb).alias("cum"),
        (F.sum("band_toks").over(wb) - F.col("band_toks")).alias("offset"),
    )
    whole = bands.where(F.col("cum") <= TOKEN_BUDGET).select("band")
    boundary = bands.where(
        (F.col("offset") < TOKEN_BUDGET) & (F.col("cum") > TOKEN_BUDGET)
    ).select("band", "offset")
    taken_whole = scored.join(F.broadcast(whole), "band", "semi")
    wr = Window.partitionBy("band").orderBy(F.desc("score"), "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    taken_boundary = (
        scored.join(F.broadcast(boundary), "band")
        .withColumn("run", F.sum("n_tokens").over(wr))
        .where(F.col("offset") + F.col("run") <= TOKEN_BUDGET)
    )
    return taken_whole.select("doc_id", "n_tokens").unionByName(
        taken_boundary.select("doc_id", "n_tokens")
    )


@query(
    "q_vocab_coverage",
    oracle=f"""
    SELECT term, c, cum
    FROM (
        SELECT u.term,
               COUNT(*) AS c,
               CAST(SUM(COUNT(*)) OVER (
                   ORDER BY COUNT(*) DESC, u.term
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum,
               SUM(COUNT(*)) OVER () AS total
        FROM (SELECT str_split(lower(text), ' ') AS t FROM documents) toks,
             UNNEST(toks.t) AS u(term)
        GROUP BY u.term
    )
    WHERE (cum - c) * {COVERAGE_DEN} < total * {COVERAGE_NUM}
    """,
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary truncated at 95% corpus coverage — how a
    tokenizer's vocab size is actually chosen. Keep a term while the
    coverage accumulated BEFORE it is still under 95%, so the vocabulary
    is the shortest prefix reaching the target. The windows run over the
    AGGREGATED dictionary (|vocab| rows), never the token stream, so the
    partition-less window is aggregate-bounded (plan-audit-clean). The
    cutoff compares ``(cum - c) * 20 < total * 19`` in pure integer
    arithmetic — no float rounding can flip a term's membership."""
    d = load_table(spark, sf_dir, "documents")
    uni = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    wc = Window.orderBy(F.desc("c"), "term").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        uni.select(
            "term",
            "c",
            F.sum("c").over(wc).alias("cum"),
            F.sum("c").over(wt).alias("total"),
        )
        .where(
            (F.col("cum") - F.col("c")) * COVERAGE_DEN
            < F.col("total") * COVERAGE_NUM
        )
        .select("term", "c", "cum")
    )


@query(
    "q_domain_temperature",
    oracle="""
    WITH per AS (
        SELECT source, CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS n_toks
        FROM documents
        GROUP BY source
    ),
    tot AS (
        SELECT CAST(SUM(n_toks) AS DOUBLE) AS n,
               SUM(sqrt(CAST(n_toks AS DOUBLE))) AS z
        FROM per
    )
    SELECT source, n_toks,
           ROUND(sqrt(CAST(n_toks AS DOUBLE)) / z, 5) AS weight,
           ROUND(sqrt(CAST(n_toks AS DOUBLE)) / z * n / n_toks, 4)
               AS repeat_factor
    FROM per, tot
    """,
)
def q_domain_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixture (tau=2): sampling weight per source
    proportional to p^(1/tau) = sqrt(n_toks) — the standard fix for
    head-domain domination when mixing web/books/code corpora, with
    ``repeat_factor`` = weight * N / n_toks, the expected epochs over each
    domain under the reweighted sampler. tau=2 is deliberate: sqrt is
    exactly rounded under IEEE-754, so both engines compute identical
    per-domain values and only the (tiny, |domains|-sized) normalizer sum
    is float-order-sensitive — hidden well below the 5-decimal rounding.
    One aggregate over the corpus + a broadcast 1-row normalizer."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.sum(_ntok()).cast("bigint").alias("n_toks")
    )
    tot = per.agg(
        F.sum("n_toks").cast("double").alias("n"),
        F.sum(F.sqrt(F.col("n_toks").cast("double"))).alias("z"),
    )
    s = F.sqrt(F.col("n_toks").cast("double"))
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_toks",
        F.round(s / F.col("z"), 5).alias("weight"),
        F.round(s / F.col("z") * F.col("n") / F.col("n_toks"), 4).alias(
            "repeat_factor"
        ),
    )


def domain_resample(
    docs: DataFrame, id_col: str = "doc_id", domain_col: str = "source"
) -> DataFrame:
    """APPLY the tau=2 temperature mixture (:func:`q_domain_temperature`
    computes the weights; this materializes the resampled corpus): each
    document is emitted ``floor(rf)`` times plus one more with probability
    ``frac(rf)``, where rf is its domain's repeat factor — head domains
    subsample (rf<1 → keep-with-probability-rf), tail domains repeat.
    Stochastic rounding keeps each domain's EXPECTED token share exactly at
    the temperature target without a global counter.

    Deterministic end-to-end: the Bernoulli draw is the doc's md5 first-8-
    hex-digits over 2³² (the ``q_train_test_split`` trick — exact dyadic
    double, engine-portable), rf carries ``q_domain_temperature``'s 4dp
    rounding, so membership and copy counts are reproducible across runs
    AND engines — a re-run of the corpus build emits the identical mixture.

    Scale shape: the weights table is |domains| rows (broadcast by
    definition — a domain dictionary, not a drop list), the draw and the
    copy explode are map-only, nothing shuffles the corpus. Output grows
    by at most ceil(max rf) ×."""
    per = docs.groupBy(domain_col).agg(
        F.sum(_ntok()).cast("bigint").alias("n_toks")
    )
    tot = per.agg(
        F.sum("n_toks").cast("double").alias("n"),
        F.sum(F.sqrt(F.col("n_toks").cast("double"))).alias("z"),
    )
    s = F.sqrt(F.col("n_toks").cast("double"))
    rf_tbl = per.crossJoin(F.broadcast(tot)).select(
        domain_col,
        F.round(s / F.col("z") * F.col("n") / F.col("n_toks"), 4).alias("rf"),
    )
    draw = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    rf = F.col("rf")
    n_copies = (
        F.floor(rf) + F.when(draw < rf - F.floor(rf), 1).otherwise(0)
    ).cast("int")
    return (
        docs.join(F.broadcast(rf_tbl), domain_col)
        .select(id_col, domain_col, n_copies.alias("n_copies"))
        .filter(F.col("n_copies") > 0)
        .select(
            id_col,
            domain_col,
            F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias(
                "copy_idx"
            ),
        )
    )


@query(
    "q_domain_resample",
    oracle="""
    WITH per AS (
        SELECT source, CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS n_toks
        FROM documents
        GROUP BY source
    ),
    tot AS (
        SELECT CAST(SUM(n_toks) AS DOUBLE) AS n,
               SUM(sqrt(CAST(n_toks AS DOUBLE))) AS z
        FROM per
    ),
    rft AS (
        SELECT source,
               ROUND(sqrt(CAST(n_toks AS DOUBLE)) / z * n / n_toks, 4) AS rf
        FROM per, tot
    ),
    cop AS (
        SELECT d.doc_id, d.source,
               CAST(FLOOR(rf) + CASE WHEN
                        CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                             AS BIGINT) / 4294967296.0
                        < rf - FLOOR(rf)
                    THEN 1 ELSE 0 END AS INT) AS n_copies
        FROM documents d JOIN rft USING (source)
    )
    SELECT doc_id, source, UNNEST(generate_series(1, n_copies)) AS copy_idx
    FROM cop WHERE n_copies > 0
    """,
)
def q_domain_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the temperature-scaled domain mixture over ``documents``
    as (doc_id, source, copy_idx) — the apply tier above
    ``q_domain_temperature``'s weights. See :func:`domain_resample` for the
    deterministic stochastic-rounding contract and the scale shape."""
    return domain_resample(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# DSIR importance weights (r7): select raw docs that look like the target
# ---------------------------------------------------------------------------

_DSIR_CTES = """
    toks AS (
        SELECT doc_id, lang, t FROM (
            SELECT doc_id, lang, UNNEST(str_split(lower(text), ' ')) AS t
            FROM documents
        ) WHERE t <> ''
    ),
    vocab AS (
        SELECT t, COUNT(*) AS cr,
               SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
        FROM toks GROUP BY t
    ),
    tot AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt, COUNT(*) AS v FROM vocab),
    lr AS (
        SELECT t, ln((ct + 1.0) / (nt + v)) - ln((cr + 1.0) / (nr + v)) AS lr
        FROM vocab CROSS JOIN tot
    ),
    doc_terms AS (
        SELECT doc_id, t, COUNT(*) AS cnt FROM toks GROUP BY doc_id, t
    ),
    weights AS (
        SELECT d.doc_id, CAST(SUM(d.cnt) AS BIGINT) AS n_tokens,
               ROUND(SUM(d.cnt * lr.lr), 4) + 0.0 AS log_ratio
        FROM doc_terms d JOIN lr ON d.t = lr.t
        GROUP BY d.doc_id
    )"""


def dsir_weights(docs: DataFrame, target: F.Column) -> DataFrame:
    """Per-document importance weight log(p_target(x)/p_raw(x)) under
    add-one-smoothed unigram language models — Data Selection via
    Importance Resampling (Xie et al., NeurIPS 2023), with the target
    distribution estimated from the rows where ``target`` is true.

    Shape at 100 TB: ONE pass over the exploded token stream builds BOTH
    models simultaneously (raw count + conditional target count per term —
    no second corpus scan for the target side); the totals are a 1-row
    broadcast; the per-term log-ratio dictionary joins back onto the token
    stream WITHOUT a broadcast hint — |vocab| is corpus-dependent, so the
    r6 drop-list rule applies: AQE broadcasts when the runtime size fits,
    else a shuffle join degrades gracefully. The paper's production trick
    for pinning the dictionary size — hash n-grams into a FIXED bucket
    count (10k) so the model is O(1) however large the corpus — slots in
    as one ``pmod(xxhash64(t), buckets)`` before the groupBy; raw unigrams
    keep the oracle exact here.
    """
    toks = (
        docs.select("doc_id", target.alias("is_target"),
                    F.explode(F.split(F.lower("text"), " ")).alias("t"))
        .filter(F.col("t") != "")
    )
    vocab = toks.groupBy("t").agg(
        F.count("*").alias("cr"),
        # when/otherwise (not sum(cast)) so a term seen only in NULL-lang
        # docs counts 0, matching the oracle's CASE ... ELSE 0 — sum over
        # all-NULL yields NULL on Spark and would hash-diverge
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("ct"),
    )
    tot = vocab.agg(
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt"),
        F.count("*").alias("v"),
    )
    lr = vocab.crossJoin(F.broadcast(tot)).select(
        "t",
        (
            F.log((F.col("ct") + 1.0) / (F.col("nt") + F.col("v")))
            - F.log((F.col("cr") + 1.0) / (F.col("nr") + F.col("v")))
        ).alias("lr"),
    )
    # Pre-aggregate to (doc, term, cnt) BEFORE the dictionary join: the
    # join input shrinks from token INSTANCES to per-doc DISTINCT terms
    # (a Zipf corpus repeats its head constantly), and the per-doc sum
    # runs over one term-row each — cnt*lr on both engines, fewer
    # float-summation terms. This is also what kept the stage from going
    # super-linear at sf10 (token-instance join measured 18x on 10x data).
    doc_terms = toks.groupBy("doc_id", "t").agg(F.count("*").alias("cnt"))
    return (
        doc_terms.join(lr, "t")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_tokens"),
            # + 0.0 flushes IEEE negative zero: a doc whose ratio rounds
            # to -0.0 renders as "-0.000000" on DuckDB but "0.000000" on
            # Spark->pandas, failing the value hash (caught at sf0.1)
            (F.round(F.sum(F.col("cnt") * F.col("lr")), 4) + F.lit(0.0)).alias(
                "log_ratio"
            ),
        )
    )


@query(
    "q_dsir_weights",
    oracle=f"""
    WITH {_DSIR_CTES}
    SELECT doc_id, n_tokens, log_ratio FROM weights
    """,
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weight per document, target = the English slice of
    the corpus: documents whose unigram profile looks English score high,
    out-of-target docs score low. See :func:`dsir_weights` for the
    one-pass/100 TB design."""
    docs = load_table(spark, sf_dir, "documents")
    return dsir_weights(docs, F.col("lang") == "en")


@query(
    "q_dsir_select",
    oracle=f"""
    WITH {_DSIR_CTES}
    SELECT doc_id, log_ratio, rank FROM (
        SELECT doc_id, log_ratio,
               ROW_NUMBER() OVER (ORDER BY log_ratio DESC, doc_id) AS rank
        FROM weights
    ) WHERE rank <= 50
    """,
)
def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 documents by DSIR weight — the deterministic skeleton of the
    resampling step (the paper samples WITHOUT replacement with probability
    ∝ weight; ``q_sample_weighted`` already demonstrates the weighted-draw
    machinery, so this query pins the ranking itself). The top-k is
    TakeOrdered-shaped: k rows per partition move, never the corpus."""
    w = q_dsir_weights(spark, sf_dir)
    return (
        w.orderBy(F.desc("log_ratio"), F.asc("doc_id"))
        .limit(50)
        .select(
            "doc_id",
            "log_ratio",
            F.row_number()
            .over(Window.orderBy(F.desc("log_ratio"), F.asc("doc_id")))
            .alias("rank"),
        )
    )
