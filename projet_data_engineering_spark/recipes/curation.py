"""End-to-end pretraining-data curation: ONE composed pipeline from raw
corpus to packed training windows (VERDICT r6 item 5 — "the one
pretraining-data build the 100 TB story is ultimately about").

Every stage exists individually as an oracle-checked query (q_curate,
q_contamination, q_pii_redact, q_split_groupsafe, q_pack_sequences); this
module is their COMPOSITION, with the plan fixes composition demands:

- **Near-dup labels are computed ONCE** and reused by both consumers — the
  drop list (stage 1) and the leakage-safe split roots (stage 5). Run as
  separate queries those two each pay the full MinHash → LSS component
  pipeline; composed, the (node, root) relation is persisted and both reads
  hit the materialization. At 100 TB the label computation IS the expensive
  corpus shuffle, so halving it dominates everything else this file does.
- **No data-dependent broadcast hints**: the drop list and relabel map ride
  plain joins under AQE (SCALING.md "Drop-list anti-joins").
- **Filters compose before heavy stages**: contamination probing and
  sequence packing run on the ALREADY deduped+quality-floored survivor set,
  not the raw corpus — the stage order is chosen so each successive pass
  scans fewer rows (dedup/quality are cheap relative to n-gram explosion).

Stage semantics (all identical to their standalone queries):
  1. near-dup removal  — MinHash-LSH candidates → LSS components → keep
     cluster roots only (q_dedup_apply's relation);
  2. quality floor     — token-length × stopword-rate score >= min_quality
     (q_curate's score);
  3. decontamination   — drop docs sharing any word-5-gram with the eval
     probe set (q_contamination's relation; eval = doc_id % 97 == 0
     stand-in, excluded from the corpus as well);
  4. PII redaction     — email/phone regexp_replace, map-only, with the
     per-doc scrub count audit column (q_pii_redact's patterns);
  5. leakage-safe split — md5 bucket of the near-dup CLUSTER ROOT (reused
     labels), 13/13/230 test/valid/train (q_split_groupsafe's rule);
  6. sequence packing   — token-budget windows over the train split
     (datapipe.pack_sequences, one shuffle).

``curate_corpus`` returns the packed-window manifest plus a per-stage
accounting DataFrame (docs/tokens surviving each stage — the tokens-in /
tokens-out numbers SCALING.md publishes). ``tools/bench_curation.py`` runs
it at big SF; ``tests/test_curation_pipeline.py`` pins stage-vs-standalone
parity at test scale.

Reference anchor: the reference curates per-document at ingest
(``scraper/main.py:88`` seen-set, ``:263`` upsert); this is that loop as a
corpus-scale batch program.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from projet_data_engineering_spark.operators.datapipe import pack_sequences
from projet_data_engineering_spark.operators.dedup import (
    connected_components_lss,
    minhash_candidate_pairs,
)
from projet_data_engineering_spark.operators.textanalysis import (
    STOPWORDS,
    stopword_hits,
)
from projet_data_engineering_spark.registry import query

EMAIL_RE = r"[a-z0-9#_]+@[a-z]+[.][a-z]+"
PHONE_RE = r"[+]1-555-[0-9]+"


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.5,
    eval_mod: int = 97,
    pack_budget: int = 2048,
) -> dict:
    """Run the full curation pipeline over ``docs`` (doc_id, text, lang,
    source, n_chars). Returns a dict of DataFrames:

    - ``train_windows``: the packed-sequence manifest for the train split;
    - ``splits``: (doc_id, root, split, redacted, n_pii, n_tokens) — the
      curated, redacted, split-assigned corpus;
    - ``funnel``: one row per stage with docs/tokens surviving — the
      tokens-in/tokens-out audit.

    Nothing is collected driver-side except what the caller materializes;
    the labels relation is persisted because two stages consume it."""
    ntok = F.size(F.split(F.lower("text"), " "))
    corpus = docs.select(
        "doc_id", "text", "source", "n_chars", ntok.alias("n_tokens")
    )

    # ---- stage 1: near-dup labels, computed ONCE for stages 1 and 5 ----
    labels = (
        connected_components_lss(
            minhash_candidate_pairs(docs, "doc_id", "text")
        )
        .withColumnRenamed("node", "doc_id")
        .persist()
    )
    labels.count()  # materialize so neither consumer re-runs the LSS rounds
    drop = labels.filter(F.col("doc_id") != F.col("root")).select("doc_id")
    deduped = corpus.join(drop, "doc_id", "left_anti")

    # ---- stage 2: quality floor (q_curate's score) ----
    toks = F.split(F.lower("text"), " ")
    n_stop = stopword_hits(toks, STOPWORDS["en"])
    quality = F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0)) * (
        0.5 + F.least(n_stop.cast("double") / F.col("n_tokens"), F.lit(0.5))
    )
    quality_ok = deduped.withColumn("q", quality).filter(
        F.col("q") >= min_quality
    )

    # ---- stage 3: decontamination vs the eval probe ----
    t = F.split(F.lower("text"), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - 4),
        lambda i: F.array_join(F.slice(t, i, 5), " "),
    )
    is_eval = F.col("doc_id") % eval_mod == 0
    # eval grams from the RAW corpus (the benchmark suite is fixed; it does
    # not shrink because training docs were deduped). Bounded by
    # construction here only because the probe set is; see q_contamination's
    # docstring for the 100 TB contract (fixed benchmark suite -> broadcast;
    # this composition keeps the hint-free join and lets AQE decide).
    eval_grams = (
        corpus.filter(is_eval & (F.col("n_tokens") >= 5))
        .select(F.explode(grams).alias("gram"))
        .distinct()
    )
    candidate = quality_ok.filter(~is_eval)
    # Persisted like the labels relation, and for the same reason (r11):
    # FIVE downstream consumers (clean + the funnel's decontaminated/
    # redacted/split/window rows) sit on top of ``clean``, and without the
    # pin each of them re-runs the 5-gram explode + gram join + distinct —
    # the pipeline's second-most-expensive shuffle after the labels. The
    # materialization is a doc_id list, O(contaminated docs), never
    # corpus-sized.
    contaminated = (
        candidate.filter(F.col("n_tokens") >= 5)
        .select("doc_id", F.explode(grams).alias("gram"))
        .join(eval_grams, "gram")
        .select("doc_id")
        .distinct()
        .persist()
    )
    clean = candidate.join(contaminated, "doc_id", "left_anti")

    # ---- stage 4: PII redaction (map-only) ----
    n_pii = (
        F.size(F.expr(f"regexp_extract_all(text, '{EMAIL_RE}', 0)"))
        + F.size(F.expr(f"regexp_extract_all(text, '{PHONE_RE}', 0)"))
    )
    redacted = clean.select(
        "doc_id",
        "source",
        "n_chars",
        "n_tokens",
        F.regexp_replace(
            F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("redacted"),
        n_pii.alias("n_pii"),
    )

    # ---- stage 5: leakage-safe split on the REUSED cluster roots ----
    keyed = redacted.join(labels, "doc_id", "left").withColumn(
        "root", F.coalesce("root", "doc_id")
    )
    bucket = F.conv(
        F.substring(F.md5(F.col("root").cast("string")), 1, 2), 16, 10
    ).cast("int")
    split = (
        F.when(bucket < 13, "test")
        .when(bucket < 26, "valid")
        .otherwise("train")
    )
    splits = keyed.withColumn("split", split)

    # ---- stage 6: pack the train split into context windows ----
    train = splits.filter(F.col("split") == "train").withColumnRenamed(
        "redacted", "text"
    )
    train_windows = pack_sequences(
        train, "doc_id", "text", "source", budget=pack_budget
    )

    # ---- funnel accounting (tokens-in / tokens-out) ----
    def _stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )

    funnel = (
        _stage("0_raw", corpus)
        .unionByName(_stage("1_dedup", deduped))
        .unionByName(_stage("2_quality", quality_ok))
        .unionByName(_stage("3_decontaminated", clean))
        .unionByName(_stage("4_redacted", redacted))
        .unionByName(
            splits.groupBy("split")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            )
            .select(
                F.concat(F.lit("5_split_"), "split").alias("stage"),
                "n_docs",
                "n_tokens",
            )
        )
        .unionByName(
            train_windows.agg(
                F.lit("6_train_windows").alias("stage"),
                F.count("*").alias("n_docs"),
                F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            )
        )
    )
    return {
        "train_windows": train_windows,
        "splits": splits,
        "funnel": funnel,
        "_labels": labels,  # caller unpersists when done
        "_contaminated": contaminated,  # caller unpersists when done
    }


def _funnel_oracle() -> str:
    """Full-pipeline transcription for DuckDB: the exact six relations of
    ``curate_corpus``, composed from the SAME oracle fragments the standalone
    queries use (minhash transitive closure, q_curate's quality score,
    q_contamination's 5-grams, q_split_groupsafe's root bucket,
    q_pack_sequences' running-total windows) — a hash match proves the
    COMPOSITION end to end, not just each stage in isolation."""
    from projet_data_engineering_spark.operators.datapipe import (
        PACK_BUDGET,
        PACK_SHARD,
    )
    from projet_data_engineering_spark.operators.dedup import _minhash_oracle

    bucket = (
        "CAST(concat('0x', substr(md5(CAST(root AS VARCHAR)), 1, 2)) AS INT)"
    )
    return f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle()}),
    undirected AS (
        SELECT doc1 AS a, doc2 AS b FROM pairs
        UNION ALL
        SELECT doc2 AS a, doc1 AS b FROM pairs
    ),
    reach(a, b) AS (
        SELECT a, b FROM undirected
        UNION
        SELECT r.a, u.b FROM reach r JOIN undirected u ON r.b = u.a
    ),
    clusters AS (
        SELECT a AS node, LEAST(a, MIN(b)) AS root FROM reach GROUP BY a
    ),
    base AS (
        SELECT doc_id, source,
               str_split(lower(text), ' ') AS toks,
               len(str_split(lower(text), ' ')) AS n_tokens
        FROM documents
    ),
    labeled AS (
        SELECT b.*, COALESCE(c.root, b.doc_id) AS root
        FROM base b LEFT JOIN clusters c ON c.node = b.doc_id
    ),
    dedup AS (SELECT * FROM labeled WHERE doc_id = root),
    qual_ok AS (
        SELECT * FROM (
            SELECT *,
                   LEAST(n_tokens / 50.0, 1.0)
                   * (0.5 + LEAST(CAST(len(list_filter(toks,
                         x -> x IN ('the','a','of','and','is'))) AS DOUBLE)
                         / n_tokens, 0.5)) AS q
            FROM dedup
        ) WHERE q >= 0.5
    ),
    g_all AS (
        SELECT doc_id,
               UNNEST(list_transform(
                   generate_series(1, len(toks) - 4),
                   i -> array_to_string(toks[i:i+4], ' '))) AS gram
        FROM base WHERE len(toks) >= 5
    ),
    ev AS (SELECT DISTINCT gram FROM g_all WHERE doc_id % 97 = 0),
    candidate AS (SELECT * FROM qual_ok WHERE doc_id % 97 <> 0),
    contaminated AS (
        SELECT DISTINCT g.doc_id
        FROM g_all g JOIN ev USING (gram)
        WHERE g.doc_id IN (SELECT doc_id FROM candidate)
    ),
    clean AS (
        SELECT * FROM candidate
        WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    splitted AS (
        SELECT *, CASE WHEN {bucket} < 13 THEN 'test'
                       WHEN {bucket} < 26 THEN 'valid'
                       ELSE 'train' END AS split
        FROM clean
    ),
    packc AS (
        SELECT source AS stream, doc_id AS doc,
               doc_id // {PACK_SHARD} AS shard, n_tokens AS ntok,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source, doc_id // {PACK_SHARD}
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM splitted WHERE split = 'train'
    ),
    win AS (
        SELECT stream, shard, cum_before // {PACK_BUDGET} AS seq_id,
               SUM(ntok) AS wtok
        FROM packc GROUP BY stream, shard, cum_before // {PACK_BUDGET}
    )
    SELECT stage, n_docs, n_tokens FROM (
        SELECT '0_raw' AS stage, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens FROM base
        UNION ALL SELECT '1_dedup', COUNT(*),
               CAST(SUM(n_tokens) AS BIGINT) FROM dedup
        UNION ALL SELECT '2_quality', COUNT(*),
               CAST(SUM(n_tokens) AS BIGINT) FROM qual_ok
        UNION ALL SELECT '3_decontaminated', COUNT(*),
               CAST(SUM(n_tokens) AS BIGINT) FROM clean
        UNION ALL SELECT '4_redacted', COUNT(*),
               CAST(SUM(n_tokens) AS BIGINT) FROM clean
        UNION ALL SELECT concat('5_split_', split), COUNT(*),
               CAST(SUM(n_tokens) AS BIGINT) FROM splitted GROUP BY split
        UNION ALL SELECT '6_train_windows', COUNT(*),
               CAST(SUM(wtok) AS BIGINT) FROM win
    )
    """


@query("q_curation_funnel", oracle=_funnel_oracle())
def q_curation_funnel(spark, sf_dir: str) -> DataFrame:
    """The COMPOSED pretraining-data build, driver-checked end to end: run
    ``curate_corpus`` over the documents table and return the per-stage
    docs/tokens funnel. The oracle independently recomputes all six stage
    relations in one SQL program (near-dup transitive closure, quality
    floor, eval-gram decontamination, root-keyed split, running-total
    packing), so the hash match certifies the full composition — including
    that label reuse across stages 1 and 5 changes nothing semantically.
    Measured at sf10 in evidence/bench_curation_r07_sf10.json."""
    from projet_data_engineering_spark.io import load_table, spread

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    out = curate_corpus(docs)
    try:
        result = out["funnel"]
        rows = result.collect()
        return spark.createDataFrame(rows, schema=result.schema)
    finally:
        out["_labels"].unpersist()
        out["_contaminated"].unpersist()
