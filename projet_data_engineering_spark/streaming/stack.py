"""The composed streaming serving stack (VERDICT r7 item 6).

Each of the four state refreshers — near-dup ingest, BM25 index, IVF
lists, PQ codes — plus the drift monitor carries its own replay /
kill-window / scratch-parity proof in isolation. This module runs them as
ONE driver program over the SAME micro-batch stream, in the dependency
order a production ingest uses:

    batch (doc_id, text, embedding)
      1. dedup ingest        -> accepted corpus + signature state
      2. BM25 index refresh  -> postings/vocab/stats over ACCEPTED
                                docs only (duplicates never enter search)
      3. IVF refresh         -> inverted lists over accepted embeddings
      4. PQ refresh          -> compressed codes over accepted embeddings
      5. drift monitor       -> PSI of accepted doc lengths vs the frozen
                                first-batch baseline (the data-quality
                                alarm wire at the end of the pipe)

Composability rests on the per-stage contracts already proven one by one:
every stage is a keyed idempotent merge (or derived state recomputed from
one), so a crash at ANY stage boundary replays the whole batch and
converges to the uninterrupted run's state — ``fail_after`` injects
exactly those crashes for tests/test_streaming_stack.py, which pins the
converged composed state byte-for-byte against a never-crashed control
run, plus full-redelivery idempotence.

At 100 TB nothing here changes: each stage's shuffle inventory is the one
its own module documents (micro-batch-sized inputs, bucket-pruned merges,
bounded broadcasts), and the stack adds NO new corpus-wide operation —
stage handoff is the batch-sized accepted frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from projet_data_engineering_spark.io import path_exists, read_log_table
from projet_data_engineering_spark.operators.search import tokenize
from projet_data_engineering_spark.registry import query
from projet_data_engineering_spark.streaming.dedup_ingest import (
    dedup_ingest_batch,
)
from projet_data_engineering_spark.streaming.ann_refresh import (
    ann_refresh_batch,
)
from projet_data_engineering_spark.streaming.drift import (
    build_drift_baseline,
    drift_monitor_batch,
)
from projet_data_engineering_spark.streaming.pq_refresh import pq_refresh_batch
from projet_data_engineering_spark.streaming.windows import index_refresh_batch

STAGES = ("dedup", "bm25", "ann", "pq", "drift")


class InjectedCrash(RuntimeError):
    """Raised by ``stack_ingest_batch`` when ``fail_after`` fires — the
    test stand-in for an executor/driver loss at a stage boundary."""


def stack_ingest_batch(
    batch: DataFrame,
    base_path: str,
    batch_id: int,
    n_buckets: int = 16,
    threshold: float = 0.2,
    fail_after: str | None = None,
    stage_seconds: dict | None = None,
) -> None:
    """One micro-batch through the whole serving stack (the foreachBatch
    body; callable directly so tests can drive kill-window scenarios).

    ``fail_after`` names a stage from ``STAGES``; the batch then crashes
    AFTER that stage durably completed — the exact boundary a real failure
    exposes, because every stage's own writes are internally atomic (their
    modules' kill-window tests cover intra-stage crashes).

    Stage inputs derive from one fixed accepted set: the dedup stage's
    accepted store is re-read and semi-joined against the batch, so a
    REPLAYED batch feeds downstream stages the same accepted rows the
    original attempt did (acceptance is keyed state, not an in-flight
    value — the property that makes the composition, not just the stages,
    idempotent).

    ``stage_seconds``: optional dict the call fills with per-stage wall
    seconds ({stage: sec}) — the instrumentation hook tools/bench_stack.py
    uses for the sf1/sf10 per-stage throughput evidence; None (the
    production default) adds no timing work."""
    import time as _time

    if batch.isEmpty():
        return
    t0 = _time.perf_counter()

    def _mark(stage: str) -> None:
        nonlocal t0
        if stage_seconds is not None:
            now = _time.perf_counter()
            stage_seconds[stage] = now - t0
            t0 = now

    spark = batch.sparkSession
    state = f"{base_path}/dedup_state"
    accepted_path = f"{base_path}/accepted"
    dedup_sub: dict | None = {} if stage_seconds is not None else None
    dedup_ingest_batch(
        batch.select("doc_id", "text"),
        state,
        accepted_path,
        threshold=threshold,
        n_buckets=n_buckets,
        stage_seconds=dedup_sub,
    )
    _mark("dedup")
    if dedup_sub:
        # sub-stage split of the dominant stage (r11): rendered as
        # dedup.<sub> rows in the bench evidence
        for s, v in dedup_sub.items():
            stage_seconds[f"dedup.{s}"] = v
    if fail_after == "dedup":
        raise InjectedCrash("after dedup")
    acc_batch = batch.join(
        read_log_table(spark, accepted_path).select("doc_id"),
        "doc_id",
        "semi",
    ).localCheckpoint(eager=True)
    # own timing bucket: this semi-join + eager checkpoint is a real job
    # (re-reads the growing accepted store) that previously landed in the
    # bm25 stage's number and skewed the per-stage evidence (review r10)
    _mark("accept")
    vecs = acc_batch.select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )

    def s_bm25() -> None:
        index_refresh_batch(
            acc_batch.select("doc_id", "text"),
            f"{base_path}/bm25",
            n_buckets=n_buckets,
        )

    def s_ann() -> None:
        ann_refresh_batch(vecs, f"{base_path}/ivf")

    def s_pq() -> None:
        pq_refresh_batch(vecs, f"{base_path}/pq")

    def s_drift() -> None:
        quality = acc_batch.select(
            F.lit("dl").alias("event_type"),
            F.size(tokenize(F.col("text"))).cast("double").alias("value"),
        )
        baseline = f"{base_path}/drift_baseline"
        if not path_exists(spark, f"{baseline}/bins"):
            # freeze the first accepted batch as the trusted window — the
            # bootstrap recipe drift.py documents
            build_drift_baseline(quality, baseline)
        drift_monitor_batch(
            quality, baseline, f"{base_path}/drift_report", batch_id
        )

    # The four post-dedup refreshers consume ONLY the checkpointed
    # accepted batch and mutate DISTINCT state roots with keyed idempotent
    # merges, so thread-level stage concurrency WOULD be replay-safe.
    # Measured on local[32] it is a 0.62x LOSS
    # (evidence/bench_stack_sf1_conc_r10.json — concurrent job DAGs
    # thrash one shared JVM's task slots), so stages run sequentially;
    # the order-free property is what a multi-executor deployment would
    # exploit with scheduler pools if its own measurement disagrees.
    for name, fn in (("bm25", s_bm25), ("ann", s_ann), ("pq", s_pq),
                     ("drift", s_drift)):
        fn()
        _mark(name)
        if fail_after == name:
            raise InjectedCrash(f"after {name}")


def run_stream_stack(
    doc_stream: DataFrame,
    base_path: str,
    checkpoint: str,
    n_buckets: int = 16,
    threshold: float = 0.2,
) -> None:
    """Wire the composed stack into one Structured Streaming sink
    (foreachBatch, availableNow): at-least-once document+embedding arrivals
    become an exactly-once deduplicated corpus with its search, ANN and
    compression indexes and a live drift report — the full serving state a
    training-data pipeline maintains."""

    def step(batch: DataFrame, batch_id: int) -> None:
        stack_ingest_batch(
            batch,
            base_path,
            batch_id,
            n_buckets=n_buckets,
            threshold=threshold,
        )

    (
        doc_stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def _stream_stack_oracle() -> str:
    from projet_data_engineering_spark.operators.datapipe import PSI_BINS
    from projet_data_engineering_spark.streaming.dedup_ingest import (
        stream_accept_ctes,
    )

    b, s = PSI_BINS, PSI_BINS * 0.5
    clamp = (
        f"CAST(LEAST({b - 1}, GREATEST(0, "
        f"FLOOR((value - vmin) / (vmax - vmin) * {b}))) AS INT)"
    )
    # The stack streams documents INNER-JOINED with embeddings (the ANN/PQ
    # stages need vectors), and the two tables only cover the same ids at
    # some SFs (sf0.1: 2000 embeddings vs 6000 docs) — so the whole
    # acceptance/index/drift transcription must run over that same joined
    # source, not the full documents table (docs/ORACLE_NOTES.md §5a).
    accept = stream_accept_ctes(src="src_docs")
    return f"""
    WITH src_docs AS (
        SELECT d.* FROM documents d
        JOIN embeddings e ON e.vec_id = d.doc_id
    ),
    {accept},
    adl AS (
        SELECT d.doc_id, CAST(d.doc_id % 3 AS INT) AS src_batch,
               list_filter(str_split_regex(lower(d.text), '[^a-z0-9]+'),
                           x -> x <> '') AS tokens
        FROM src_docs d JOIN accepted a ON d.doc_id = a.doc_id
    ),
    adl2 AS (SELECT doc_id, src_batch, len(tokens) AS dl, tokens FROM adl),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avg_dl FROM adl2),
    tf AS (
        SELECT d.doc_id, d.dl, u.term, COUNT(*) AS tf
        FROM adl2 d, UNNEST(d.tokens) AS u(term)
        WHERE u.term IN ('spark', 'join', 'stream')
        GROUP BY d.doc_id, d.dl, u.term
    ),
    dfc AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    bm25 AS (
        SELECT t.doc_id AS k,
               ROUND(SUM(ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
                         * (t.tf * 2.2)
                         / (t.tf + 1.2 * (1 - 0.75 + 0.75 * t.dl / s.avg_dl))),
                     4) AS v
        FROM tf t JOIN dfc f ON t.term = f.term CROSS JOIN stats s
        GROUP BY t.doc_id
    ),
    b0 AS (
        SELECT CAST(dl AS DOUBLE) AS value FROM adl2 WHERE src_batch = 0
    ),
    rng AS (SELECT MIN(value) AS vmin, MAX(value) AS vmax FROM b0),
    bcnt AS (
        SELECT bin, COUNT(*) AS c_base
        FROM (SELECT {clamp} AS bin FROM b0, rng) GROUP BY bin
    ),
    ccnt AS (
        SELECT batch_id, bin, COUNT(*) AS c_batch
        FROM (SELECT src_batch AS batch_id, {clamp} AS bin
              FROM (SELECT src_batch, CAST(dl AS DOUBLE) AS value FROM adl2),
                   rng)
        GROUP BY batch_id, bin
    ),
    grid AS (
        SELECT k.batch_id, g.bin
        FROM (SELECT UNNEST(generate_series(0, {b - 1})) AS bin) g,
             (SELECT UNNEST(generate_series(0, 2)) AS batch_id) k
    ),
    full_g AS (
        SELECT g.batch_id, g.bin,
               COALESCE(bc.c_base, 0) AS c_base,
               COALESCE(cc.c_batch, 0) AS c_batch
        FROM grid g
        LEFT JOIN bcnt bc ON g.bin = bc.bin
        LEFT JOIN ccnt cc ON g.batch_id = cc.batch_id AND g.bin = cc.bin
    ),
    tot AS (
        SELECT batch_id, SUM(c_base) AS tot_base, SUM(c_batch) AS tot_batch
        FROM full_g GROUP BY batch_id
    ),
    drift AS (
        SELECT f.batch_id AS k,
               ROUND(SUM(((c_base + 0.5) / (tot_base + {s})
                          - (c_batch + 0.5) / (tot_batch + {s}))
                         * LN(((c_base + 0.5) / (tot_base + {s}))
                              / ((c_batch + 0.5) / (tot_batch + {s})))),
                     5) AS v
        FROM full_g f JOIN tot USING (batch_id)
        GROUP BY f.batch_id
    )
    SELECT 'accepted' AS part, doc_id AS k, CAST(doc_id % 3 AS DOUBLE) AS v
    FROM accepted
    UNION ALL SELECT 'bm25' AS part, k, CAST(v AS DOUBLE) AS v FROM bm25
    UNION ALL SELECT 'drift' AS part, k, CAST(v AS DOUBLE) AS v FROM drift
    """


@query("q_stream_stack", oracle=_stream_stack_oracle())
def q_stream_stack(spark, sf_dir: str) -> DataFrame:
    """The COMPOSED serving stack end-to-end as one driver row (VERDICT r8
    item 5): documents+embeddings arrive as three micro-batch files
    (doc_id % 3, explicit-mtime-ordered + maxFilesPerTrigger=1) through
    ``run_stream_stack`` — dedup ingest, BM25 index refresh, IVF and PQ
    refresh, drift monitor — and the FINAL SERVED STATE is returned in
    three labeled sections: the accepted corpus, the BM25 scores served
    from the stream-maintained index for 'spark join stream', and the
    per-batch PSI drift report. The oracle recomputes all three from
    scratch in SQL (greedy 3-batch acceptance via stream_accept_ctes, the
    BM25 formula over ONLY the accepted docs — proving duplicates never
    entered the index and the stream-merged stats equal a from-scratch
    build — and the frozen-first-accepted-batch PSI grid), so one hash
    pins the stage composition, not just each stage alone. The IVF/PQ
    stages run in the same pipe (their own served-state parity is pinned
    by q_stream_ann_refresh / q_stream_pq_refresh and the stack pytest's
    byte-parity against a never-crashed control run)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from projet_data_engineering_spark.io import load_table, spread
    from projet_data_engineering_spark.operators.search import bm25_serve
    from projet_data_engineering_spark.streaming.fixtures import (
        stamp_batch_mtime,
    )

    d = spread(load_table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "text"
    )
    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    src_df = d.join(e, "doc_id")
    root = tempfile.mkdtemp(prefix="stream_stack_")
    try:
        src = f"{root}/src"
        for k in range(3):
            src_df.filter(F.col("doc_id") % 3 == k).coalesce(1).write.parquet(
                f"{src}/b{k}"
            )
            stamp_batch_mtime(f"{src}/b{k}", k)
        stream = (
            spark.readStream.schema(src_df.schema)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "*.parquet")
            .parquet(f"{src}/*")
        )
        base = f"{root}/stack"
        run_stream_stack(stream, base, f"{root}/chk", n_buckets=16)
        acc = read_log_table(spark, f"{base}/accepted").select(
            F.lit("accepted").alias("part"),
            F.col("doc_id").alias("k"),
            (F.col("doc_id") % 3).cast("double").alias("v"),
        )
        bm = bm25_serve(
            spark, f"{base}/bm25", ["spark", "join", "stream"]
        ).select(
            F.lit("bm25").alias("part"),
            F.col("doc_id").alias("k"),
            F.col("score").cast("double").alias("v"),
        )
        dr = spark.read.parquet(f"{base}/drift_report").select(
            F.lit("drift").alias("part"),
            F.col("batch_id").cast("bigint").alias("k"),
            F.col("psi").cast("double").alias("v"),
        )
        out = acc.unionByName(bm).unionByName(dr)
        rows = out.collect()
        return spark.createDataFrame(rows, schema=out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)
