"""The composed streaming serving stack (VERDICT r7 item 6).

Each of the four state refreshers — near-dup ingest, BM25 index, IVF
lists, PQ codes — plus the drift monitor carries its own replay /
kill-window / scratch-parity proof in isolation. This module runs them as
ONE driver program over the SAME micro-batch stream, in the dependency
order a production ingest uses:

    batch (doc_id, text, embedding)
      1. dedup ingest        -> accepted corpus + signature state
      2. BM25 index refresh  -> postings/vocab/fuzzy/stats over ACCEPTED
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

from projet_data_engineering_spark.io import path_exists
from projet_data_engineering_spark.operators.search import tokenize
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
    idempotent)."""
    if batch.isEmpty():
        return
    spark = batch.sparkSession
    state = f"{base_path}/dedup_state"
    accepted_path = f"{base_path}/accepted"
    dedup_ingest_batch(
        batch.select("doc_id", "text"),
        state,
        accepted_path,
        threshold=threshold,
        n_buckets=n_buckets,
    )
    if fail_after == "dedup":
        raise InjectedCrash("after dedup")
    acc_batch = batch.join(
        spark.read.parquet(accepted_path).select("doc_id"), "doc_id", "semi"
    ).localCheckpoint(eager=True)
    index_refresh_batch(
        acc_batch.select("doc_id", "text"),
        f"{base_path}/bm25",
        n_buckets=n_buckets,
    )
    if fail_after == "bm25":
        raise InjectedCrash("after bm25")
    vecs = acc_batch.select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    ann_refresh_batch(vecs, f"{base_path}/ivf")
    if fail_after == "ann":
        raise InjectedCrash("after ann")
    pq_refresh_batch(vecs, f"{base_path}/pq")
    if fail_after == "pq":
        raise InjectedCrash("after pq")
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
    if fail_after == "drift":
        raise InjectedCrash("after drift")


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
