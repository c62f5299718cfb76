"""Streaming Count-Min ingest: micro-batch token partials that serve the
EXACT whole-corpus sketch (ST2 × ``q_cms_counts``).

Counting is linear, so the CMS merge law (``textanalysis.cms_merge``) makes
a streaming frequency sketch trivially exactly-once-able: each micro-batch
contributes its own d×w partial counter matrix, keyed by batch_id, and the
served matrix is the cell-wise sum over batches. An at-least-once
redelivery REPLACES its batch_id slice with identical rows (the partial is
a pure function of the batch), so replays are no-ops and the served sketch
after any prefix of batches equals the batch-built sketch of exactly those
documents — which is why the driver query's oracle is the SAME SQL as the
batch query's: stream ≡ batch is the contract, not an approximation.

State: |batches| × d·w rows (here 3 × 64), one atomic_overwrite per batch.
At 100 TB the same layout holds — partials are O(d·w) per batch regardless
of batch size, and compaction (summing old batch slices into one) is the
same cell-wise sum.

Reference anchor: the continuous-refresh loop the reference runs by
re-scraping into MongoDB on a schedule (scraper/main.py); this is the
frequency-state version with exact replay semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_data_engineering_spark.io import (
    atomic_overwrite,
    load_table,
    path_exists,
    spread,
)
from projet_data_engineering_spark.operators.textanalysis import (
    _cms_oracle,
    _tokens,
    cms_estimate,
    cms_sketch,
)
from projet_data_engineering_spark.registry import query


def cms_ingest_batch(batch: DataFrame, state_path: str, batch_id: int) -> None:
    """One micro-batch (the foreachBatch body, callable directly so tests
    can drive replay): the batch's d×w partial counter matrix replaces its
    own batch_id slice of the state, idempotently."""
    spark = batch.sparkSession
    part = cms_sketch(_tokens(batch)).select(
        F.lit(int(batch_id)).alias("batch_id"), "i", "bucket", "cnt"
    )
    if path_exists(spark, state_path):
        old = spark.read.parquet(state_path).filter(
            F.col("batch_id") != int(batch_id)
        )
        part = old.unionByName(part)
    atomic_overwrite(part, state_path)


def serve_cms_counters(spark: SparkSession, state_path: str) -> DataFrame:
    """(i, bucket, cnt): the served matrix — cell-wise sum over the batch
    partials, i.e. ``cms_merge`` folded over every ingested batch."""
    return (
        spark.read.parquet(state_path)
        .groupBy("i", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def run_stream_cms(
    stream_df: DataFrame, state_path: str, checkpoint: str
) -> None:
    """Wire ``cms_ingest_batch`` into a Structured Streaming sink
    (foreachBatch, availableNow): at-least-once document-file arrivals
    become an exactly-once frequency sketch."""

    def step(batch: DataFrame, batch_id: int) -> None:
        cms_ingest_batch(batch, state_path, batch_id)

    (
        stream_df.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


@query("q_stream_cms", oracle=_cms_oracle())
def q_stream_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL streaming sketch end-to-end: documents arrive as three
    micro-batch files (doc_id % 3, mtime-ordered + maxFilesPerTrigger=1),
    flow through ``run_stream_cms``, and the served counters answer the
    full-vocabulary probe. The oracle is ``q_cms_counts``'s oracle
    UNCHANGED — the merge law says the streamed state must equal the
    batch sketch cell-for-cell, so the hash match proves the streaming
    path end-to-end (partials, replay-safe slice replacement, serve-time
    fold), not a relaxed variant of it."""
    import shutil
    import tempfile
    import time

    d = spread(load_table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "text"
    )
    root = tempfile.mkdtemp(prefix="stream_cms_")
    try:
        src = f"{root}/src"
        for k in range(3):
            d.filter(F.col("doc_id") % 3 == k).coalesce(1).write.parquet(
                f"{src}/b{k}"
            )
            time.sleep(0.05)  # distinct mtimes => deterministic batch order
        stream = (
            spark.readStream.schema(d.schema)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "*.parquet")
            .parquet(f"{src}/*")
        )
        run_stream_cms(stream, f"{root}/state", f"{root}/chk")
        counters = serve_cms_counters(spark, f"{root}/state")
        vocab = _tokens(d).distinct()
        out = cms_estimate(vocab, counters)
        rows = out.collect()
        return spark.createDataFrame(rows, schema=out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


__all__ = [
    "cms_ingest_batch",
    "serve_cms_counters",
    "run_stream_cms",
    "q_stream_cms",
]
