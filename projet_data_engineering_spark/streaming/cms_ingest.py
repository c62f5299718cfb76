"""Streaming sketch ingest: micro-batch partials that serve the EXACT
whole-corpus sketches (ST2 × the deterministic-sketch tier).

Both sketches here are MERGEABLE with exact laws, which makes streaming
maintenance trivially exactly-once-able: each micro-batch contributes its
own bounded partial, keyed by batch_id, and serving folds the merge law
over the batch slices. An at-least-once redelivery REPLACES its batch_id
slice with identical rows (the partial is a pure function of the batch),
so replays are no-ops and the served sketch after any prefix of batches
equals the batch-built sketch of exactly those rows — which is why each
driver query's oracle is the SAME SQL as its batch twin's: stream ≡ batch
is the contract, not an approximation.

- Count-Min (``q_stream_cms``): counting is linear — partial = the batch's
  d×w counter matrix, serve = cell-wise sum (``textanalysis.cms_merge``
  folded over batches). State |batches|·d·w rows.
- KMV (``q_stream_kmv``): bottom-k of a union is the bottom-k of the union
  of bottom-ks — partial = the batch's per-group bottom-k hash set, serve
  = rank over the unioned distinct hashes (``sampling.kmv_merge`` folded).
  State ≤ |batches|·k rows per group.

At 100 TB the same layouts hold — partials are O(state) per batch
regardless of batch size, and compaction (folding old batch slices into
one) is the same merge law.

Reference anchor: the continuous-refresh loop the reference runs by
re-scraping into MongoDB on a schedule (scraper/main.py); these are the
frequency/cardinality-state versions with exact replay semantics.
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
from projet_data_engineering_spark.streaming.fixtures import stamp_batch_mtime


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
            stamp_batch_mtime(f"{src}/b{k}", k)
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




# ---------------------------------------------------------------------------
# Streaming KMV ingest (same pattern, union law instead of sum law)
# ---------------------------------------------------------------------------


def kmv_ingest_batch(
    batch: DataFrame, state_path: str, batch_id: int, grp: str, key: str
) -> None:
    """One micro-batch: the batch's per-group bottom-k hash set (exploded
    to (batch_id, grp, u) rows — ≤ k per group) replaces its own batch_id
    slice of the state, idempotently."""
    from projet_data_engineering_spark.operators.sampling import kmv_sketch

    spark = batch.sparkSession
    part = (
        kmv_sketch(batch, grp, key)
        .select("grp", F.explode("ks").alias("u"))
        .select(F.lit(int(batch_id)).alias("batch_id"), "grp", "u")
    )
    if path_exists(spark, state_path):
        old = spark.read.parquet(state_path).filter(
            F.col("batch_id") != int(batch_id)
        )
        part = old.unionByName(part)
    atomic_overwrite(part, state_path)


def serve_kmv_sketch(spark: SparkSession, state_path: str) -> DataFrame:
    """(grp, n_seen, ks): the served sketch — ``kmv_merge`` folded over
    every batch slice (rank over the unioned distinct hashes)."""
    from projet_data_engineering_spark.operators.sampling import (
        kmv_from_hashes,
    )

    return kmv_from_hashes(
        spark.read.parquet(state_path).select("grp", "u")
    )


def run_stream_kmv(
    stream_df: DataFrame,
    state_path: str,
    checkpoint: str,
    grp: str,
    key: str,
) -> None:
    """Wire ``kmv_ingest_batch`` into a Structured Streaming sink
    (foreachBatch, availableNow)."""

    def step(batch: DataFrame, batch_id: int) -> None:
        kmv_ingest_batch(batch, state_path, batch_id, grp, key)

    (
        stream_df.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def _kmv_oracle() -> str:
    from projet_data_engineering_spark.operators.sampling import _KMV_ORACLE

    return _KMV_ORACLE


@query("q_stream_kmv", oracle=_kmv_oracle())
def q_stream_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming cardinality maintenance end-to-end: orders arrive as three
    micro-batch files (o_orderkey % 3, mtime-ordered + maxFilesPerTrigger=1)
    through ``run_stream_kmv``, and the served sketch answers the
    distinct-customers estimate. The oracle is ``q_kmv_distinct``'s SQL
    UNCHANGED — the union law says the streamed bottom-k state must equal
    the batch sketch hash-for-hash, so the gate proves the streaming path
    (per-batch partials, replay-safe slice replacement, serve-time rank),
    not a relaxed variant."""
    import shutil
    import tempfile

    from projet_data_engineering_spark.operators.sampling import kmv_estimate

    o = spread(load_table(spark, sf_dir, "orders"), "o_orderkey").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    root = tempfile.mkdtemp(prefix="stream_kmv_")
    try:
        src = f"{root}/src"
        for k in range(3):
            o.filter(F.col("o_orderkey") % 3 == k).coalesce(1).write.parquet(
                f"{src}/b{k}"
            )
            stamp_batch_mtime(f"{src}/b{k}", k)
        stream = (
            spark.readStream.schema(o.schema)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "*.parquet")
            .parquet(f"{src}/*")
        )
        run_stream_kmv(
            stream,
            f"{root}/state",
            f"{root}/chk",
            "o_orderpriority",
            "o_custkey",
        )
        sk = serve_kmv_sketch(spark, f"{root}/state")
        out = kmv_estimate(sk).select(
            F.col("grp").alias("o_orderpriority"), "distinct_est"
        )
        rows = out.collect()
        return spark.createDataFrame(rows, schema=out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


__all__ = [
    "cms_ingest_batch",
    "serve_cms_counters",
    "run_stream_cms",
    "q_stream_cms",
    "kmv_ingest_batch",
    "serve_kmv_sketch",
    "run_stream_kmv",
    "q_stream_kmv",
]
