"""Quantify the versioned writer-lock's cost at stream rates (VERDICT r10
item 2).

r10 serialized every versioned-table mutation behind ``acquire_merge_lock``
(io.py). With in-stream auto-compaction on, one micro-batch takes the lock
THREE times (recover probe, sink commit, compact policy). This bench answers
"is that >5% of batch wall?" two ways:

1. micro: N bare acquire+release cycles on a scratch table -> ms/cycle
   (pure lock-protocol cost: one Hadoop create-if-absent + one read+delete,
   all py4j roundtrips on local FS — an object store adds its own RTTs);
2. macro: an availableNow versioned stream ingest of B batches x R rows,
   auto-compaction on, run twice — stock locking vs a no-op lock
   (monkeypatched) — so the delta IS the end-to-end lock overhead per
   batch, including every acquisition the protocol performs.

Prints one JSON line; evidence lands in evidence/bench_lock_r11.json.

Usage: python tools/bench_lock.py [n_rows_per_batch] [n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from contextlib import contextmanager

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _spark() -> SparkSession:
    return (
        SparkSession.builder.master(
            os.environ.get("CHECK_MASTER", "local[*]")
        )
        .appName("bench-lock")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .getOrCreate()
    )


def micro_lock_cycles(spark: SparkSession, n: int = 200) -> dict:
    from projet_data_engineering_spark.io import (
        acquire_merge_lock,
        release_merge_lock,
    )

    root = tempfile.mkdtemp(prefix="bench_lock_micro_")
    try:
        # warm the py4j FileSystem path outside the timed loop
        t = acquire_merge_lock(spark, root)
        release_merge_lock(spark, root, t)
        t0 = time.perf_counter()
        for _ in range(n):
            tok = acquire_merge_lock(spark, root)
            release_merge_lock(spark, root, tok)
        wall = time.perf_counter() - t0
        return {"cycles": n, "total_s": round(wall, 3),
                "ms_per_cycle": round(1000 * wall / n, 3)}
    finally:
        shutil.rmtree(root, ignore_errors=True)


@contextmanager
def _noop_lock():
    """Monkeypatch the lock protocol to no-ops — the counterfactual arm.
    Patches the io module's symbols; versioned.py's ``_writer_lock`` calls
    through these module attributes, so the patch covers every acquisition."""
    import projet_data_engineering_spark.io as io
    import projet_data_engineering_spark.operators.versioned as versioned

    real_acq, real_rel = io.acquire_merge_lock, io.release_merge_lock
    io.acquire_merge_lock = lambda spark, path, lease_sec=900.0: "noop"
    io.release_merge_lock = lambda spark, path, token: None
    versioned.acquire_merge_lock = io.acquire_merge_lock
    versioned.release_merge_lock = io.release_merge_lock
    try:
        yield
    finally:
        io.acquire_merge_lock, io.release_merge_lock = real_acq, real_rel
        versioned.acquire_merge_lock = real_acq
        versioned.release_merge_lock = real_rel


def _count_lock_acquires():
    """Wrap the real lock to count acquisitions (stock arm)."""
    import projet_data_engineering_spark.io as io
    import projet_data_engineering_spark.operators.versioned as versioned

    counter = {"n": 0, "lock_s": 0.0}
    real_acq, real_rel = io.acquire_merge_lock, io.release_merge_lock

    def acq(spark, path, lease_sec=900.0):
        t0 = time.perf_counter()
        tok = real_acq(spark, path, lease_sec)
        counter["lock_s"] += time.perf_counter() - t0
        counter["n"] += 1
        return tok

    def rel(spark, path, token):
        t0 = time.perf_counter()
        real_rel(spark, path, token)
        counter["lock_s"] += time.perf_counter() - t0

    def install():
        io.acquire_merge_lock, io.release_merge_lock = acq, rel
        versioned.acquire_merge_lock, versioned.release_merge_lock = acq, rel

    def uninstall():
        io.acquire_merge_lock, io.release_merge_lock = real_acq, real_rel
        versioned.acquire_merge_lock = real_acq
        versioned.release_merge_lock = real_rel

    return counter, install, uninstall


def _run_stream(spark: SparkSession, rows: int, batches: int) -> float:
    """One availableNow versioned ingest: `batches` files x `rows` rows,
    auto-compaction on (threshold low enough to fire mid-run). Returns
    wall seconds of the awaitTermination span."""
    from projet_data_engineering_spark.streaming.fixtures import (
        stamp_batch_mtime,
    )
    from projet_data_engineering_spark.streaming.versioned_sink import (
        run_stream_versioned,
    )

    root = tempfile.mkdtemp(prefix="bench_lock_macro_")
    try:
        src = f"{root}/src"
        base = spark.range(rows * batches).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("payload-"), F.col("id")).alias("text"),
        )
        for k in range(batches):
            base.filter(F.col("doc_id") % batches == k).coalesce(1) \
                .write.parquet(f"{src}/b{k}")
            stamp_batch_mtime(f"{src}/b{k}", k)
        stream = (
            spark.readStream.schema(base.schema)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "*.parquet")
            .parquet(f"{src}/*")
        )
        t0 = time.perf_counter()
        run_stream_versioned(
            stream, f"{root}/table", f"{root}/chk", "doc_id",
            auto_compact_max_versions=4, protect_last=2,
        )
        return time.perf_counter() - t0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    spark = _spark()

    micro = micro_lock_cycles(spark)

    # macro, stock locking (counted) — warm-up run first so JVM/codegen
    # warm-up doesn't land in whichever arm runs first
    _run_stream(spark, 1000, 3)
    counter, install, uninstall = _count_lock_acquires()
    install()
    try:
        stock_s = _run_stream(spark, rows, batches)
    finally:
        uninstall()

    with _noop_lock():
        noop_s = _run_stream(spark, rows, batches)

    out = {
        "metric": "versioned_writer_lock_overhead",
        "rows_per_batch": rows,
        "batches": batches,
        "micro": micro,
        "macro_stock_s": round(stock_s, 3),
        "macro_nolock_s": round(noop_s, 3),
        "lock_acquisitions": counter["n"],
        "acquisitions_per_batch": round(counter["n"] / batches, 2),
        "lock_protocol_s": round(counter["lock_s"], 3),
        "overhead_s": round(stock_s - noop_s, 3),
        "overhead_pct_of_wall": round(100 * (stock_s - noop_s) / stock_s, 2),
        "lock_pct_of_wall": round(100 * counter["lock_s"] / stock_s, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
