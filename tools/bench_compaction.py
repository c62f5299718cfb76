"""Measure what small-file fragmentation costs a scan, and what
``io.compact_partitions`` buys back.

Builds the shape days of streaming micro-batch merges leave behind —
``documents`` partitioned into P dirs with F files each (P*F small files) —
then times a full-scan aggregate fragmented vs compacted, plus the one-off
compaction cost itself. The same data, the same query, the only variable is
file count: the delta is pure file-open/footer/task-scheduling overhead,
which is the term that dominates a 100 TB scan when ingest never compacts.

Usage: python tools/bench_compaction.py [sf_dir] [files_per_part] [reps] [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf1.0"
    files_per_part = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    out_json = sys.argv[4] if len(sys.argv) > 4 else None
    from projet_data_engineering_spark.io import compact_partitions, load_table
    from projet_data_engineering_spark.session import get_spark

    spark = get_spark("bench-compaction")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="compact_bench_")
    tbl = f"{path}/documents"
    try:
        (
            docs.withColumn("p", (F.crc32(F.col("doc_id").cast("string")) % 16).cast("int"))
            .repartition(files_per_part)
            .write.partitionBy("p")
            .parquet(tbl)
        )
        n_files = sum(
            1
            for root, _, files in os.walk(tbl)
            for f in files
            if f.endswith(".parquet")
        )

        def scan():
            return (
                spark.read.parquet(tbl)
                .groupBy("lang")
                .agg(F.count("*").alias("n"), F.avg(F.length("text")).alias("len"))
                .collect()
            )

        scan()  # warm
        t_frag = []
        for _ in range(reps):
            t0 = time.time()
            scan()
            t_frag.append(time.time() - t0)

        t0 = time.time()
        done = compact_partitions(spark, tbl, "p")
        t_compact = time.time() - t0
        n_after = sum(
            1
            for root, _, files in os.walk(tbl)
            for f in files
            if f.endswith(".parquet")
        )
        scan()  # warm post-layout
        t_comp = []
        for _ in range(reps):
            t0 = time.time()
            scan()
            t_comp.append(time.time() - t0)

        res = {
            "sf_dir": sf_dir,
            "partitions": len(done),
            "files_before": n_files,
            "files_after": n_after,
            "compact_s": round(t_compact, 2),
            "reps": reps,
            "scan_fragmented_median_s": round(statistics.median(t_frag), 3),
            "scan_compacted_median_s": round(statistics.median(t_comp), 3),
            "speedup_median": round(
                statistics.median(t_frag) / statistics.median(t_comp), 2
            ),
        }
        print(
            f"sf={sf_dir} files {n_files}->{n_after} (compact {res['compact_s']}s) | "
            f"scan fragmented {res['scan_fragmented_median_s']}s vs compacted "
            f"{res['scan_compacted_median_s']}s -> {res['speedup_median']}x"
        )
        if out_json:
            with open(out_json, "w") as f:
                json.dump(res, f, indent=1)
            print(f"wrote {out_json}")
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
