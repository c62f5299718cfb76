#!/usr/bin/env python
"""Core-scaling evidence at a REAL SF (r12, VERDICT r11 item 5): the sf0.1
bench is fixed-cost-bound (every 8-vs-32-core ratio ~1), so parallelism
claims need an SF where compute dominates. Runs a heavy-query subset at
.localdata/sf1.0 under the CURRENT $SPARK_GRAFT_CPUS (pass 8 or 32 via the
env, exactly like the driver does) with the bench's own protocol: warm run,
then min-of-N noop-sink timings.

Usage: SPARK_GRAFT_CPUS=8 python tools/bench_scaling_sf1.py [out.json] [min_of]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from projet_data_engineering_spark.session import get_spark

QUERIES = [
    "q_curate",          # composed dedup/quality/token pipeline
    "q_semdedup",        # trained-cluster semantic dedup (Arrow kmeans)
    "q_dedup_minhash",   # MinHash-LSH candidate pairs (md5 CPU)
    "q_bm25_topk",       # full-corpus BM25 scoring
    "q_boilerplate",     # within-source template shingles
    "q_token_count",     # tokenize + explode + count (pure scan CPU)
]


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    min_of = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", ".localdata/sf1.0")
    spark = get_spark("bench_scaling_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = spark.sparkContext.defaultParallelism
    qs = entrymod.queries()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()
    timings = {}
    for name in QUERIES:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(min_of):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(name, timings[name], flush=True)
        spark.catalog.clearCache()
    out = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "min_of": min_of,
        "queries": timings,
        "total": round(sum(timings.values()), 3),
    }
    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
