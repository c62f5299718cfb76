"""Scale timings for the r8 sketch/MVCC/PQ-arrow families (VERDICT r8
item 7): the four-point sf0.1/1/5/10 protocol that caught three real
defects in r7 had not yet run on the round-8 additions.

Same protocol as bench_newops_r07b.py: min-of-2 timed runs, one warm-up
execution per SF's tables, full-evaluation force (count+hash aggregate so
Catalyst can't prune the measured work). The streaming/versioned queries
build their own fixture tables from the SF's documents, so their cost
includes the commit protocol by design — that IS the operator.

Usage: python tools/bench_newops_r09.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from projet_data_engineering_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

QUERIES = [
    "q_kmv_distinct",
    "q_cms_counts",
    "q_cms_join_size",
    "q_percentile_sampled",
    "q_pq_encode_arrow",
    "q_time_travel",
    "q_stream_versioned",
]
SFS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1.0", ".localdata/sf1.0"),
    ("sf5.0", ".localdata/sf5.0"),
    ("sf10.0", ".localdata/sf10.0"),
]


def force(df):
    import pyspark.sql.functions as F

    return df.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("h"),
    ).collect()[0]["n"]


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "evidence/bench_newops_r09.json"
    spark = get_spark("bench_newops_r09")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    from projet_data_engineering_spark.io import load_table

    force(qs["q_kmv_distinct"](spark, SFS[0][1]))  # codegen warm-up
    for _, path in SFS:
        for t in ("documents", "embeddings", "orders", "lineitem", "events"):
            load_table(spark, path, t).count()
    out: dict[str, dict[str, dict[str, float]]] = {}
    for name in QUERIES:
        out[name] = {}
        for sf, path in SFS:
            best, n = None, 0
            for _ in range(2):
                t0 = time.time()
                n = force(qs[name](spark, path))
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                spark.catalog.clearCache()
            out[name][sf] = {"sec": round(best, 2), "rows": n}
            print(f"{name} @ {sf}: {round(best, 2)}s ({n} rows)", flush=True)
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
