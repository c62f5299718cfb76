"""Scale timings for the r7-continuation operator wave (no oracle — wall).

Same protocol as bench_newops_r07.py (min-of-2 timed runs, page cache
pre-touched per SF, one warm-up execution to absorb one-time codegen):
runs the PQ family, semantic dedup, bloom-pruned join, and DSIR weights
at sf1/sf5/sf10 and prints per-(query, sf) seconds + rows as JSON.
Usage: python tools/bench_newops_r07b.py [out.json]
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
    "q_pq_encode", "q_ann_pq", "q_ann_pq_rerank", "q_pq_recall",
    "q_bloom_join", "q_dsir_weights", "q_dsir_select",
]
# SemDeDup is benched through its production knob, not the oracled query:
# the oracle pins k=8 (DuckDB must train the same quantizer), but a fixed k
# makes the within-cluster pair stage O(n²/k) — the honest at-scale shape
# scales k with the corpus (k ≈ n/2500 keeps blocks constant → linear pair
# work), so that is the configuration the scale table measures.
SEMDEDUP_BLOCK = 2500
SFS = [("sf1.0", ".localdata/sf1.0"), ("sf5.0", ".localdata/sf5.0"),
       ("sf10.0", ".localdata/sf10.0")]


def force(df):
    """Force FULL evaluation: .count() lets Catalyst prune map-only output
    columns and eliminate distinct-key left joins outright (q_pq_encode's
    codes and q_semdedup's pair stage both vanished under count — the
    first cut under-measured them)."""
    import pyspark.sql.functions as F

    return df.agg(
        F.count("*").alias("n"),
        # bit_xor, not sum: ANSI mode throws on long overflow
        F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("h"),
    ).collect()[0]["n"]


def main() -> None:
    spark = get_spark("bench_newops_b")
    qs = entry.queries()
    force(qs["q_pq_encode"](spark, ".localdata/sf1.0"))  # codegen warm-up
    from projet_data_engineering_spark.io import load_table
    for _, path in SFS:
        for t in ("documents", "embeddings", "lineitem", "part"):
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
            out[name][sf] = {"sec": round(best, 2), "rows": n}
            print(f"{name} @ {sf}: {round(best, 2)}s ({n} rows)", flush=True)
    from projet_data_engineering_spark.io import load_table as _lt
    from projet_data_engineering_spark.operators.dedup import semdedup_flags
    out["semdedup_scaled_k"] = {}
    for sf, path in SFS:
        emb = _lt(spark, path, "embeddings")
        k = max(8, emb.count() // SEMDEDUP_BLOCK)
        best, n = None, 0
        for _ in range(2):
            t0 = time.time()
            # the production tier: scaled k + Arrow/BLAS pair stage
            # (flag-parity with the oracled JVM path pinned in pytest)
            n = force(semdedup_flags(emb, k=k, arrow_pairs=True))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out["semdedup_scaled_k"][sf] = {"sec": round(best, 2), "rows": n, "k": k}
        print(f"semdedup_scaled_k @ {sf}: {round(best, 2)}s (k={k}, {n} rows)",
              flush=True)
    blob = json.dumps({"queries": out, "cpus": 32,
                       "note": "min-of-2 FULLY-FORCED runs (count + full-row "
                               "xxhash sum - no column pruning), page cache "
                               "pre-touched per SF; semdedup = scaled-k Arrow tier"})
    print(blob)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(blob + "\n")


if __name__ == "__main__":
    main()
