"""Scale timings for the late-r7 operator wave (no oracle — wall times).

Runs each new query at sf1/sf5/sf10 (warm: one untimed run at sf1 first to
JIT the session), prints per-(query, sf) seconds + row counts as JSON.
Usage: python tools/bench_newops_r07.py [out.json]
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
    "q_logreg", "q_logreg_auc", "q_pca_power", "q_pca_project",
    "q_dedup_canonical", "q_domain_resample", "q_drift_psi",
    "q_hybrid_search", "q_constraint_audit", "q_chunk_windows",
]
SFS = [("sf1.0", ".localdata/sf1.0"), ("sf5.0", ".localdata/sf5.0"),
       ("sf10.0", ".localdata/sf10.0")]


def main() -> None:
    spark = get_spark("bench_newops")
    qs = entry.queries()
    # warm the JVM/codegen once
    qs["q_logreg"](spark, ".localdata/sf1.0").count()
    # warm the OS page cache per SF: without this the FIRST query at each
    # scale factor pays the cold parquet read and the table misreads as
    # that query's compute cost (first cut: q_logreg@sf10 56s cold vs ~2s
    # warm while the strictly-heavier AUC ran 2s right after it)
    from projet_data_engineering_spark.io import load_table
    for _, path in SFS:
        for t in ("documents", "embeddings", "events"):
            load_table(spark, path, t).count()
    out: dict[str, dict[str, dict[str, float]]] = {}
    for name in QUERIES:
        out[name] = {}
        for sf, path in SFS:
            # min-of-2 (the bench.py protocol): the first execution of each
            # plan SHAPE pays one-time whole-stage-codegen compilation
            # (~40s for the 64-wide 3-round PCA plan) that would misread as
            # per-data compute; min over repeats estimates the steady cost
            best, n = None, 0
            for _ in range(2):
                t0 = time.time()
                n = qs[name](spark, path).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            out[name][sf] = {"sec": round(best, 2), "rows": n}
            print(f"{name} @ {sf}: {round(best, 2)}s ({n} rows)", flush=True)
    blob = json.dumps({"queries": out, "cpus": 32, "note": "min-of-2 timed runs, page cache pre-touched per SF"})
    print(blob)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(blob + "\n")


if __name__ == "__main__":
    main()
