"""Split the streaming dedup stage's batch wall into its real terms
(VERDICT r10 item 3): the dedup banded pair join is ~75% of the composed
stack's batch wall at every SF — this tool answers WHERE inside
``dedup_ingest_batch`` that time goes, per micro-batch, as served state
grows:

  sig            one minhash+wordset materialization pass over the batch
                 (r11: previously run 3x — within-pairs, probe, state merge)
  within         batch-local band self-join + Jaccard verify
  probe_verify   served-state probe (partition-pruned band scan + broadcast
                 join) + cross-pair Jaccard verify
  accept         drop-list anti-join + eager checkpoint of the accepted set
  write_accepted crash-atomic partitioned MERGE of accepted docs
  write_state    band + wordset state merges (bucket-pruned rewrites)

Usage: python tools/bench_dedup_stage.py [sf_dir] [n_batches] [out_json]
Defaults: .localdata/sf1.0, 4 batches, print-only.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf1.0"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    out_json = sys.argv[3] if len(sys.argv) > 3 else None

    from projet_data_engineering_spark.io import load_table, spread
    from projet_data_engineering_spark.session import get_spark
    from projet_data_engineering_spark.streaming.dedup_ingest import (
        dedup_ingest_batch,
    )

    spark = get_spark("bench_dedup_stage")
    spark.sparkContext.setLogLevel("ERROR")

    d = spread(load_table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "text"
    )
    root = tempfile.mkdtemp(prefix="bench_dedup_stage_")
    result = {"sf_dir": sf_dir, "n_batches": n_batches, "batches": []}
    try:
        batch_paths = []
        for k in range(n_batches):
            p = f"{root}/src/b{k}"
            d.filter(F.col("doc_id") % n_batches == k).write.parquet(p)
            batch_paths.append(p)
        state = f"{root}/state"
        accepted = f"{root}/accepted"
        for k, p in enumerate(batch_paths):
            batch = spark.read.parquet(p)
            n_rows = batch.count()
            stage_s: dict[str, float] = {}
            t0 = time.perf_counter()
            dedup_ingest_batch(
                batch, state, accepted, stage_seconds=stage_s
            )
            wall = time.perf_counter() - t0
            rec = {
                "batch": k,
                "rows_in": n_rows,
                "wall_sec": round(wall, 2),
                "stage_sec": {s: round(v, 2) for s, v in stage_s.items()},
                "stage_pct": {
                    s: round(100 * v / wall, 1) for s, v in stage_s.items()
                },
                "docs_per_sec": round(n_rows / wall, 1),
            }
            result["batches"].append(rec)
            print(json.dumps(rec))
        total_in = sum(b["rows_in"] for b in result["batches"])
        total_s = sum(b["wall_sec"] for b in result["batches"])
        result["total_docs"] = total_in
        result["total_sec"] = round(total_s, 2)
        result["docs_per_sec"] = round(total_in / total_s, 1)
        agg: dict[str, float] = {}
        for b in result["batches"]:
            for s, v in b["stage_sec"].items():
                agg[s] = agg.get(s, 0.0) + v
        result["stage_sec_total"] = {s: round(v, 2) for s, v in agg.items()}
        result["stage_pct_total"] = {
            s: round(100 * v / total_s, 1) for s, v in agg.items()
        }
        print(json.dumps({k: result[k] for k in (
            "total_docs", "total_sec", "docs_per_sec",
            "stage_sec_total", "stage_pct_total")}))
        if out_json:
            with open(out_json, "w") as f:
                json.dump(result, f, indent=1)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
