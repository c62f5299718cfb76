"""Incremental-dedup cost curve (VERDICT r5 item 6): prove the daily-ingest
path's cost tracks BATCH size, not corpus size, and find the crossover where
full recompute becomes cheaper.

Three shapes over the same sf documents table:

- SERVED incremental — ``build_dedup_state`` once (timed separately: the
  per-reindex cost), then ``incremental_dedup_pairs_served`` per batch:
  only the batch is shingled/hashed; the corpus side is two partition-
  pruned scans of stored signatures. This is the daily-ingest shape whose
  cost must track BATCH size.
- state-free incremental — ``incremental_dedup_pairs`` recomputes corpus
  signatures per call; included to show why the stored state exists (its
  cost is corpus-bound and FLAT in batch size).
- full recompute — ``minhash_candidate_pairs`` banded self-join over
  corpus+batch (no incremental machinery at all); constant in batch size.

The served curve's crossing of the full-recompute line IS the operational
rule: below it, probe the stored state; above it, rebuild.

Usage: python tools/bench_incremental_dedup.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

FRACTIONS = [0.001, 0.01, 0.1, 0.3]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf1.0"
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    import shutil
    import tempfile

    from projet_data_engineering_spark.io import load_table, spread
    from projet_data_engineering_spark.operators.dedup import (
        build_dedup_state,
        incremental_dedup_pairs,
        incremental_dedup_pairs_served,
        minhash_candidate_pairs,
    )
    from projet_data_engineering_spark.session import get_spark

    spark = get_spark("bench-incdedup")
    spark.sparkContext.setLogLevel("ERROR")
    d = spread(load_table(spark, sf_dir, "documents"), "doc_id").localCheckpoint(
        eager=True
    )
    n = d.count()

    def timed(fn, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return round(statistics.median(ts), 2)

    # full recompute: banded self-join candidates over the WHOLE table plus
    # the same exact-Jaccard verification the incremental paths perform
    # (constant in batch size — one line, not a curve)
    def full_recompute():
        cand = minhash_candidate_pairs(d, "doc_id", "text")
        ws = d.select(
            "doc_id",
            F.array_distinct(F.split(F.lower("text"), " ")).alias("ws"),
        )
        a = ws.select(F.col("doc_id").alias("doc1"), F.col("ws").alias("wsa"))
        b = ws.select(F.col("doc_id").alias("doc2"), F.col("ws").alias("wsb"))
        inter = F.size(F.array_intersect("wsa", "wsb"))
        union = F.size("wsa") + F.size("wsb") - inter
        (
            cand.join(a, "doc1")
            .join(b, "doc2")
            .select(F.round(inter / union, 4).alias("jaccard"))
            .filter(F.col("jaccard") >= 0.2)
            .count()
        )

    t_full = timed(full_recompute)

    # serving state over the whole table (a real deployment's state holds
    # every ingested doc; per-batch splits below probe against it, which
    # only ADDS the batch's own rows as potential self-matches — cost-
    # equivalent and build-once, like the real pipeline)
    state = tempfile.mkdtemp(prefix="dedup_state_bench_")
    rows = []
    try:
        t_build = timed(lambda: build_dedup_state(d, state), reps=1)
        print(
            f"sf={sf_dir} docs={n} full_recompute_median={t_full}s "
            f"state_build={t_build}s"
        )
        for frac in FRACTIONS:
            mod = int(round(1 / frac))
            batch = d.filter(F.col("doc_id") % mod == 0).localCheckpoint(
                eager=True
            )
            corpus = d.filter(F.col("doc_id") % mod != 0)
            n_batch = batch.count()
            t_served = timed(
                lambda b=batch: incremental_dedup_pairs_served(
                    spark, state, b
                ).count()
            )
            t_inc = timed(
                lambda b=batch, c=corpus: incremental_dedup_pairs(c, b).count()
            )
            rows.append(
                {
                    "batch_frac": frac,
                    "batch_docs": n_batch,
                    "served_median_s": t_served,
                    "statefree_median_s": t_inc,
                    "served_vs_full": round(t_served / t_full, 2),
                }
            )
            print(
                f"  batch {frac:>5.1%} ({n_batch} docs): served {t_served}s "
                f"({rows[-1]['served_vs_full']}x of full) | state-free "
                f"{t_inc}s"
            )
    finally:
        shutil.rmtree(state, ignore_errors=True)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "corpus_docs": n,
                    "full_recompute_s": t_full,
                    "state_build_s": t_build,
                    "batches": rows,
                },
                f,
                indent=1,
            )
        print(f"wrote {out_json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
