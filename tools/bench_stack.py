"""Scale-prove the composed streaming serving stack (VERDICT r9 item 1).

q_stream_stack is hash-green at sf0.01/sf0.1 only; this tool runs the SAME
foreachBatch body (``stack_ingest_batch`` — dedup ingest → BM25 refresh →
IVF refresh → PQ refresh → drift monitor) over the big generated SFs
(.localdata/sf1.0 = 20k docs-with-embeddings, sf10.0 = 200k) split into
micro-batches, and reports the three numbers the flagship serving claim
rests on:

- per-stage throughput (docs/s) per micro-batch — where the pipe's budget
  actually goes, and whether any stage degrades as served STATE grows;
- state growth per batch — rows in each served artifact (dedup bands/
  wordsets, accepted corpus, postings/vocab/docstats, IVF lists, PQ codes)
  plus on-disk bytes of the whole stack root: the growth must be linear in
  accepted docs, never in batches-seen (a replay-safety smell) or quadratic
  (a pair-state smell);
- end-to-end freshness lag — wall seconds from batch arrival to all five
  served artifacts updated (availableNow drains batches sequentially, so
  the lag IS the sum of stage walls for that batch).

Usage: python tools/bench_stack.py [sf_dir] [n_batches] [out_json] [--conc]
Defaults: .localdata/sf1.0, 4 batches, print-only. ``--conc`` skips the
per-stage instrumentation and reports end-to-end lag only. (It existed to
measure a thread-concurrent stage path that r10 tried and REMOVED after
it measured 0.62x on local[32] — `evidence/bench_stack_sf1_conc_r10.json`
captures that run from the commit where the path existed; today both
modes execute the same sequential stages.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _state_rows(spark, base: str) -> dict:
    out = {}
    for key, sub in (
        ("dedup_bands", "dedup_state/bands"),
        ("dedup_wordsets", "dedup_state/wordsets"),
        ("accepted", "accepted"),
        ("bm25_postings", "bm25/postings"),
        ("bm25_vocab", "bm25/vocab"),
        ("bm25_docstats", "bm25/docstats"),
        ("ivf_assignments", "ivf/assignments"),
        ("pq_codes", "pq/codes"),
    ):
        p = f"{base}/{sub}"
        try:
            if not os.path.isdir(p):
                out[key] = 0
                continue
            from projet_data_engineering_spark.io import read_log_table

            out[key] = read_log_table(spark, p).count()
        except Exception:
            out[key] = 0
    return out


def main() -> int:
    conc = "--conc" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else ".localdata/sf1.0"
    n_batches = int(args[1]) if len(args) > 1 else 4
    out_json = args[2] if len(args) > 2 else None

    import shutil
    import tempfile

    from projet_data_engineering_spark.io import load_table, spread
    from projet_data_engineering_spark.session import get_spark
    from projet_data_engineering_spark.streaming.stack import (
        stack_ingest_batch,
    )

    spark = get_spark("bench_stack")
    spark.sparkContext.setLogLevel("ERROR")

    d = spread(load_table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "text"
    )
    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    src = d.join(e, "doc_id")
    root = tempfile.mkdtemp(prefix="bench_stack_")
    result = {
        "sf_dir": sf_dir,
        "n_batches": n_batches,
        "mode": "lag-only" if conc else "sequential-stages",
        "batches": [],
    }
    try:
        # materialize the batch inputs first so batch prep isn't timed
        batch_paths = []
        for k in range(n_batches):
            p = f"{root}/src/b{k}"
            src.filter(F.col("doc_id") % n_batches == k).write.parquet(p)
            batch_paths.append(p)
        base = f"{root}/stack"
        for k, p in enumerate(batch_paths):
            batch = spark.read.parquet(p)
            n_rows = batch.count()
            stage_s: dict[str, float] = {}
            t0 = time.perf_counter()
            stack_ingest_batch(
                batch, base, k,
                stage_seconds=None if conc else stage_s,
            )
            lag = time.perf_counter() - t0
            rows = _state_rows(spark, base)
            rec = {
                "batch": k,
                "rows_in": n_rows,
                "freshness_lag_sec": round(lag, 2),
                "stage_sec": {s: round(v, 2) for s, v in stage_s.items()},
                "stage_docs_per_sec": {
                    s: round(n_rows / v, 1) for s, v in stage_s.items() if v
                },
                "state_rows": rows,
                "state_bytes": _dir_bytes(base),
            }
            result["batches"].append(rec)
            print(json.dumps(rec))
        total_in = sum(b["rows_in"] for b in result["batches"])
        total_s = sum(b["freshness_lag_sec"] for b in result["batches"])
        result["total_docs"] = total_in
        result["total_sec"] = round(total_s, 2)
        result["end_to_end_docs_per_sec"] = round(total_in / total_s, 1)
        print(
            f"TOTAL {sf_dir}: {total_in} docs through 5 stages in "
            f"{total_s:.1f}s = {total_in / total_s:.0f} docs/s end-to-end"
        )
        if out_json:
            with open(out_json, "w") as f:
                json.dump(result, f, indent=1)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
