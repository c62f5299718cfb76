"""Serve-only BM25 latency vs the corpus-scan path (VERDICT r5 item 4).

``q_bm25_served`` times build+serve together (the honest once-per-reindex
cost); the serving claim — "the corpus is never touched at query time" —
deserves its own number. This bench, at a real scale factor:

1. builds the term-bucket-partitioned index once (timed: the amortized
   reindex cost, reference ``scraper/main.py:271-277``'s ES re-index);
2. answers top-50 queries FROM the index (``bm25_serve``: bucket
   PartitionFilter pruning + broadcast stats; min/median over reps);
3. answers the same queries by scanning+tokenizing the corpus
   (``search_topk``), the no-index baseline;
4. asserts the two paths return identical (doc, score) top-50 sets before
   trusting either timing.

Since late r7 the same protocol also covers the FUZZY path: typo'd queries
answered by ``bm25_serve_fuzzy`` (dictionary expansion over the vocab
artifact + pruned postings) vs the ``bm25_scores_fuzzy`` corpus scan —
parity-asserted, then timed.

Usage: python tools/bench_search_serving.py [sf_dir] [reps] [out_json]
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

QUERIES = [
    ["spark", "join", "stream"],
    ["vector"],
    ["join", "vector", "table", "query"],
]

FUZZY_QUERIES = [
    ["strem", "join", "vectr"],
    ["sprak"],
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf1.0"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    out_json = sys.argv[3] if len(sys.argv) > 3 else None
    from projet_data_engineering_spark.io import load_table, spread
    from projet_data_engineering_spark.operators.search import (
        bm25_serve,
        build_search_index,
        search_topk,
    )
    from projet_data_engineering_spark.session import get_spark

    spark = get_spark("bench-serving")
    spark.sparkContext.setLogLevel("ERROR")
    d = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    n_docs = d.count()
    path = tempfile.mkdtemp(prefix="bm25_bench_idx_")
    try:
        t0 = time.time()
        build_search_index(d, "doc_id", "text", path)
        t_build = time.time() - t0

        def serve(terms):
            return (
                bm25_serve(spark, path, terms)
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(50)
                .collect()
            )

        def scan(terms):
            return search_topk(d, "doc_id", "text", " ".join(terms), 50).collect()

        # parity first: identical (doc, score) sets on every query
        for terms in QUERIES:
            a = {(r["doc_id"], r["score"]) for r in serve(terms)}
            b = {(r["doc_id"], r["score"]) for r in scan(terms)}
            assert a == b, (terms, a ^ b)

        rows = []
        for terms in QUERIES:
            ts_serve = []
            for _ in range(reps):
                t0 = time.time()
                serve(terms)
                ts_serve.append(time.time() - t0)
            ts_scan = []
            for _ in range(reps):
                t0 = time.time()
                scan(terms)
                ts_scan.append(time.time() - t0)
            rows.append(
                {
                    "terms": " ".join(terms),
                    "serve_median_s": round(statistics.median(ts_serve), 3),
                    "serve_min_s": round(min(ts_serve), 3),
                    "scan_median_s": round(statistics.median(ts_scan), 3),
                    "scan_min_s": round(min(ts_scan), 3),
                    "speedup_median": round(
                        statistics.median(ts_scan) / statistics.median(ts_serve), 2
                    ),
                }
            )
        from projet_data_engineering_spark.operators.search import (
            bm25_scores_fuzzy,
            bm25_serve_fuzzy,
        )

        def serve_fz(terms):
            return (
                bm25_serve_fuzzy(spark, path, terms)
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(50)
                .collect()
            )

        def scan_fz(terms):
            return (
                bm25_scores_fuzzy(d, "doc_id", "text", terms)
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(50)
                .collect()
            )

        for terms in FUZZY_QUERIES:
            a = {(r["doc_id"], r["score"]) for r in serve_fz(terms)}
            b = {(r["doc_id"], r["score"]) for r in scan_fz(terms)}
            assert a == b, (terms, a ^ b)

        fuzzy_rows = []
        for terms in FUZZY_QUERIES:
            ts_serve = []
            for _ in range(reps):
                t0 = time.time()
                serve_fz(terms)
                ts_serve.append(time.time() - t0)
            ts_scan = []
            for _ in range(reps):
                t0 = time.time()
                scan_fz(terms)
                ts_scan.append(time.time() - t0)
            fuzzy_rows.append(
                {
                    "terms": " ".join(terms),
                    "serve_median_s": round(statistics.median(ts_serve), 3),
                    "serve_min_s": round(min(ts_serve), 3),
                    "scan_median_s": round(statistics.median(ts_scan), 3),
                    "scan_min_s": round(min(ts_scan), 3),
                    "speedup_median": round(
                        statistics.median(ts_scan) / statistics.median(ts_serve), 2
                    ),
                }
            )

        print(f"sf_dir={sf_dir} n_docs={n_docs} build_index={t_build:.2f}s")
        for r in rows:
            print(
                f"  q='{r['terms']}': serve {r['serve_median_s']}s "
                f"(min {r['serve_min_s']}) vs scan {r['scan_median_s']}s "
                f"(min {r['scan_min_s']}) -> {r['speedup_median']}x"
            )
        for r in fuzzy_rows:
            print(
                f"  fuzzy q='{r['terms']}': serve {r['serve_median_s']}s "
                f"(min {r['serve_min_s']}) vs scan {r['scan_median_s']}s "
                f"(min {r['scan_min_s']}) -> {r['speedup_median']}x"
            )
        if out_json:
            with open(out_json, "w") as f:
                json.dump(
                    {
                        "sf_dir": sf_dir,
                        "n_docs": n_docs,
                        "build_s": round(t_build, 2),
                        "reps": reps,
                        "queries": rows,
                        "fuzzy_queries": fuzzy_rows,
                    },
                    f,
                    indent=1,
                )
            print(f"wrote {out_json}")
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
