"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": sf}

Each query is forced end-to-end with a noop-format write (evaluates every
column — a bare .count() would let Catalyst prune the computed columns).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from projet_data_engineering_spark.session import get_spark

# One headline per operator family (SURVEY.md §2 + north-star extensions).
BENCH_QUERIES = [
    "q_tpch_q1",        # scan + multi-aggregate (flagship)
    "q_join_multi",     # 6-table star join
    "q_join_inner",     # broadcast fact->dim join
    "q_upsert_merge",   # full-outer keyed merge
    "q_topk",           # TakeOrderedAndProject
    "q_window_rank",    # partitioned window
    "q_dedup",          # distinct
    "q_duration_parse", # regex ETL chain
    "q_search_boolean", # bool/should qualification
    "q_term_join",      # explode + broadcast term join
    "q_bm25_topk",      # full BM25 scoring + top-k
    "q_dedup_exact",    # content-hash dedup
    "q_dedup_minhash",  # MinHash-LSH candidate pairs
    "q_dedup_simhash",  # SimHash signatures
    "q_embed_knn",      # brute-force cosine top-k
    "q_ann_lsh",        # sign-LSH bucketed ANN
    "q_lang_id",        # text analysis
    "q_token_count",    # corpus accounting
    "q_stream_tumbling",# windowed aggregation
    "q_stream_session", # sessionization
    "q_tpch_q4",        # EXISTS -> left-semi join
    "q_tpch_q18",       # IN+HAVING -> semi join, filter-early
    "q_gap_fill",       # date-spine + LOCF window
    "q_hof_arrays",     # shuffle-free array lambdas
    "q_bm25_multifield",# best_fields multi-column BM25 (r2)
    "q_bm25_fuzzy",     # AUTO-fuzziness BM25 expansion (r2)
    "q_curate",         # composed dedup∘quality∘token pipeline (r2)
    "q_boilerplate",    # within-source template-shingle curation (r5)
    "q_media_container_meta",  # JPEG/MP4 stdlib metadata decode (r5)
]

# The 24-query set benched in round 1 (BENCH_r01/BASELINE.md anchor). The
# three r2 additions above change the headline total, so the legacy-24
# subtotal is reported alongside — the ≤2×-baseline gate compares THAT
# number to the r1 anchor, like with like.
LEGACY_24 = BENCH_QUERIES[:24]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # Warm the JVM (codegen, parquet footer cache, shuffle machinery) with one
    # untimed pass over the fact table so per-query timings measure compute,
    # not first-query startup.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()

    # Per query: one untimed warm run (pays whole-stage-codegen JIT compile,
    # a per-query-shape constant that vanishes at scale), then the timed run —
    # steady-state compute, the number that extrapolates to a real cluster.
    # Cold (first-run) times are reported alongside for transparency.
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.time() - t0, 3)
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()  # drop persists so queries don't interfere
        # also free orphaned localCheckpoint blocks (iterative CC/PageRank
        # rounds) — clearCache misses them, and at sf>=5 they accumulate
        # across the set; runs between timed regions, identically at every SF
        import gc

        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_set_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "legacy24_total": round(
                    sum(timings[n] for n in LEGACY_24), 3
                ),
                "cold_queries": cold,
                "cold_total": round(sum(cold.values()), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
