"""Large-vocabulary fuzzy-expansion bench: the driver corpus has a
31-word vocabulary, so dictionary-expansion designs can never show their
point there. This bench builds a corpus with an N-term dictionary,
indexes it once, then serves the same typo'd queries two ways:

1. the shipped banded serve (``bm25_serve_fuzzy``): levenshtein join
   against the vocab artifact behind a pushed ``term_len`` range filter
   over length-sorted row groups;
2. the unbanded baseline, reconstructed: the same levenshtein join with
   the length predicate evaluated in-join only (no pushed band), i.e. a
   full dictionary scan per query.

Both feed the identical scoring tail; results are asserted equal before
timings are trusted.

History (kept as evidence): r8 shipped a SymSpell delete-key index
(38x |V| rows) on the theory that probing delete keys beats scanning the
dictionary. This bench measured it at 1M terms (1.13x win,
evidence/bench_fuzzy_vocab_r08.json) and 4M terms (0.66x - a LOSS,
evidence/bench_fuzzy_vocab_r09.json), so r9 retired the index for the
banded scan (VERDICT r8 item 4); those two JSONs are the record of the
decision and were produced by this tool's previous revision.

Usage: python tools/bench_fuzzy_vocab.py [n_terms] [n_docs] [reps] [out]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ALPHA = np.array(list("abcdefghijklmnopqrstuvwxyz"))


def gen_docs(data_dir: str, n_terms: int, n_docs: int, tokens_per_doc: int = 30):
    rng = np.random.default_rng(7)
    lens = rng.integers(4, 13, size=n_terms)
    terms = np.array(
        ["".join(ALPHA[rng.integers(0, 26, size=n)]) for n in lens]
    )
    # Zipf-ish usage so the dictionary has a head and a long tail, like a
    # real corpus; every doc is tokens_per_doc draws
    w = 1.0 / np.arange(1, n_terms + 1) ** 0.7
    w /= w.sum()
    toks = rng.choice(terms, size=(n_docs, tokens_per_doc), p=w)
    texts = [" ".join(row) for row in toks]
    os.makedirs(data_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {"doc_id": np.arange(n_docs, dtype=np.int64), "text": texts}
        ),
        f"{data_dir}/documents.parquet",
    )
    return terms


def unbanded_serve(spark, index_path, query_terms, id_col="doc_id",
                   k1=1.2, b=0.75):
    """The unbanded baseline: same expansion join, but the length band is
    evaluated in-join only — every query pays a full |V| dictionary scan
    (no pushed term_len row-group pruning)."""
    from pyspark.sql import functions as F

    from projet_data_engineering_spark.operators.search import auto_fuzziness

    stats = spark.read.parquet(f"{index_path}/stats")
    qt = []
    for t in (t.lower() for t in query_terms):
        if t not in {q for q, _ in qt}:
            qt.append((t, auto_fuzziness(t)))
    qterms = spark.createDataFrame(qt, ["qterm", "fuzz"])
    vmatch = (
        spark.read.parquet(f"{index_path}/vocab")
        .select("term", "term_bucket")
        .join(
            F.broadcast(qterms),
            (F.abs(F.length("term") - F.length("qterm")) <= F.col("fuzz"))
            & (F.levenshtein(F.col("term"), F.col("qterm")) <= F.col("fuzz")),
        )
        .select("term", "qterm", "term_bucket")
    )
    buckets = sorted(
        int(r["term_bucket"])
        for r in vmatch.select("term_bucket").distinct().collect()
    )
    hits = (
        spark.read.parquet(f"{index_path}/postings")
        .filter(F.col("term_bucket").isin(buckets))
        .join(F.broadcast(vmatch.select("term", "qterm")), "term")
    )
    tf = hits.groupBy(id_col, "dl", "qterm").agg(F.sum("tf").alias("tf"))
    dfc = tf.groupBy("qterm").agg(F.countDistinct(id_col).alias("df"))
    stats = stats.select("n_docs", "avg_dl")
    return (
        tf.join(F.broadcast(dfc), "qterm")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "term_score",
            F.col("idf") * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avg_dl"))),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("term_score"), 4).alias("score"))
    )


def main() -> int:
    from projet_data_engineering_spark.operators.search import (
        bm25_serve_fuzzy,
        build_search_index,
    )
    from projet_data_engineering_spark.session import get_spark

    n_terms = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    out_json = (
        sys.argv[4] if len(sys.argv) > 4 else "evidence/bench_fuzzy_vocab_r08.json"
    )
    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata",
        f"fuzzyvocab_{n_terms}_{n_docs}",
    )
    if not os.path.exists(f"{base}/documents.parquet"):
        gen_docs(base, n_terms, n_docs)
    spark = get_spark("bench_fuzzy_vocab")
    docs = spark.read.parquet(f"{base}/documents.parquet")
    idx = f"{base}/idx"
    t0 = time.time()
    if not os.path.exists(f"{idx}/stats"):
        build_search_index(docs, "doc_id", "text", idx, n_buckets=64)
    build_s = round(time.time() - t0, 2)
    vocab_n = spark.read.parquet(f"{idx}/vocab").count()

    # typo'd probes: corrupt real dictionary terms so matches exist
    import duckdb

    real = [
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT unnest(str_split(text, ' ')) AS t "
            f"FROM '{base}/documents.parquet' WHERE doc_id < 3"
        ).fetchall()
        if len(r[0]) >= 6
    ][:3]
    queries = [t[:-1] + ("x" if t[-1] != "x" else "y") for t in real]

    def timed(fn):
        best = None
        for _ in range(reps):
            t0 = time.time()
            rows = fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return best, rows

    t_probe, r_probe = timed(
        lambda: bm25_serve_fuzzy(spark, idx, queries).collect()
    )
    t_full, r_full = timed(
        lambda: unbanded_serve(spark, idx, queries).collect()
    )
    got = sorted((r["doc_id"], r["score"]) for r in r_probe)
    want = sorted((r["doc_id"], r["score"]) for r in r_full)
    assert got == want and got, (len(got), len(want))

    out = {
        "n_terms": n_terms,
        "n_docs": n_docs,
        "vocab_rows": vocab_n,
        "build_s": build_s,
        "reps": reps,
        "queries": queries,
        "banded_serve_s": round(t_probe, 2),
        "unbanded_full_scan_s": round(t_full, 2),
        "speedup": round(t_full / t_probe, 2),
        "matched_docs": len(got),
    }
    print(json.dumps(out))
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
