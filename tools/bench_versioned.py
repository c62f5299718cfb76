"""Versioned-table read latency vs history length (VERDICT r8 item 3).

``read_version`` unions one change-set scan per live version; nothing in
r8 measured how that read degrades as versions accumulate, or what
compaction buys back. This bench builds a versioned table over the
documents corpus (base commit = full table, then small keyed upserts),
times the latest-version read at growing version counts, then runs the
``auto_compact`` policy and re-times — the curve that justifies the
policy's default threshold.

Expected shape (and what SCALING.md records): read time grows roughly
linearly in live version count — each version adds a scan + its slice of
the window shuffle — while the post-compaction read returns to the
2-version cost regardless of how much history was folded. That linear
coefficient is pure bookkeeping (file listing, plan nodes, tiny scans),
which is why the policy bounds LIVE versions, not committed history.

Usage: python tools/bench_versioned.py [sf_dir_1] [sf_dir_2 ...]
writes evidence/bench_versioned_r09.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

CHECKPOINTS = (2, 8, 32, 64, 128)
N_VERSIONS = 128
REPS = 2


def main() -> int:
    sf_dirs = sys.argv[1:] or [".localdata/sf1.0", ".localdata/sf10.0"]

    from projet_data_engineering_spark.io import load_table
    from projet_data_engineering_spark.operators import versioned as vt
    from projet_data_engineering_spark.session import get_spark

    spark = get_spark("bench_versioned")
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for sf_dir in sf_dirs:
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        n_docs = d.count()
        root = tempfile.mkdtemp(prefix="bench_versioned_")
        try:
            path = f"{root}/t"
            t0 = time.time()
            # base commit: the whole corpus (change sets are keyed-unique
            # by construction — doc_id is the table key)
            vt.versioned_upsert(d, path, "doc_id", assert_unique=False)
            base_commit_s = round(time.time() - t0, 3)

            def timed_read():
                best = None
                for _ in range(REPS):
                    t0 = time.time()
                    vt.read_version(spark, path, "doc_id").count()
                    dt = time.time() - t0
                    best = dt if best is None or dt < best else best
                return round(best, 3)

            curve = []
            commit_s = 0.0
            for v in range(2, N_VERSIONS + 1):
                t0 = time.time()
                vt.versioned_upsert(
                    d.filter(F.col("doc_id") % 101 == v % 101).withColumn(
                        "n_chars", F.col("n_chars") + F.lit(v)
                    ),
                    path,
                    "doc_id",
                    assert_unique=False,
                )
                commit_s += time.time() - t0
                if v in CHECKPOINTS:
                    curve.append({"versions": v, "read_s": timed_read()})

            t0 = time.time()
            upto = vt.auto_compact(
                spark, path, "doc_id", max_versions=16, protect_last=2
            )
            compact_s = round(time.time() - t0, 3)
            post = timed_read()
            results.append(
                {
                    "sf_dir": sf_dir,
                    "n_docs": n_docs,
                    "base_commit_s": base_commit_s,
                    "avg_incremental_commit_s": round(
                        commit_s / (N_VERSIONS - 1), 3
                    ),
                    "read_curve": curve,
                    "compacted_to": upto,
                    "compact_s": compact_s,
                    "live_versions_after": len(vt.table_versions(spark, path)),
                    "read_after_compact_s": post,
                }
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)

    out = {"n_versions": N_VERSIONS, "reps": REPS, "tables": results}
    print(json.dumps(out))
    with open("evidence/bench_versioned_r09.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
