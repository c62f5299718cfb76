#!/usr/bin/env python
"""Per-query job/stage/task census: how much of a bench line is fixed
per-job overhead vs actual compute (guide §1 — decide WHERE the time goes
before touching anything).

For each named query: one untimed warm run, then a timed run that also
diffs the status-tracker job/stage/task counts. A query whose wall is
~(n_jobs x per-job floor) is JOB-BOUND — the fix is fewer passes/rounds,
not faster per-row code.

Usage: python tools/profile_queries.py [sf_dir] q_a q_b ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from projet_data_engineering_spark.session import get_spark  # noqa: E402


def snap(sc):
    st = sc.statusTracker()
    jobs = st.getJobIdsForGroup(None) or []
    return set(jobs)


def run(spark, fn, sf_dir):
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    spark = get_spark("profile")
    sc = spark.sparkContext
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # JVM warmup on the fact table
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()
    out = {}
    for name in names:
        fn = qs[name]
        run(spark, fn, sf_dir)  # warm
        st = sc.statusTracker()
        before = set(st.getJobIdsForGroup(None) or [])
        t0 = time.time()
        run(spark, fn, sf_dir)
        wall = time.time() - t0
        after = set(st.getJobIdsForGroup(None) or [])
        new_jobs = sorted(after - before)
        n_stages = 0
        n_tasks = 0
        for j in new_jobs:
            ji = st.getJobInfo(j)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        out[name] = {
            "wall_s": round(wall, 3),
            "jobs": len(new_jobs),
            "stages": n_stages,
            "tasks": n_tasks,
            "ms_per_job": round(1000 * wall / max(len(new_jobs), 1), 1),
        }
        print(name, json.dumps(out[name]))
        spark.catalog.clearCache()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
