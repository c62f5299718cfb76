#!/usr/bin/env python
"""Repo-wide physical-plan lint: build EVERY registered query (lazily — no
execution) and scan its formatted plan for patterns that do not survive a
100-TB cluster:

- ``BatchEvalPython`` / ``PythonUDF`` outside Arrow nodes — a row-at-a-time
  Python UDF in a hot path (the repo's policy is Arrow-only:
  ``MapInPandas``/``FlatMapGroupsInPandas`` are the sanctioned nodes).
- ``CartesianProduct`` — an unkeyed all-pairs join; every cross join in the
  repo must ride a broadcast (BroadcastNestedLoopJoin over a 1-row/tiny
  aggregate), never a partitioned cartesian.
- partition-less ``Window`` over a NON-aggregated input — a global window
  serializes its whole input onto one task; it is only allowed over
  aggregate/limit-bounded intermediates (``explain.unbounded_global_windows``).

Usage: ``python tools/plan_audit.py [sf_dir]`` — prints one line per
offending query and a summary; exit 1 if any query trips a rule. The pytest
twin is ``tests/test_plans.py::test_no_query_plans_cartesian_or_rowwise_python``.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from projet_data_engineering_spark.plans.explain import (  # noqa: E402
    formatted_plan,
    unbounded_global_windows,
)
from projet_data_engineering_spark.session import get_spark  # noqa: E402

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


def audit(spark, sf_dir: str) -> dict[str, list[str]]:
    bad: dict[str, list[str]] = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        plan = formatted_plan(df)
        hits = [frag for frag in FORBIDDEN if frag in plan]
        if unbounded_global_windows(df):
            hits.append("GlobalWindowOverFactInput")
        if hits:
            bad[name] = hits
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    bad = audit(spark, sf_dir)
    n = len(entrymod.queries())
    for name, hits in sorted(bad.items()):
        print(f"FLAG  {name}: {', '.join(hits)}")
    print(f"{n - len(bad)}/{n} query plans clean, {len(bad)} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
