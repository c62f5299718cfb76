#!/usr/bin/env python
"""Dump .explain("formatted") for the bench headline queries into a directory.

Usage: python tools/dump_plans.py <out_dir> [sf_dir] [query ...]

Writes one ``<query>.txt`` per query (the optimization rounds commit these as
``plans/r11/<query>_before.txt`` / ``_after.txt``). Queries whose construction
executes side-effect work (stream bootstraps, index builds) still produce the
final returned DataFrame's plan — the same convention tools/plan_audit.py
lints against.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from projet_data_engineering_spark.plans.explain import formatted_plan  # noqa: E402
from projet_data_engineering_spark.session import get_spark  # noqa: E402


def main() -> int:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    os.makedirs(out_dir, exist_ok=True)
    from bench import BENCH_QUERIES

    names = sys.argv[3:] or BENCH_QUERIES
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        try:
            plan = formatted_plan(qs[name](spark, sf_dir))
        except Exception as e:  # a broken query must not hide the others
            plan = f"PLAN BUILD FAILED: {type(e).__name__}: {e}"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
