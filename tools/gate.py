"""Combined correctness + plan gate (VERDICT r8 item 2).

r8's plan audit ran at 221 registered queries while the registry grew to
222 — ``q_cms_join_size`` shipped un-linted because the audit and the
oracle sweep were separate invocations with a registration in between.
This script closes that structurally: ONE process imports the registry
once, runs the full oracle sweep (tools/check.py's ``run_check``) over
it, then runs the plan audit (tools/plan_audit.py's ``audit``) over the
SAME ``queries()`` snapshot, and asserts the two walked identical name
sets. A query can no longer be correctness-checked without being
plan-linted, or vice versa.

The Spark session is the check gate's VANILLA driver replica for both
phases — the audit only builds plans lazily, and every conf a query needs
is set inside its own code path, so plan shapes match what the driver
executes.

Usage: ``python tools/gate.py [sf_dir]`` — exit 1 if any oracle row
fails OR any plan is flagged.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check import make_duckdb, make_vanilla_spark, run_check  # noqa: E402
from tools.plan_audit import audit  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entrymod

    names = set(entrymod.queries())
    con = make_duckdb(sf_dir)
    spark = make_vanilla_spark()

    n_pass, n_rows_only, n_fail = run_check(spark, con, sf_dir)

    print(f"\n--- plan audit over the same {len(names)}-query registry ---")
    bad = audit(spark, sf_dir)
    audited = set(entrymod.queries())
    for name, hits in sorted(bad.items()):
        print(f"FLAG  {name}: {', '.join(hits)}")
    print(f"{len(audited) - len(bad)}/{len(audited)} query plans clean, {len(bad)} flagged")

    if audited != names:
        print(f"GATE MISMATCH: sweep saw {len(names)} names, audit saw {len(audited)}")
        return 1
    if n_pass + n_rows_only + n_fail != len(names):
        print(
            f"GATE MISMATCH: sweep rows {n_pass + n_rows_only + n_fail} != "
            f"registry {len(names)}"
        )
        return 1
    return 1 if (n_fail or bad) else 0


if __name__ == "__main__":
    sys.exit(main())
