"""Shuffle-partition sensitivity sweep (VERDICT r9 item 5).

Every bench in this repo pins local[32]'s session default
(``spark.sql.shuffle.partitions=32``); a 100x-cluster claim should
document the one knob every Spark job retunes. This sweeps the runtime
conf over the heaviest shuffle-bound bench lines at a big SF and records
the wall-time curve, plus where AQE's partition coalescing
(``spark.sql.adaptive.coalescePartitions.enabled``, on by default in the
session) makes the knob moot: with AQE on, the static value is only the
INITIAL partition count — AQE merges small post-shuffle partitions back
to the target advisory size, so over-provisioning is cheap and
under-provisioning (fewer partitions than cores) is the real hazard.

Usage: python tools/bench_shuffle_sweep.py [sf_dir] [out_json]
         [--parts 8,32,128,512] [--queries q_a,q_b] [--min-of 2]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "q_semdedup",            # Arrow/BLAS pair tier over k-means blocks
    "q_curate",              # composed LSS + hint-gated pair joins
    "q_percentile_sampled",  # two-phase salted bottom-k
    "q_dedup_minhash",       # banded LSH pair join
    "q_term_join",           # explode + broadcast term join
]


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else ".localdata/sf1.0"
    out_json = args[1] if len(args) > 1 else None

    def opt(name: str, default: str) -> str:
        return (
            sys.argv[sys.argv.index(name) + 1]
            if name in sys.argv
            else default
        )

    parts = [int(p) for p in opt("--parts", "8,32,128,512").split(",")]
    queries = opt("--queries", ",".join(DEFAULT_QUERIES)).split(",")
    min_of = int(opt("--min-of", "2"))

    import __spark_entry__ as entrymod
    from projet_data_engineering_spark.session import get_spark

    spark = get_spark("bench_shuffle_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    base = spark.conf.get("spark.sql.shuffle.partitions")
    result = {"sf_dir": sf_dir, "parts": parts, "min_of": min_of,
              "base_setting": base, "queries": {}}
    try:
        for name in queries:
            fn = qs[name]
            row = {}
            for p in parts:
                spark.conf.set("spark.sql.shuffle.partitions", str(p))
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()  # warm (plans + page cache) at THIS setting
                best = None
                for _ in range(min_of):
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                row[p] = round(best, 3)
            result["queries"][name] = row
            print(name, json.dumps(row))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
