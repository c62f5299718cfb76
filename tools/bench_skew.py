"""Skewed-key stress bench (VERDICT r7 item 3): measure, don't claim.

SCALING.md asserts AQE skew-join + explicit salting handle hot keys, with
plan tests but (until r8) no measured skew run. This bench builds a
deterministically skewed dataset — a fact table whose hottest join/group
key owns ~90% of all rows (far beyond any AQE threshold) plus a uniform
dim — then times:

join tier (fact ⋈ dim on the hot key, revenue-style agg on top):
  1. unsalted, AQE OFF        — the naive plan: one reducer drags the stage
  2. unsalted, AQE skew-join  — the house default (session.get_spark)
  3. salted_join (8 salts)    — the explicit form for when AQE can't see it

agg tier — two aggregates with opposite findings (both kept, both
measured, both asserted identical to their salted twins):
  4. COUNT(DISTINCT val) per key: Spark's distinct rewrite hashes the
     FIRST exchange on (key, val), so group-key skew never reaches one
     reducer — the planner already fixed it, and explicit salting only
     adds stages (measured ~2x SLOWER). Salting a countDistinct is a
     de-optimization; recorded here so nobody "fixes" it.
  5. size(collect_set(val)) per key: no planner rescue — every partial
     set for the hot key merges on ONE reducer. salted_agg with
     salt=hash(val) makes per-salt sets disjoint, so the final stage
     sums bounded partial sizes. This is the aggregate shape (per-key
     membership/dedup lists) where explicit salting earns its keep.

Every variant's result is asserted identical before its timing is trusted.
Plain count/sum group-bys are deliberately NOT the agg workload: map-side
partial aggregation collapses those to |keys| rows per task before the
shuffle, so the hot key costs one row per mapper like every other key.
Sizing note (measured): at 40% hot share / 20M rows the hot partition is
~200 MB — UNDER AQE's 256 MB skewedPartitionThreshold, and scan cost
swamps the skew (all variants within noise; salting strictly loses by
widening the shuffle). The default 90% / 40M puts ~36M rows on one
reducer, which is where the mitigations earn their keep.

Usage: python tools/bench_skew.py [n_fact] [reps] [out_json]
Writes the dataset under .localdata/skew/ (regenerated only if absent).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOT_SHARE = 0.9
N_KEYS = 1_000_000
N_SALTS = 8


def gen(data_dir: str, n_fact: int) -> None:
    rng = np.random.default_rng(42)
    n_hot = int(n_fact * HOT_SHARE)
    key = np.concatenate(
        [
            np.zeros(n_hot, dtype=np.int64),
            rng.integers(1, N_KEYS, size=n_fact - n_hot, dtype=np.int64),
        ]
    )
    rng.shuffle(key)
    val = rng.integers(0, n_fact * 2, size=n_fact, dtype=np.int64)
    amount = rng.random(n_fact)
    os.makedirs(data_dir, exist_ok=True)
    pq.write_table(
        pa.table({"key": key, "val": val, "amount": amount}),
        f"{data_dir}/fact.parquet",
    )
    dkey = np.arange(N_KEYS, dtype=np.int64)
    pq.write_table(
        pa.table({"key": dkey, "attr": dkey % 97}), f"{data_dir}/dim.parquet"
    )


def main() -> int:
    from pyspark.sql import functions as F

    from projet_data_engineering_spark.operators.skew import (
        salted_agg,
        salted_join,
    )
    from projet_data_engineering_spark.session import get_spark

    n_fact = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out_json = (
        sys.argv[3]
        if len(sys.argv) > 3
        else "evidence/bench_skew_r08.json"
    )
    data_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata",
        f"skew_{n_fact}",
    )
    if not os.path.exists(f"{data_dir}/fact.parquet"):
        gen(data_dir, n_fact)

    spark = get_spark("bench_skew")
    fact = spark.read.parquet(f"{data_dir}/fact.parquet")
    dim = spark.read.parquet(f"{data_dir}/dim.parquet")

    def timed(fn):
        best = None
        for _ in range(reps):
            t0 = time.time()
            rows = fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return best, rows

    def canon(rows):
        return sorted(tuple(r) for r in rows)

    results: dict = {
        "n_fact": n_fact,
        "hot_share": HOT_SHARE,
        "n_keys": N_KEYS,
        "n_salts": N_SALTS,
        "reps": reps,
        "join": {},
        "agg": {},
    }

    # ---- join tier: revenue by attr bucket through the skewed join ----
    def join_unsalted():
        j = fact.join(dim, "key")
        return (
            j.groupBy("attr")
            .agg(F.count("*").alias("n"), F.round(F.sum("amount"), 2).alias("rev"))
            .collect()
        )

    def join_salted():
        j = salted_join(
            fact, dim, "key", F.hash("val"), N_SALTS
        )
        return (
            j.groupBy("attr")
            .agg(F.count("*").alias("n"), F.round(F.sum("amount"), 2).alias("rev"))
            .collect()
        )

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    t_naive, r_naive = timed(join_unsalted)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    t_aqe, r_aqe = timed(join_unsalted)
    t_salted, r_salted = timed(join_salted)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert canon(r_naive) == canon(r_aqe) == canon(r_salted)
    results["join"] = {
        "unsalted_aqe_off_s": round(t_naive, 2),
        "unsalted_aqe_skewjoin_s": round(t_aqe, 2),
        "salted_s": round(t_salted, 2),
        "aqe_speedup_vs_naive": round(t_naive / t_aqe, 2),
        "salted_speedup_vs_naive": round(t_naive / t_salted, 2),
    }
    print("join:", results["join"])

    # ---- agg tier: COUNT(DISTINCT val) per key ----
    def agg_unsalted():
        return (
            fact.groupBy("key")
            .agg(F.countDistinct("val").alias("nd"))
            .agg(F.count("*").alias("k"), F.sum("nd").alias("total_nd"))
            .collect()
        )

    def agg_salted():
        return (
            salted_agg(
                fact,
                ["key"],
                F.hash("val"),
                N_SALTS,
                partial_aggs={"pnd": F.countDistinct("val")},
                final_aggs={"nd": F.sum("pnd")},
            )
            .agg(F.count("*").alias("k"), F.sum("nd").alias("total_nd"))
            .collect()
        )

    t_u, r_u = timed(agg_unsalted)
    t_s, r_s = timed(agg_salted)
    assert canon(r_u) == canon(r_s)
    results["agg"] = {
        "count_distinct_unsalted_s": round(t_u, 2),
        "count_distinct_salted_s": round(t_s, 2),
        "count_distinct_salted_speedup": round(t_u / t_s, 2),
        "count_distinct_note": (
            "Spark rewrites distinct aggs to hash the first exchange on "
            "(key, val) - skew never reaches a reducer; salting only adds "
            "stages. Keep countDistinct UNSALTED."
        ),
    }
    print("agg/count_distinct:", results["agg"])

    # ---- agg tier B: size(collect_set(val)) — no planner rescue ----
    def set_unsalted():
        return (
            fact.groupBy("key")
            .agg(F.size(F.collect_set("val")).alias("nd"))
            .agg(F.count("*").alias("k"), F.sum("nd").alias("total_nd"))
            .collect()
        )

    def set_salted():
        return (
            salted_agg(
                fact,
                ["key"],
                F.hash("val"),
                N_SALTS,
                partial_aggs={"pnd": F.size(F.collect_set("val"))},
                final_aggs={"nd": F.sum("pnd")},
            )
            .agg(F.count("*").alias("k"), F.sum("nd").alias("total_nd"))
            .collect()
        )

    t_su, r_su = timed(set_unsalted)
    t_ss, r_ss = timed(set_salted)
    assert canon(r_su) == canon(r_ss) == canon(r_u)
    results["agg_collect_set"] = {
        "unsalted_s": round(t_su, 2),
        "salted_s": round(t_ss, 2),
        "salted_speedup": round(t_su / t_ss, 2),
    }
    print("agg/collect_set:", results["agg_collect_set"])

    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_json)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
