"""With/without measurement for the size-gated pair-join merge hints
(VERDICT r8 item 1).

r8 merge-hinted every corpus-derived pair-join side unconditionally;
q_dedup_minhash regressed to 1.70x its r1 anchor at sf0.1 because the
hint also pins sort-merge where broadcast was measured correct. r9 gates
the hint on the frame's source parquet bytes (plans/hints.py). This
bench quantifies both halves of the trade on the SAME code by patching
``merge_if_large``:

- ``gated``  — the shipped gate (no hint under 32 MB source bytes,
  hint above);
- ``forced`` — the r8 behavior reconstructed (hint always).

At sf0.1 (0.6 MB source) the two modes differ and the gap is the r8
regression being paid back. At sf10 (57 MB source) the gate itself
chooses the hint, so the two modes must time identically — proving the
gate reintroduces no scale regression (the r8 OOM protection is intact
exactly where it was needed).

Usage: python tools/bench_hint_gate.py [sf01_dir] [sf10_dir] [reps] [out]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf10 = sys.argv[2] if len(sys.argv) > 2 else ".localdata/sf10.0"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    out_json = sys.argv[4] if len(sys.argv) > 4 else "evidence/bench_hint_gate_r09.json"

    from projet_data_engineering_spark.plans import hints
    from projet_data_engineering_spark.operators import datapipe, dedup
    from projet_data_engineering_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("bench_hint_gate")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    real = hints.merge_if_large

    def forced(df, threshold=hints.CORPUS_MERGE_THRESHOLD, size_from=None):
        return df.hint("merge")

    def set_mode(fn):
        dedup.merge_if_large = fn
        datapipe.merge_if_large = fn

    def timed(name, sf_dir):
        best, rows = None, None
        for _ in range(reps):
            t0 = time.time()
            rows = qs[name](spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
            spark.catalog.clearCache()
        return round(best, 3), rows

    out = {"reps": reps, "threshold_bytes": hints.CORPUS_MERGE_THRESHOLD}
    for mode, fn in (("gated", real), ("forced", forced)):
        set_mode(fn)
        for name in ("q_dedup_minhash", "q_curate"):
            t, n = timed(name, sf01)
            out[f"sf0.1_{mode}_{name}_s"] = t
            out[f"sf0.1_{mode}_{name}_rows"] = n
    # scale leg: at sf10 the gate itself selects the hint, so gated and
    # forced must coincide — same plan, same time, no OOM
    for mode, fn in (("gated", real), ("forced", forced)):
        set_mode(fn)
        t, n = timed("q_dedup_minhash", sf10)
        out[f"sf10_{mode}_q_dedup_minhash_s"] = t
        out[f"sf10_{mode}_q_dedup_minhash_rows"] = n
    set_mode(real)

    out["sf0.1_speedup_minhash"] = round(
        out["sf0.1_forced_q_dedup_minhash_s"] / out["sf0.1_gated_q_dedup_minhash_s"], 2
    )
    out["sf0.1_speedup_curate"] = round(
        out["sf0.1_forced_q_curate_s"] / out["sf0.1_gated_q_curate_s"], 2
    )
    print(json.dumps(out))
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
