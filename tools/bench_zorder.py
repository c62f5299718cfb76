"""Z-order file-skipping effectiveness at a real scale factor (VERDICT r5
item 5 — turn the test-size footer assertion into measured skip/byte ratios).

Layout under test: ``io.write_zordered`` on lineitem(l_partkey, l_suppkey) —
the engine-neutral shape of Delta ``OPTIMIZE ZORDER BY``. Baseline: the same
file budget sorted by l_partkey alone (the best single-dimension layout when
the table must also serve l_suppkey filters).

For a grid of selective filters (two-column boxes, and each column alone)
this measures, from the actual parquet footers (pyarrow):

- files a min/max-stats reader must touch (cannot skip) and their byte
  share — the Delta/Iceberg file-skipping model;
- wall-clock for the same filter through Spark's scan (row-group level
  pushdown), layout vs layout, as a sanity anchor.

Usage: python tools/bench_zorder.py [sf_dir] [n_files] [out_json]
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def file_ranges(path: str, cols: list[str]):
    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for c in cols:
                st = md.row_group(rg).column(names[c]).statistics
                lo[c] = st.min if lo[c] is None else min(lo[c], st.min)
                hi[c] = st.max if hi[c] is None else max(hi[c], st.max)
        out.append((os.path.getsize(f), lo, hi))
    return out


def touched(ranges, pred: dict):
    """Files whose [min,max] intersects every column interval of ``pred``."""
    n_f = n_b = 0
    tot_f = tot_b = 0
    for size, lo, hi in ranges:
        tot_f += 1
        tot_b += size
        hit = all(hi[c] >= a and lo[c] <= b for c, (a, b) in pred.items())
        if hit:
            n_f += 1
            n_b += size
    return n_f, tot_f, n_b, tot_b


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf1.0"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    out_json = sys.argv[3] if len(sys.argv) > 3 else None
    import shutil
    import tempfile

    from projet_data_engineering_spark.io import load_table, write_zordered
    from projet_data_engineering_spark.session import get_spark

    spark = get_spark("bench-zorder")
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_partkey", "l_suppkey"]
    maxes = li.agg(*[F.max(c) for c in cols]).first()
    pk_max, sk_max = int(maxes[0]), int(maxes[1])
    root = tempfile.mkdtemp(prefix="zbench_")
    zpath, lpath = f"{root}/zorder", f"{root}/linear"
    try:
        t0 = time.time()
        write_zordered(li, zpath, cols, bits=16, n_files=n_files)
        t_z = time.time() - t0
        t0 = time.time()
        li.repartitionByRange(n_files, F.col("l_partkey")).sortWithinPartitions(
            "l_partkey"
        ).write.mode("overwrite").parquet(lpath)
        t_l = time.time() - t0
        zr = file_ranges(zpath, cols)
        lr = file_ranges(lpath, cols)

        # ~3%-per-side boxes at three spots, plus single-column slices
        def box(frac_lo, width=0.03):
            return {
                "l_partkey": (
                    int(pk_max * frac_lo),
                    int(pk_max * (frac_lo + width)),
                ),
                "l_suppkey": (
                    int(sk_max * frac_lo),
                    int(sk_max * (frac_lo + width)),
                ),
            }

        preds = {
            "box_3pct_low": box(0.05),
            "box_3pct_mid": box(0.50),
            "box_3pct_high": box(0.90),
            "partkey_only_3pct": {"l_partkey": (int(pk_max * 0.5), int(pk_max * 0.53))},
            "suppkey_only_3pct": {"l_suppkey": (int(sk_max * 0.5), int(sk_max * 0.53))},
        }
        results = {}
        print(
            f"sf={sf_dir} rows={li.count()} files={n_files} "
            f"write: zorder={t_z:.1f}s linear={t_l:.1f}s"
        )
        for name, pred in preds.items():
            zf, ztf, zb, ztb = touched(zr, pred)
            lf, ltf, lb, ltb = touched(lr, pred)

            def spark_time(path):
                cond = None
                for c, (a, b) in pred.items():
                    e = (F.col(c) >= a) & (F.col(c) <= b)
                    cond = e if cond is None else (cond & e)
                ts = []
                for _ in range(3):
                    t0 = time.time()
                    spark.read.parquet(path).filter(cond).agg(
                        F.count("*"), F.sum("l_quantity")
                    ).collect()
                    ts.append(time.time() - t0)
                return statistics.median(ts)

            tz, tl = spark_time(zpath), spark_time(lpath)
            results[name] = {
                "z_files_touched": f"{zf}/{ztf}",
                "z_bytes_pct": round(100 * zb / ztb, 1),
                "linear_files_touched": f"{lf}/{ltf}",
                "linear_bytes_pct": round(100 * lb / ltb, 1),
                "bytes_ratio_linear_over_z": round(lb / max(zb, 1), 2),
                "spark_scan_median_s": {"zorder": round(tz, 3), "linear": round(tl, 3)},
            }
            r = results[name]
            print(
                f"  {name:18s} z: {r['z_files_touched']} files "
                f"({r['z_bytes_pct']}% bytes) | linear: "
                f"{r['linear_files_touched']} files ({r['linear_bytes_pct']}% "
                f"bytes) | bytes linear/z = {r['bytes_ratio_linear_over_z']}x "
                f"| scan z={tz:.3f}s lin={tl:.3f}s"
            )
        if out_json:
            with open(out_json, "w") as f:
                json.dump(
                    {
                        "sf_dir": sf_dir,
                        "n_files": n_files,
                        "write_s": {"zorder": round(t_z, 1), "linear": round(t_l, 1)},
                        "filters": results,
                    },
                    f,
                    indent=1,
                )
            print(f"wrote {out_json}")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
