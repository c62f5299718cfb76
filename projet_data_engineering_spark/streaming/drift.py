"""Streaming distribution-drift monitor: per-micro-batch PSI against a
served baseline histogram (ST2 × the ``q_drift_psi`` audit).

``q_drift_psi`` is the two-snapshot BATCH audit; a production feed wants the
same number continuously: every arriving micro-batch scored against a FIXED
baseline the moment it lands, so a recalibrated sensor or an arriving bot
cohort flags within one batch instead of at the next batch audit. This
module is that monitor as one streaming operator:

    build_drift_baseline (once, from the trusted window):
        global [vmin, vmax] + per-(event_type, bin) counts on the fixed
        equi-width grid → served state (2 small tables, atomic_overwrite)
    readStream (events) → foreachBatch:
        1. bin the batch's values on the STORED grid (values outside the
           baseline range clamp into the edge bins — the grid is frozen at
           baseline time, unlike the batch audit's global-range grid)
        2. per event type: PSI(baseline ‖ batch) with the same +0.5/bin
           Laplace smoothing as the batch audit
        3. (batch_id, event_type, n_batch, psi, drifted) rows REPLACE that
           batch_id's slice of the report table (delete-then-insert through
           ``atomic_overwrite``) — an at-least-once redelivery recomputes
           the identical rows and the replace is a no-op, so the report is
           exactly-once per batch.

Baseline types only: a type with no baseline histogram has no defined PSI —
an unseen event_type is ``constraint_audit``'s job (domain membership), not
drift. Per-batch cost is one scan of the batch plus the |types|×|bins|
baseline state; the corpus/baseline window is read zero times per batch.

Replay safety is asserted in ``tests/test_streaming.py`` (redelivery of a
batch leaves the report byte-identical); stream≡batch parity is the driver
query's oracle itself (``q_stream_drift`` unrolls all three batches in SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_data_engineering_spark.io import (
    atomic_overwrite,
    load_table,
    path_exists,
    spread,
)
from projet_data_engineering_spark.operators.datapipe import (
    PSI_BINS,
    PSI_THRESHOLD,
)
from projet_data_engineering_spark.registry import query
from projet_data_engineering_spark.streaming.fixtures import stamp_batch_mtime


def _grid_bin(value, vmin, vmax, bins: int):
    """Fixed-grid bin index with edge clamping (stream values may fall
    outside the frozen baseline range)."""
    raw = F.floor((value - vmin) / (vmax - vmin) * bins)
    return F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw)).cast("int")


def build_drift_baseline(
    events: DataFrame, path: str, bins: int = PSI_BINS
) -> None:
    """Freeze the trusted window into served drift state under ``path``:
    ``range`` (1 row: vmin, vmax) and ``bins`` (event_type, bin, c_base) on
    the equi-width grid. Both tables are |types|×|bins|-sized; the write is
    crash-atomic. Degenerate all-equal feeds (vmax = vmin) are the
    caller's guard, as in the batch audit."""
    e = events.select("event_type", "value")
    rng = e.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    binned = e.crossJoin(F.broadcast(rng)).select(
        "event_type",
        _grid_bin(F.col("value"), F.col("vmin"), F.col("vmax"), bins).alias(
            "bin"
        ),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.count("*").alias("c_base")
    )
    atomic_overwrite(rng, f"{path}/range")
    atomic_overwrite(counts, f"{path}/bins")


def drift_monitor_batch(
    batch: DataFrame,
    baseline_path: str,
    report_path: str,
    batch_id: int,
    bins: int = PSI_BINS,
    threshold: float = PSI_THRESHOLD,
) -> None:
    """One micro-batch of the monitor (the foreachBatch body, callable
    directly so tests can drive replay scenarios): PSI per baseline type,
    report slice replaced idempotently."""
    spark = batch.sparkSession
    rng = spark.read.parquet(f"{baseline_path}/range")
    base = spark.read.parquet(f"{baseline_path}/bins")

    cbin = (
        batch.select("event_type", "value")
        .crossJoin(F.broadcast(rng))
        .select(
            "event_type",
            _grid_bin(
                F.col("value"), F.col("vmin"), F.col("vmax"), bins
            ).alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count("*").alias("c_batch"))
    )
    grid = (
        base.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("bin"),
        )
    )
    full = (
        grid.join(base, ["event_type", "bin"], "left")
        .join(cbin, ["event_type", "bin"], "left")
        .fillna(0, ["c_base", "c_batch"])
    )
    tot = full.groupBy("event_type").agg(
        F.sum("c_base").alias("tot_base"),
        F.sum("c_batch").alias("tot_batch"),
    )
    j = full.join(tot, "event_type")
    smooth = F.lit(bins * 0.5)
    p = (F.col("c_base") + F.lit(0.5)) / (F.col("tot_base") + smooth)
    q = (F.col("c_batch") + F.lit(0.5)) / (F.col("tot_batch") + smooth)
    rep = (
        j.groupBy("event_type")
        .agg(
            F.max("tot_batch").cast("bigint").alias("n_batch"),
            F.round(F.sum((p - q) * F.log(p / q)), 5).alias("psi"),
        )
        .select(
            F.lit(int(batch_id)).alias("batch_id"),
            "event_type",
            "n_batch",
            "psi",
            (F.col("psi") > F.lit(threshold)).alias("drifted"),
        )
    )
    if path_exists(spark, report_path):
        old = spark.read.parquet(report_path).filter(
            F.col("batch_id") != int(batch_id)
        )
        rep = old.unionByName(rep)
    atomic_overwrite(rep, report_path)


def run_stream_drift(
    stream_df: DataFrame,
    baseline_path: str,
    report_path: str,
    checkpoint: str,
    bins: int = PSI_BINS,
    threshold: float = PSI_THRESHOLD,
) -> None:
    """Wire ``drift_monitor_batch`` into a Structured Streaming sink
    (foreachBatch, availableNow): at-least-once event-file arrivals become
    an exactly-once per-batch drift report."""

    def step(batch: DataFrame, batch_id: int) -> None:
        drift_monitor_batch(
            batch, baseline_path, report_path, batch_id, bins, threshold
        )

    (
        stream_df.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


_SMOOTH = PSI_BINS * 0.5


@query(
    "q_stream_drift",
    oracle=f"""
    WITH base AS (
        SELECT event_type, value FROM events
        WHERE CAST(ts AS DATE) < DATE '2024-01-16'
    ),
    rng AS (SELECT MIN(value) AS vmin, MAX(value) AS vmax FROM base),
    bbin AS (
        SELECT event_type,
               CAST(LEAST({PSI_BINS - 1}, GREATEST(0,
                          FLOOR((value - vmin) / (vmax - vmin) * {PSI_BINS})))
                    AS INT) AS bin
        FROM base, rng
    ),
    bcnt AS (
        SELECT event_type, bin, COUNT(*) AS c_base
        FROM bbin GROUP BY event_type, bin
    ),
    cur AS (
        SELECT CAST(event_id % 3 AS INT) AS batch_id, event_type, value
        FROM events WHERE CAST(ts AS DATE) >= DATE '2024-01-16'
    ),
    cbin AS (
        SELECT batch_id, event_type,
               CAST(LEAST({PSI_BINS - 1}, GREATEST(0,
                          FLOOR((value - vmin) / (vmax - vmin) * {PSI_BINS})))
                    AS INT) AS bin
        FROM cur, rng
    ),
    ccnt AS (
        SELECT batch_id, event_type, bin, COUNT(*) AS c_batch
        FROM cbin GROUP BY batch_id, event_type, bin
    ),
    grid AS (
        SELECT k.batch_id, t.event_type, b.bin
        FROM (SELECT DISTINCT event_type FROM bcnt) t,
             (SELECT UNNEST(generate_series(0, {PSI_BINS - 1})) AS bin) b,
             (SELECT UNNEST(generate_series(0, 2)) AS batch_id) k
    ),
    full_g AS (
        SELECT g.batch_id, g.event_type, g.bin,
               COALESCE(bc.c_base, 0) AS c_base,
               COALESCE(cc.c_batch, 0) AS c_batch
        FROM grid g
        LEFT JOIN bcnt bc
               ON g.event_type = bc.event_type AND g.bin = bc.bin
        LEFT JOIN ccnt cc
               ON g.batch_id = cc.batch_id
              AND g.event_type = cc.event_type AND g.bin = cc.bin
    ),
    tot AS (
        SELECT batch_id, event_type,
               SUM(c_base) AS tot_base, SUM(c_batch) AS tot_batch
        FROM full_g GROUP BY batch_id, event_type
    ),
    rep AS (
        SELECT f.batch_id, f.event_type,
               CAST(MAX(tot_batch) AS BIGINT) AS n_batch,
               ROUND(SUM(((c_base + 0.5) / (tot_base + {_SMOOTH})
                          - (c_batch + 0.5) / (tot_batch + {_SMOOTH}))
                         * LN(((c_base + 0.5) / (tot_base + {_SMOOTH}))
                              / ((c_batch + 0.5) / (tot_batch + {_SMOOTH})))),
                     5) AS psi
        FROM full_g f JOIN tot USING (batch_id, event_type)
        GROUP BY f.batch_id, f.event_type
    )
    SELECT batch_id, event_type, n_batch, psi, psi > {PSI_THRESHOLD} AS drifted
    FROM rep
    """,
)
def q_stream_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL streaming monitor end-to-end, hash-checked against an
    unrolled SQL transcription: the pre-2024-01-16 window freezes into the
    served baseline, the remaining events arrive as three micro-batch files
    (event_id % 3, mtime-ordered + maxFilesPerTrigger=1) through
    ``run_stream_drift``, and the per-batch PSI report is returned. The
    oracle recomputes the frozen grid, the clamped binning, and every
    batch's smoothed PSI in pure SQL — so the hash match proves the served
    state's content and the monitor's batch math, not just a batch twin."""
    import shutil
    import tempfile

    e = spread(load_table(spark, sf_dir, "events"), "event_id").select(
        "event_id", "ts", "event_type", "value"
    )
    split = F.to_date("ts") < F.lit("2024-01-16")
    root = tempfile.mkdtemp(prefix="stream_drift_")
    try:
        build_drift_baseline(e.filter(split), f"{root}/baseline")
        cur = e.filter(~split)
        src = f"{root}/src"
        for k in range(3):
            cur.filter(F.col("event_id") % 3 == k).coalesce(1).write.parquet(
                f"{src}/b{k}"
            )
            stamp_batch_mtime(f"{src}/b{k}", k)
        stream = (
            spark.readStream.schema(cur.schema)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "*.parquet")
            .parquet(f"{src}/*")
        )
        run_stream_drift(
            stream, f"{root}/baseline", f"{root}/report", f"{root}/chk"
        )
        out = spark.read.parquet(f"{root}/report")
        rows = out.collect()
        return spark.createDataFrame(rows, schema=out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


__all__ = [
    "build_drift_baseline",
    "drift_monitor_batch",
    "run_stream_drift",
    "q_stream_drift",
]
