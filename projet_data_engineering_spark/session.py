"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]`` but every setting is chosen to also be the
right default on a 1000-executor cluster:

- AQE on (runtime shuffle-partition coalescing + skew-join splitting), so the
  same plan survives a 100x scale-up without re-tuning shuffle.partitions;
- broadcast threshold raised so star-schema dimension tables (region, nation,
  customer at small SF; any <64 MB dim at scale) broadcast instead of shuffling
  the fact table;
- Arrow enabled for the (rare, clearly-marked) Pandas-UDF paths — everything
  else stays JVM-side in whole-stage codegen.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "projet-data-engineering-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Python workers unpickle mapInPandas/pandas_udf closures by importing
    # this package — make sure they can, wherever the driver was launched.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{existing}" if existing else repo_root
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: coalesce post-shuffle partitions and split skewed joins at
        # runtime — the scale knob that replaces hand-tuning per SF.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        # Dimension tables broadcast (region/nation/supplier/part at test SF;
        # threshold scales to real dims on a cluster).
        .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
        # Arrow for the pandas_udf vector-math paths.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS) which Spark's reader rejects;
        # read as long and convert (io.load_table) — DuckDB likewise truncates
        # nanos to its micro-resolution timestamps, so the engines agree.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()
