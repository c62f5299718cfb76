"""Versioned keyed table with time-travel reads (r8) — the MVCC tier.

A training-data pipeline needs to answer "which EXACT corpus trained run
X" long after the table has moved on. This module is that capability in
its scale-honest shape: a table is an append-only sequence of VERSION
directories, each holding only that version's change set as (op, key,
payload) rows — ``u`` upserts, ``d`` tombstones — and a read AS OF
version v is latest-op-per-key over the union of change sets ≤ v, with
tombstones filtered. Nothing is ever copied forward: writing version N
costs O(|change set N|) whatever the table size, the classic
delta-log/MVCC layout (Delta Lake / Iceberg snapshot model, rebuilt on
plain parquet + the repo's crash-atomic rename publish).

Scale shape: the time-travel read is one window (partitionBy key, orderBy
version desc) over the union of change-set scans — the same single
shuffle a keyed MERGE pays — and ``compact_versions`` folds a version
prefix into one materialized base so the union never grows unboundedly
(read-vs-compacted equivalence is pytest-pinned, and compaction keeps
tombstones: a key deleted in the prefix must stay deleted when later
versions are stacked on top). Version publish is tmp-write + a single
directory rename — readers see a version entirely or not at all; the
version counter is derived from the directory listing, so a crashed
half-write (still ``_tmp``-prefixed, invisible to the lister) is simply
overwritten by the retry.

Reference anchor: the reference re-scrapes into a mutable MongoDB
collection (scraper/main.py) — historical states are unrecoverable there;
this is the layout that makes every ingest reproducible forever.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_data_engineering_spark.io import load_table, spread
from projet_data_engineering_spark.registry import query

_VDIR = re.compile(r"^v(\d+)(?:_b(\d+))?$")


def _fs_list(spark: SparkSession, path: str) -> list[str]:
    """Names of the direct children of ``path`` (empty if absent)."""
    sc = spark.sparkContext
    jvm = sc._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return []
    return [s.getPath().getName() for s in fs.listStatus(hpath)]


def _version_dirs(spark: SparkSession, path: str) -> dict[int, str]:
    """{version: dir name} for every committed version. Only
    fully-published ``v{N}`` / ``v{N}_b{batch}`` dirs count — in-flight
    ``_tmp`` writes are invisible by prefix. The optional ``_b`` suffix is
    the streaming sink's exactly-once marker: one rename commits the
    version AND its micro-batch id."""
    out = {}
    for name in _fs_list(spark, path):
        m = _VDIR.match(name)
        if m:
            out[int(m.group(1))] = name
    return out


def table_versions(spark: SparkSession, path: str) -> list[int]:
    """Committed versions, ascending."""
    return sorted(_version_dirs(spark, path))


def applied_batch_ids(spark: SparkSession, path: str) -> set[int]:
    """Micro-batch ids already committed by the streaming sink (parsed
    from the ``_b`` dir-name suffix — atomically published with the
    version itself)."""
    out = set()
    for name in _version_dirs(spark, path).values():
        m = _VDIR.match(name)
        if m and m.group(2) is not None:
            out.add(int(m.group(2)))
    return out


def _publish(
    df: DataFrame, path: str, version: int, suffix: str = ""
) -> None:
    """Write the change set then make it visible with ONE rename — readers
    observe the version entirely or not at all; a crashed half-write stays
    ``_tmp``-prefixed (never listed) and the retry overwrites it. The
    streaming sink passes ``suffix="_b{batch_id}"`` so the same single
    rename also commits the batch marker."""
    spark = df.sparkSession
    name = f"v{version}{suffix}"
    tmp = f"{path}/_tmp_{name}"
    df.write.mode("overwrite").parquet(tmp)
    sc = spark.sparkContext
    jvm = sc._jvm
    src = jvm.org.apache.hadoop.fs.Path(tmp)
    dst = jvm.org.apache.hadoop.fs.Path(f"{path}/{name}")
    fs = src.getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.rename(src, dst):
        raise RuntimeError(f"version publish failed: {path}/{name}")


def versioned_upsert(df: DataFrame, path: str, key: str) -> int:
    """Commit ``df``'s rows as the next version's upsert change set;
    returns the new version number. O(|df|) regardless of table size."""
    spark = df.sparkSession
    v = (table_versions(spark, path) or [0])[-1] + 1
    _publish(df.withColumn("_op", F.lit("u")), path, v)
    return v


def versioned_delete(keys: DataFrame, path: str, key: str) -> int:
    """Commit tombstones for ``keys`` (a 1-column frame of ``key``) as the
    next version; the payload columns ride as NULLs of the live schema."""
    spark = keys.sparkSession
    dirs = _version_dirs(spark, path)
    vs = sorted(dirs)
    if not vs:
        raise ValueError("cannot delete from an empty versioned table")
    live = spark.read.parquet(f"{path}/{dirs[vs[-1]]}").drop("_op")
    tomb = keys.join(live.limit(0), [key], "left").select(
        *live.columns
    ).withColumn("_op", F.lit("d"))
    _publish(tomb, path, vs[-1] + 1)
    return vs[-1] + 1


def read_version(
    spark: SparkSession, path: str, key: str, version: int | None = None
) -> DataFrame:
    """The table AS OF ``version`` (default: latest): latest op per key
    over the change sets ≤ version, tombstones dropped. One window over
    the unioned scans — the keyed-MERGE shuffle, not a per-version cost."""
    dirs = _version_dirs(spark, path)
    vs = sorted(dirs)
    if version is not None:
        vs = [v for v in vs if v <= version]
    if not vs:
        return spark.range(0).select(F.lit(None).alias(key))
    scans = None
    for v in vs:
        s = spark.read.parquet(f"{path}/{dirs[v]}").withColumn(
            "_v", F.lit(v)
        )
        scans = s if scans is None else scans.unionByName(s)
    w = Window.partitionBy(key).orderBy(F.col("_v").desc())
    return (
        scans.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col("_op") == "u"))
        .drop("_rn", "_op", "_v")
    )


def read_changes(
    spark: SparkSession,
    path: str,
    key: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """CDC feed: the NET per-key change between two versions — (op, _v,
    payload) for every key whose latest op in ``(from_version,
    to_version]`` differs from a no-op. This is what an incremental
    downstream consumer (index refresher, dedup state, CMS partials)
    applies instead of re-reading the table: latest-op-per-key over just
    the range's change sets, the same single window as ``read_version``
    but over a version SLICE. A key upserted then deleted inside the
    range surfaces once, as the delete."""
    dirs = _version_dirs(spark, path)
    vs = [v for v in sorted(dirs) if v > from_version]
    if to_version is not None:
        vs = [v for v in vs if v <= to_version]
    if not vs:
        return spark.range(0).select(
            F.lit(None).alias(key), F.lit(None).alias("_op")
        )
    scans = None
    for v in vs:
        s = spark.read.parquet(f"{path}/{dirs[v]}").withColumn("_v", F.lit(v))
        scans = s if scans is None else scans.unionByName(s)
    w = Window.partitionBy(key).orderBy(F.col("_v").desc())
    return (
        scans.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def compact_versions(
    spark: SparkSession, path: str, key: str, upto: int
) -> None:
    """Fold versions ≤ ``upto`` into one base change set at ``v{upto}``,
    deleting the prefix. Tombstones are KEPT (op='d' rows survive the
    fold) — a key deleted inside the prefix must stay deleted when later
    versions stack on top; only (key, latest-op) per key is retained, so
    the base is bounded by the live-key count, not by history length.
    Reads before and after compaction are pytest-pinned identical.

    Streaming caveat: folding discards the folded versions' ``_b`` batch
    markers, so under ``run_stream_versioned`` only compact versions
    older than the stream's checkpoint horizon — Structured Streaming
    never redelivers batches before the last committed checkpoint."""
    dirs = _version_dirs(spark, path)
    vs = [v for v in sorted(dirs) if v <= upto]
    if len(vs) < 2:
        return
    scans = None
    for v in vs:
        s = spark.read.parquet(f"{path}/{dirs[v]}").withColumn("_v", F.lit(v))
        scans = s if scans is None else scans.unionByName(s)
    w = Window.partitionBy(key).orderBy(F.col("_v").desc())
    base = (
        scans.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_v")
        .localCheckpoint(eager=True)  # sever lineage from the dirs we delete
    )
    sc = spark.sparkContext
    jvm = sc._jvm
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
        sc._jsc.hadoopConfiguration()
    )
    for v in vs:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/{dirs[v]}"), True)
    _publish(base, path, upto)


@query(
    "q_time_travel",
    oracle="""
    WITH v1 AS (
        SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 4 = 0
    ),
    v2_up AS (
        SELECT doc_id, lang, CAST(n_chars + 1 AS BIGINT) AS n_chars
        FROM documents WHERE doc_id % 8 = 0
    ),
    v3_del AS (SELECT doc_id FROM documents WHERE doc_id % 16 = 0),
    asof2 AS (
        SELECT COALESCE(u.doc_id, b.doc_id) AS doc_id,
               COALESCE(u.lang, b.lang) AS lang,
               COALESCE(u.n_chars, b.n_chars) AS n_chars
        FROM v1 b FULL OUTER JOIN v2_up u ON b.doc_id = u.doc_id
    ),
    latest AS (
        SELECT * FROM asof2 WHERE doc_id NOT IN (SELECT doc_id FROM v3_del)
    )
    SELECT 2 AS as_of, doc_id, lang, n_chars FROM asof2
    UNION ALL
    SELECT 3 AS as_of, doc_id, lang, n_chars FROM latest
    """,
)
def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three commits — base load, quality-bump upsert, tombstone delete —
    then the table read AS OF version 2 and AS OF latest, stacked. The
    oracle reconstructs both states relationally, so the hash proves the
    whole MVCC read path: change-set union, latest-op-per-key window,
    tombstone filtering, version pruning. The compaction-equivalence and
    crash-visibility properties live in tests/test_io.py."""
    import shutil
    import tempfile

    d = spread(load_table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "lang", "n_chars"
    )
    root = tempfile.mkdtemp(prefix="time_travel_")
    try:
        t = f"{root}/docs"
        versioned_upsert(d.filter(F.col("doc_id") % 4 == 0), t, "doc_id")
        versioned_upsert(
            d.filter(F.col("doc_id") % 8 == 0).withColumn(
                "n_chars", F.col("n_chars") + F.lit(1)
            ),
            t,
            "doc_id",
        )
        versioned_delete(
            d.filter(F.col("doc_id") % 16 == 0).select("doc_id"), t, "doc_id"
        )
        asof2 = read_version(spark, t, "doc_id", version=2).select(
            F.lit(2).alias("as_of"), "doc_id", "lang", "n_chars"
        )
        latest = read_version(spark, t, "doc_id").select(
            F.lit(3).alias("as_of"), "doc_id", "lang", "n_chars"
        )
        out = asof2.unionByName(latest)
        rows = out.collect()
        return spark.createDataFrame(rows, schema=out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


__all__ = [
    "table_versions",
    "versioned_upsert",
    "versioned_delete",
    "read_version",
    "compact_versions",
    "q_time_travel",
]


@query(
    "q_table_cdc",
    oracle="""
    WITH ups AS (
        SELECT doc_id, lang, CAST(n_chars + 1 AS BIGINT) AS n_chars
        FROM documents WHERE doc_id % 8 = 0
    ),
    dels AS (SELECT doc_id FROM documents WHERE doc_id % 16 = 0)
    SELECT 'd' AS op, 3 AS version, doc_id,
           CAST(NULL AS VARCHAR) AS lang, CAST(NULL AS BIGINT) AS n_chars
    FROM dels
    UNION ALL
    SELECT 'u' AS op, 2 AS version, doc_id, lang, n_chars
    FROM ups WHERE doc_id NOT IN (SELECT doc_id FROM dels)
    """,
)
def q_table_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC slice of the q_time_travel table between version 1 and
    latest: the NET per-key op an incremental consumer applies (a key
    upserted in v2 then tombstoned in v3 surfaces once, as the delete).
    The apply law — read_version(v1) + read_changes(1→latest) ≡
    read_version(latest) — is pinned in tests/test_io.py."""
    import shutil
    import tempfile

    d = spread(load_table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "lang", "n_chars"
    )
    root = tempfile.mkdtemp(prefix="table_cdc_")
    try:
        t = f"{root}/docs"
        versioned_upsert(d.filter(F.col("doc_id") % 4 == 0), t, "doc_id")
        versioned_upsert(
            d.filter(F.col("doc_id") % 8 == 0).withColumn(
                "n_chars", F.col("n_chars") + F.lit(1)
            ),
            t,
            "doc_id",
        )
        versioned_delete(
            d.filter(F.col("doc_id") % 16 == 0).select("doc_id"), t, "doc_id"
        )
        out = read_changes(spark, t, "doc_id", from_version=1).select(
            F.col("_op").alias("op"),
            F.col("_v").alias("version"),
            "doc_id",
            "lang",
            "n_chars",
        )
        rows = out.collect()
        return spark.createDataFrame(rows, schema=out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


__all__.insert(4, "read_changes")
__all__.append("q_table_cdc")
