"""Log-structured table tier (io.write_log_delta / read_log_table /
compact_log / write_log_base): exactly-once delta commits, amortized
compaction, crash-leftover tolerance, and the plain-dir fallback."""

import json

import pytest
from pyspark.sql import functions as F

from projet_data_engineering_spark import io


def _delta(spark, root, name, ids):
    df = spark.createDataFrame(
        [(i, f"v{i}", i % 4) for i in ids], ["k", "v", "bucket"]
    )
    io.write_log_delta(df, root, name)


def _view_ids(spark, root):
    return {r["k"] for r in io.read_log_table(spark, root).collect()}


def test_delta_union_and_replay_overwrite(spark, tmp_path):
    """View = union of committed deltas; re-writing the same delta name
    (an at-least-once replay) overwrites instead of duplicating."""
    root = str(tmp_path / "t")
    _delta(spark, root, "a", [1, 2])
    _delta(spark, root, "b", [3])
    assert _view_ids(spark, root) == {1, 2, 3}
    n = io.read_log_table(spark, root).count()
    _delta(spark, root, "b", [3])  # replay
    assert io.read_log_table(spark, root).count() == n


def test_compaction_folds_preserves_view_and_prunes_layout(spark, tmp_path):
    """Past max_deltas the fold produces a bucket-partitioned base holding
    the same rows; folded delta dirs are gone; new deltas stack on top."""
    root = str(tmp_path / "t")
    for i, name in enumerate("abc"):
        _delta(spark, root, name, [10 * i, 10 * i + 1])
    before = _view_ids(spark, root)
    assert io.compact_log(spark, root, "bucket", key="k", max_deltas=2)
    assert _view_ids(spark, root) == before
    children = {
        p.name for p in (tmp_path / "t").iterdir()
    }
    assert "base_1" in children
    assert not any(c.startswith("delta_") for c in children)
    assert any(
        p.name.startswith("bucket=")
        for p in (tmp_path / "t" / "base_1").iterdir()
    )
    # stacking continues: new delta visible alongside the base
    _delta(spark, root, "d", [99])
    assert _view_ids(spark, root) == before | {99}
    # under threshold: no fold
    assert not io.compact_log(spark, root, "bucket", key="k", max_deltas=2)


def test_crash_leftovers_are_ignored_and_cleaned(spark, tmp_path):
    """A crash between base publish and cleanup leaves the old base and
    folded deltas on disk: readers must ignore both (via _folded.json and
    highest-base-wins), and the next compaction removes them."""
    root = str(tmp_path / "t")
    for name in "ab":
        _delta(spark, root, name, [1] if name == "a" else [2])
    assert io.compact_log(spark, root, "bucket", key="k", max_deltas=1)
    # fabricate the crash leftovers: a re-materialized folded delta and a
    # stale lower base that the interrupted cleanup failed to remove
    _delta(spark, root, "a", [1])  # name 'delta_a' is in base_1's folded set
    stale = spark.createDataFrame([(777, "x", 0)], ["k", "v", "bucket"])
    stale.write.partitionBy("bucket").parquet(str(tmp_path / "t" / "base_0"))
    io._write_small_file(spark, str(tmp_path / "t" / "base_0/_folded.json"), "[]")
    assert _view_ids(spark, root) == {1, 2}  # neither leftover is visible
    # next fold cleans both leftovers
    for name in "cde":
        _delta(spark, root, name, [ord(name)])
    assert io.compact_log(spark, root, "bucket", key="k", max_deltas=1)
    children = {p.name for p in (tmp_path / "t").iterdir()}
    assert "base_0" not in children and "delta_a" not in children
    assert _view_ids(spark, root) == {1, 2, ord("c"), ord("d"), ord("e")}


def test_incomplete_delta_without_success_is_invisible(spark, tmp_path):
    """A crash mid-delta-write leaves no _SUCCESS: the reader skips it;
    the replay's overwrite then commits it."""
    root = str(tmp_path / "t")
    _delta(spark, root, "a", [1])
    _delta(spark, root, "torn", [5, 6])
    (tmp_path / "t" / "delta_torn" / "_SUCCESS").unlink()
    assert _view_ids(spark, root) == {1}
    _delta(spark, root, "torn", [5, 6])  # replay heals
    assert _view_ids(spark, root) == {1, 5, 6}


def test_compaction_key_dedup_heals_recommits(spark, tmp_path):
    """A key re-committed by a LATER batch (exact re-arrival) duplicates
    in the raw view; the keyed fold collapses it to one row."""
    root = str(tmp_path / "t")
    _delta(spark, root, "a", [1, 2])
    _delta(spark, root, "b", [2, 3])  # key 2 re-committed
    assert io.read_log_table(spark, root).count() == 4
    assert io.compact_log(spark, root, "bucket", key="k", max_deltas=1)
    assert io.read_log_table(spark, root).count() == 3


def test_plain_dir_fallback_and_mixed_layout_error(spark, tmp_path):
    """A root with no log children reads as plain parquet (the one-shot
    builder layout path); plain data NEXT TO log dirs is a loud error."""
    plain = str(tmp_path / "plain")
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    df.write.parquet(plain)
    assert {r["k"] for r in io.read_log_table(spark, plain).collect()} == {1}
    df.write.mode("append").parquet(plain)  # still plain: fine
    _delta(spark, plain, "x", [9])
    with pytest.raises(ValueError, match="mixed layout"):
        io.read_log_table(spark, plain)


def test_write_log_base_then_stream_deltas(spark, tmp_path):
    """The bulk-build entry: base_1 written by write_log_base serves reads
    directly (partition-pruned scan) and accepts delta stacking; schema
    alignment casts the delta's bucket to the base's inferred type."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"v{i}", i % 4) for i in range(8)], ["k", "v", "bucket"]
    )
    io.write_log_base(df, root, "bucket")
    assert _view_ids(spark, root) == set(range(8))
    plan = (
        io.read_log_table(spark, root)
        .filter(F.col("bucket") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "bucket" in plan.split(
        "PartitionFilters", 1
    )[1], plan
    _delta(spark, root, "x", [100])
    assert _view_ids(spark, root) == set(range(8)) | {100}
    # one canonical schema across base + delta
    assert [
        f.dataType for f in io.read_log_table(spark, root).schema.fields
    ] == [
        f.dataType
        for f in io.read_log_table(spark, root).schema.fields
    ]
    schema = json.loads(
        io._read_small_file(spark, f"{root}/base_1/_schema.json")
    )
    assert {f["name"] for f in schema["fields"]} == {"k", "v", "bucket"}
