"""Streaming near-dup ingest (streaming/dedup_ingest.py): end-to-end stream
semantics against hand-computed ground truth, replay idempotence, and
crash-window recovery of the state writes."""

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from projet_data_engineering_spark.io import read_log_table
from projet_data_engineering_spark.streaming import dedup_ingest as di

T1 = "alpha beta gamma delta epsilon zeta"
T2 = "one two three four five six seven"
T3 = "red orange yellow green blue indigo violet"
T4 = "north south east west up down strange charm"

B0 = [(1, T1), (4, T1), (7, T2)]          # 4 drops within (dup of 1)
B1 = [(2, T1), (5, T3)]                   # 2 drops cross (dup of accepted 1)
B2 = [(3, T2), (8, T3), (11, T4), (14, T4)]  # 3, 8 cross; 14 within (11<14)
EXPECTED = {1, 7, 5, 11}

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _accepted_ids(spark, path):
    return {r["doc_id"] for r in read_log_table(spark, path).collect()}


def _state_ids(spark, state):
    return {
        r["doc_id"]
        for r in read_log_table(spark, f"{state}/wordsets").collect()
    }


@pytest.mark.slow
def test_stream_dedup_ingest_end_to_end(spark, tmp_path):
    """The real stream (3 ordered micro-batch files) produces exactly the
    hand-computed greedy-ingest acceptance, the state tracks accepted docs
    only, and re-running over the same checkpoint changes nothing."""
    import time

    src = tmp_path / "src"
    for k, rows in enumerate((B0, B1, B2)):
        _df(spark, rows).coalesce(1).write.parquet(str(src / f"b{k}"))
        time.sleep(0.05)

    def run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "*.parquet")
            .parquet(str(src) + "/*")
        )
        di.run_stream_dedup_ingest(
            stream,
            str(tmp_path / "state"),
            str(tmp_path / "accepted"),
            str(tmp_path / "chk"),
        )

    run()
    assert _accepted_ids(spark, str(tmp_path / "accepted")) == EXPECTED
    assert _state_ids(spark, str(tmp_path / "state")) == EXPECTED
    bands = read_log_table(spark, str(tmp_path / "state" / "bands"))
    assert {r["doc_id"] for r in bands.select("doc_id").distinct().collect()} == EXPECTED

    run()  # same checkpoint: no new files, nothing changes
    assert _accepted_ids(spark, str(tmp_path / "accepted")) == EXPECTED
    assert _state_ids(spark, str(tmp_path / "state")) == EXPECTED


def _ingest(spark, tmp_path, rows, sub=""):
    di.dedup_ingest_batch(
        _df(spark, rows),
        str(tmp_path / f"state{sub}"),
        str(tmp_path / f"accepted{sub}"),
    )


@pytest.mark.slow
def test_dedup_ingest_batch_replay_idempotent(spark, tmp_path):
    """Replaying a fully-committed batch (at-least-once redelivery) is a
    no-op: accepted docs match only THEMSELVES in the state, and the
    self-match filter plus idempotent merges keep table and state fixed."""
    for rows in (B0, B1, B2):
        _ingest(spark, tmp_path, rows)
    acc = _accepted_ids(spark, str(tmp_path / "accepted"))
    assert acc == EXPECTED
    n_rows = read_log_table(spark, str(tmp_path / "accepted")).count()

    _ingest(spark, tmp_path, B2)  # replay
    assert _accepted_ids(spark, str(tmp_path / "accepted")) == EXPECTED
    assert read_log_table(spark, str(tmp_path / "accepted")).count() == n_rows
    assert _state_ids(spark, str(tmp_path / "state")) == EXPECTED


@pytest.mark.slow
def test_dedup_ingest_crash_window_replay(spark, tmp_path, monkeypatch):
    """Kill the batch after each successive state write (accepted-but-no-
    bands, bands-but-no-wordsets): the error propagates (so the stream
    would replay), and the replayed batch converges to the same final
    table/state as an uninterrupted run."""
    for sub in ("", "_clean"):
        _ingest(spark, tmp_path, B0, sub)
    _ingest(spark, tmp_path, B1, "_clean")
    _ingest(spark, tmp_path, B2, "_clean")

    real = di.write_log_delta
    for crash_at in (2, 3):  # 1=accepted, 2=bands, 3=wordsets delta
        calls = {"n": 0}

        def boom(*a, _real=real, _at=crash_at, _c=calls, **kw):
            _c["n"] += 1
            if _c["n"] == _at:
                raise RuntimeError("injected crash")
            return _real(*a, **kw)

        monkeypatch.setattr(di, "write_log_delta", boom)
        rows = B1 if crash_at == 2 else B2
        try:
            _ingest(spark, tmp_path, rows)
            raise AssertionError("injected crash did not propagate")
        except RuntimeError as e:
            assert "injected crash" in str(e)
        monkeypatch.setattr(di, "write_log_delta", real)
        _ingest(spark, tmp_path, rows)  # replay

    assert _accepted_ids(spark, str(tmp_path / "accepted")) == EXPECTED
    assert _state_ids(spark, str(tmp_path / "state")) == EXPECTED
    # state equals the uninterrupted run's state, row-for-row
    for art in ("bands", "wordsets"):
        got = read_log_table(spark, str(tmp_path / "state" / art))
        want = read_log_table(spark, str(tmp_path / "state_clean" / art))
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0


@pytest.mark.slow
def test_dedup_ingest_dropped_docs_never_enter_state(spark, tmp_path):
    """A doc dropped as a near-dup leaves no trace in bands/wordsets — the
    state is the ACCEPTED corpus's signatures, so later arrivals are never
    compared against rejected documents."""
    _ingest(spark, tmp_path, B0)
    _ingest(spark, tmp_path, B1)
    assert _state_ids(spark, str(tmp_path / "state")) == {1, 7, 5}
    bands = read_log_table(spark, str(tmp_path / "state" / "bands"))
    assert {r["doc_id"] for r in bands.select("doc_id").distinct().collect()} == {1, 7, 5}


@pytest.mark.slow
def test_bootstrap_batch_built_state_then_stream(spark, tmp_path):
    """ADVICE r6 (medium): ``build_dedup_state``'s bands artifact must carry
    the same ``_pk`` merge key the streaming refresher upserts on — the
    module workflow is "batch-build the corpus state once, stream on top",
    and before the fix the first streamed merge died with
    AnalysisException (cannot resolve o._pk)."""
    from projet_data_engineering_spark.operators.dedup import build_dedup_state

    state = str(tmp_path / "state")
    corpus = _df(spark, [(1, T1), (7, T2)])  # an already-deduped corpus
    build_dedup_state(corpus, state)
    assert "_pk" in read_log_table(spark, f"{state}/bands").columns

    # stream two micro-batches on top of the batch-built state
    di.dedup_ingest_batch(_df(spark, B1), state, str(tmp_path / "accepted"))
    di.dedup_ingest_batch(_df(spark, B2), state, str(tmp_path / "accepted"))

    # 2 drops (dup of corpus doc 1), 3 drops (dup of corpus doc 7),
    # 8 drops (dup of streamed-accepted 5), 14 drops within-batch vs 11
    assert _accepted_ids(spark, str(tmp_path / "accepted")) == {5, 11}
    assert _state_ids(spark, state) == {1, 7, 5, 11}
    bands = read_log_table(spark, f"{state}/bands")
    assert {r["doc_id"] for r in bands.select("doc_id").distinct().collect()} == {1, 7, 5, 11}
    # merge key consistency: one row per (doc, band_idx) across both writers
    assert (
        bands.groupBy("doc_id", "band_idx").count().filter("count > 1").count()
        == 0
    )
