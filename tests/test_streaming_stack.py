"""Composed streaming serving stack (streaming/stack.py): the four state
refreshers + drift monitor driven as ONE program over one micro-batch
stream, with injected crashes at stage boundaries. Each stage's isolated
proofs (replay, kill-window, scratch parity) live in their own test files;
this file proves the COMPOSITION converges: a run that crashes between
stages and replays (what the streaming checkpoint does) must end in
exactly the state of a run that never crashed, and full redelivery of
every batch must change nothing."""

import time

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

import pytest

from projet_data_engineering_spark.io import read_log_table
from projet_data_engineering_spark.streaming import stack as st

T1 = "alpha beta gamma delta epsilon zeta"
T2 = "one two three four five six seven"
T3 = "red orange yellow green blue indigo violet"
T4 = "north south east west up down strange charm"

# same acceptance fixture as test_streaming_dedup: 4 dup-of-1 within b0;
# 2 dup-of-accepted-1 cross in b1; 3, 8 cross and 14 within in b2
B0 = [(1, T1), (4, T1), (7, T2)]
B1 = [(2, T1), (5, T3)]
B2 = [(3, T2), (8, T3), (11, T4), (14, T4)]
ACCEPTED = {1, 7, 5, 11}

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)

ARTIFACTS = [
    "accepted",
    "dedup_state/bands",
    "dedup_state/wordsets",
    "dedup_state/stats",
    "bm25/postings",
    "bm25/vocab",
    "bm25/docstats",
    "bm25/stats",
    "ivf/centroids",
    "ivf/assignments",
    "pq/codes",
    "drift_baseline/bins",
    "drift_baseline/range",
    "drift_report",
]


def _emb(i: int) -> list[float]:
    return [((i * 31 + j * 7) % 97) / 97.0 for j in range(64)]


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, t, _emb(i)) for i, t in rows], SCHEMA
    )


def _snapshot(spark, base: str) -> dict:
    out = {}
    for art in ARTIFACTS:
        rows = read_log_table(spark, f"{base}/{art}").collect()
        out[art] = sorted(
            tuple(sorted(r.asDict(recursive=True).items())) for r in rows
        )
    return out


def _run(spark, base: str, plan) -> None:
    """plan: list of (batch_rows, batch_id, fail_after-or-None) steps."""
    for rows, bid, fail_after in plan:
        if fail_after is None:
            st.stack_ingest_batch(_df(spark, rows), base, bid)
        else:
            with pytest.raises(st.InjectedCrash):
                st.stack_ingest_batch(
                    _df(spark, rows), base, bid, fail_after=fail_after
                )


@pytest.mark.slow
def test_stack_kill_windows_converge_and_redelivery_is_idempotent(
    spark, tmp_path
):
    control = str(tmp_path / "control")
    _run(spark, control, [(B0, 0, None), (B1, 1, None), (B2, 2, None)])
    want = _snapshot(spark, control)

    # sanity on the converged composed state itself
    acc = {r["doc_id"] for r in read_log_table(spark, f"{control}/accepted").collect()}
    assert acc == ACCEPTED
    ivf_ids = {
        r["vec_id"]
        for r in spark.read.parquet(f"{control}/ivf/assignments").collect()
    }
    pq_ids = {
        r["vec_id"] for r in spark.read.parquet(f"{control}/pq/codes").collect()
    }
    assert ivf_ids == pq_ids == ACCEPTED  # duplicates never reach an index
    docstats_ids = {
        r["doc_id"] for r in spark.read.parquet(f"{control}/bm25/docstats").collect()
    }
    assert docstats_ids == ACCEPTED
    reports = spark.read.parquet(f"{control}/drift_report").collect()
    assert {r["batch_id"] for r in reports} == {0, 1, 2}

    # crash at two different stage boundaries, replay each batch as the
    # streaming checkpoint would, end state must be byte-identical
    crashed = str(tmp_path / "crashed")
    _run(
        spark,
        crashed,
        [
            (B0, 0, None),
            (B1, 1, "bm25"),  # dies after search index, before ann/pq/drift
            (B1, 1, None),    # checkpoint replay
            (B2, 2, "pq"),    # dies after compression tier, before drift
            (B2, 2, None),
        ],
    )
    assert _snapshot(spark, crashed) == want

    # full redelivery of every batch on the CONVERGED state: no-op
    _run(spark, control, [(B0, 0, None), (B1, 1, None), (B2, 2, None)])
    assert _snapshot(spark, control) == want


@pytest.mark.slow
def test_stack_runner_end_to_end_matches_manual_drive(spark, tmp_path):
    """run_stream_stack over a real file stream (one file per trigger)
    produces the same composed state as driving stack_ingest_batch by
    hand, and the served search tier equals a from-scratch index build
    over the final accepted corpus."""
    from projet_data_engineering_spark.operators.search import (
        bm25_serve,
        build_search_index,
    )

    src = tmp_path / "src"
    for k, rows in enumerate((B0, B1, B2)):
        _df(spark, rows).coalesce(1).write.parquet(str(src / f"b{k}"))
        time.sleep(0.05)
    streamed = str(tmp_path / "streamed")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(src) + "/*")
    )
    st.run_stream_stack(stream, streamed, str(tmp_path / "ckpt"))

    manual = str(tmp_path / "manual")
    _run(spark, manual, [(B0, 0, None), (B1, 1, None), (B2, 2, None)])
    assert _snapshot(spark, streamed) == _snapshot(spark, manual)

    # search tier scratch parity over the stack's own accepted corpus
    accepted_docs = read_log_table(spark, f"{streamed}/accepted").select(
        "doc_id", "text"
    )
    scratch = str(tmp_path / "scratch_idx")
    build_search_index(accepted_docs, "doc_id", "text", scratch, n_buckets=16)
    terms = ["alpha", "seven", "strange"]
    got = {
        (r["doc_id"], r["score"])
        for r in bm25_serve(spark, f"{streamed}/bm25", terms).collect()
    }
    want = {
        (r["doc_id"], r["score"])
        for r in bm25_serve(spark, scratch, terms).collect()
    }
    assert got == want and got
