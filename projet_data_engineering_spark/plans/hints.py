"""Size-gated join-strategy hints (VERDICT r8 item 1).

r8 merge-hinted every corpus-derived side of the pair-join family
unconditionally, because Spark's STATIC size estimator propagates the
compressed parquet size through the shingle explode and planned 26.5M-row
tables as broadcasts at sf10 — stacked hash relations OOMed the 8 GB
driver. But the unconditional hint also pins sort-merge at small/medium
corpus sizes where broadcast was measured correct and AQE would have
chosen it (q_dedup_minhash went to 1.70x its r1 anchor — the r8 verdict's
worst line). A join strategy hint is respected by AQE too, so once the
hint is attached the runtime can never convert back.

The gate here restores the decision to the data: the hint is attached
only when the frame's SOURCE parquet bytes (driver-side file listing — no
job, no estimate propagation through explodes) say the corpus is big
enough that ANY derived pair-join side is un-broadcastable. Below the
threshold the plan stays hint-free and the static planner/AQE pick
broadcast exactly as they did pre-r8. Unknown size (in-memory test
frames, non-local filesystems) defaults to MERGE — the scale-safe choice.

Threshold calibration (measured, evidence/bench_hint_gate_r09.json): the
3-gram shingle explode inflates on-disk document bytes ~20x into an
in-heap hash relation, and the recall/curate compositions stack up to six
of them, so an 8 GB driver is safe only while the source stays tens of
MB. 32 MB keeps sf0.1 (0.6 MB) and sf1 (5.7 MB) on the fast broadcast
path and flips sf10 (57 MB) — the measured OOM regime — to sort-merge.
On a real cluster the same decision could be fed by the repo's CMS
join-size sketch (operators/sampling.py:cms_join_size); the file-size
gate is the zero-cost version of that planner input for file-backed
frames.
"""

from __future__ import annotations

import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame

CORPUS_MERGE_THRESHOLD = 32 * 1024 * 1024


def source_bytes(df: DataFrame) -> int | None:
    """Total on-disk bytes of ``df``'s file-source inputs, walking the
    logical plan's scan relations (``inputFiles``). Returns None when the
    size is unknowable from the driver — no file sources (in-memory
    frames) or a non-local filesystem — so callers can fail toward the
    scale-safe strategy."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for uri in files:
        parsed = urlparse(uri)
        if parsed.scheme not in ("", "file"):
            return None
        try:
            # inputFiles() returns %-encoded URIs (spaces etc.); unquote
            # before stat or a decodable path raises OSError and the gate
            # wrongly pins merge on a broadcastable corpus.
            total += os.path.getsize(unquote(parsed.path))
        except OSError:
            return None
    return total


def merge_if_large(
    df: DataFrame,
    threshold: int = CORPUS_MERGE_THRESHOLD,
    size_from: DataFrame | None = None,
) -> DataFrame:
    """Attach a sort-merge hint only when ``df``'s source bytes reach
    ``threshold`` (or are unknown): big/unknown corpora must never be
    broadcast no matter what the estimator thinks, small ones are left
    hint-free so the planner/AQE keep the measured-fast broadcast.

    ``size_from``: frame to SIZE instead of ``df`` — needed because a
    ``persist()`` anywhere under ``df`` makes ``inputFiles()`` return
    empty (the cache manager swaps the analyzed plan's file relation for
    an InMemoryRelation), which would silently read every pair-join side
    as "unknown → hint". Call sites size from the raw docs frame."""
    size = source_bytes(df if size_from is None else size_from)
    if size is None or size >= threshold:
        return df.hint("merge")
    return df


__all__ = ["CORPUS_MERGE_THRESHOLD", "source_bytes", "merge_if_large"]
