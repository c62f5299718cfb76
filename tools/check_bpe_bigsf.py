"""Big-SF correctness evidence for the BPE tokenizer family (VERDICT r5
item 2 — mirror of tools/check_cc_bigsf.py for the only remaining rows-only
query with no at-scale independent check).

``q_bpe_encode`` is rows-only at every SF by design (iterative train+apply is
not SQL-expressible) and its pytest parity runs at toy size. Here the family
is checked engine-internally at a real scale factor:

1. TRAIN PARITY — ``bpe_train`` (batched rounds: several provably-safe merge
   rules per Spark job, greedy fold applied JVM-side) must produce the
   IDENTICAL ordered merge table as an independently-written sequential
   python BPE trainer (textbook one-merge-per-round, same count-desc /
   pair-asc tiebreak) run over the same word dictionary. Training re-segments
   EVERY dictionary word each round, so table equality is sequence-level
   evidence over the full vocabulary, not a sampled count check.

2. ENCODE PARITY — a deterministic sample of documents is tokenized by
   ``bpe_encode`` (Arrow mapInPandas, per-distinct-word cache) and by the
   gate's own sequential python encoder using the trained table; per-doc
   token SEQUENCES determine the counts, and the per-doc counts must agree
   exactly (the Spark surface exposes counts; the python side materializes
   the sequences and folds them to counts).

Usage: python tools/check_bpe_bigsf.py [sf_dir] [n_merges] [sample]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def python_bpe_train(word_freqs: dict[str, int], n_merges: int) -> list:
    """Sequential reference trainer: one argmax merge per round over the
    (word, freq) dictionary; count desc, (left, right) asc tiebreak."""
    state: dict[str, tuple[tuple[str, ...], int]] = {
        w: (tuple(w), f) for w, f in word_freqs.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in state.values():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(pair)
        state = {
            w: (python_bpe_apply(syms, *pair), f)
            for w, (syms, f) in state.items()
        }
    return merges


def python_bpe_apply(
    syms: tuple[str, ...], left: str, right: str
) -> tuple[str, ...]:
    """Greedy left-to-right single-rule application (overlaps resolve
    left-first: 'aaa' under (a,a) -> ('aa','a'))."""
    out: list[str] = []
    pend: str | None = None
    for s in syms:
        if pend is not None and pend == left and s == right:
            out.append(pend + s)
            pend = None
        else:
            if pend is not None:
                out.append(pend)
            pend = s
    if pend is not None:
        out.append(pend)
    return tuple(out)


def python_bpe_segment(word: str, merges: list) -> list[str]:
    """Full segmentation of one word under the ordered merge table."""
    syms: tuple[str, ...] = tuple(word)
    for left, right in merges:
        syms = python_bpe_apply(syms, left, right)
    return list(syms)


def check_corpus(d, label: str, n_merges: int, sample: int) -> None:
    from projet_data_engineering_spark.operators.textanalysis import (
        BPE_SEP,
        bpe_encode,
        bpe_train,
    )

    # --- 1. train parity ---------------------------------------------------
    stats: dict = {}
    t0 = time.time()
    spark_merges = bpe_train(d, n_merges=n_merges, stats=stats)
    t_spark = time.time() - t0
    # the same dictionary bpe_train builds (word -> corpus frequency);
    # dictionary-scale (Heaps-law sublinear), collected once for the
    # sequential reference — this is the GATE's cost, not the engine's
    word_freqs = {
        r["w"]: r["freq"]
        for r in d.select(
            F.explode(F.split(F.lower("text"), " ")).alias("w")
        )
        .filter(
            (F.col("w") != "")
            & (F.length("w") >= 2)
            & ~F.col("w").contains(BPE_SEP)
        )
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .collect()
    }
    t0 = time.time()
    ref_merges = python_bpe_train(word_freqs, n_merges)
    t_ref = time.time() - t0
    print(
        f"[{label}] dict_words={len(word_freqs)} merges={len(spark_merges)} "
        f"spark_rounds={stats.get('rounds')} "
        f"t_spark={t_spark:.1f}s t_python={t_ref:.1f}s"
    )
    assert spark_merges == ref_merges, (
        f"merge tables diverge at rank "
        f"{next(i for i, (a, b) in enumerate(zip(spark_merges, ref_merges)) if a != b)}: "
        f"spark={spark_merges} ref={ref_merges}"
    )
    print(f"train parity: {len(spark_merges)} ordered merges identical")

    # --- 2. encode parity on a deterministic doc sample --------------------
    docs = d.orderBy("doc_id").limit(sample).localCheckpoint(eager=True)
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_encode(docs, spark_merges).collect()
    }
    seg_cache: dict[str, int] = {}
    mismatches = 0
    total_tokens = 0
    for row in docs.select("doc_id", "text").collect():
        ws = [w for w in (row["text"] or "").lower().split(" ") if w]
        n_tok = 0
        for w in ws:
            n = seg_cache.get(w)
            if n is None:
                n = len(python_bpe_segment(w, spark_merges))
                seg_cache[w] = n
            n_tok += n
        total_tokens += n_tok
        if got[row["doc_id"]] != (len(ws), n_tok):
            mismatches += 1
            if mismatches <= 5:
                print(
                    f"MISMATCH doc {row['doc_id']}: "
                    f"spark={got[row['doc_id']]} ref=({len(ws)}, {n_tok})"
                )
    print(
        f"encode parity: {len(got)} docs, {total_tokens} tokens, "
        f"{len(seg_cache)} distinct words segmented, "
        f"mismatches={mismatches}"
    )
    assert mismatches == 0, mismatches


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf1.0"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    sample = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    from projet_data_engineering_spark.io import load_table, spread
    from projet_data_engineering_spark.session import get_spark

    spark = get_spark("bpe-bigsf")
    spark.sparkContext.setLogLevel("ERROR")
    d = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    check_corpus(d, "natural", n_merges, sample)

    # The generator's vocabulary is small (tens of words), which caps how
    # hard the NATURAL corpus can stress batched training. Second pass:
    # a bigram-derived corpus — each document rewritten as its word-bigram
    # sequence ('a b c' -> 'a_b b_c') — squares the dictionary (~|V|^2
    # entries) with genuine sf-scale Zipf co-occurrence weights, so the
    # safe-batch/tie-trim logic sees hundreds of close-ranked pairs.
    toks = F.filter(F.split(F.lower("text"), " "), lambda s: s != "")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat_ws(
                    "_", F.element_at(toks, i), F.element_at(toks, i + 1)
                ),
            ),
            " ",
        ),
    ).otherwise(F.lit(""))
    d2 = d.select("doc_id", "lang", bigrams.alias("text")).localCheckpoint(
        eager=True
    )
    check_corpus(d2, "bigram", 2 * n_merges, sample)
    print("bpe-bigsf: OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
