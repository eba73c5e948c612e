"""Distributed BPE tokenizer training (north-star B21).

The classic byte-pair-encoding trainer (Sennrich et al. 2016; the
GPT-2/SentencePiece family) as a Spark dataflow:

1. corpus → distinct-word frequency table (ONE shuffle, done once —
   every round after that works on the word table, whose size is the
   vocabulary of the corpus, orders of magnitude under the corpus),
2. per round: adjacent-symbol pair counts weighted by word frequency
   (map-side partial agg → one small shuffle), driver takes the argmax
   with a deterministic tie-break (count desc, pair asc),
3. the winning merge is applied to every word's symbol array as a
   native left-to-right fold (`aggregate` over the un-exploded array —
   map-only, no Python), and the loop repeats.

Per-round cost at 100 TB: the pair aggregate runs over the word table
(≈ millions of rows, not the corpus); the driver receives exactly one
row per round. This is the textbook "iterative algorithm as repeated
small aggregates over a reduced representation" shape — the same
contract as operators/clustering.py (k-means) with a word table in
place of the vector table.

Determinism: counts are exact integers; the argmax tie-break is total;
the greedy fold is the standard leftmost-first merge order — so the
merge sequence is bit-identical run-to-run and equal to the reference
Python implementation (tests/test_bpe.py proves it merge-for-merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, syms) — distinct words with counts and their
    initial single-character symbol arrays."""
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    return words.select("word", "freq", chars.alias("syms"))


def _pair_counts(wt: DataFrame) -> DataFrame:
    pairs = F.when(
        F.size("syms") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("syms") - 2),
            lambda i: F.struct(
                F.get("syms", i).alias("a"), F.get("syms", i + 1).alias("b")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        wt.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("n"))
    )


def apply_merge(syms, a: str, b: str):
    """Leftmost-first greedy merge of adjacent (a, b) → a+b, as a
    native fold over the symbol array."""
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe_table(
    wt: DataFrame, n_merges: int
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Run ``n_merges`` BPE rounds over a (word, freq, syms) table.

    Returns (merge sequence, final word table with merges applied) —
    the second half is what an encoder needs: each DISTINCT word is
    segmented exactly once, and callers join the result back to the
    corpus (the word table is vocabulary-sized, orders of magnitude
    under the corpus).

    Returns (merges, final_wt, base): the BASE word table is cached
    once; each round's merge application stays lazy (a native fold
    stacked on the cached base — recomputing i folds over the
    vocabulary-sized table is far cheaper than a materialize-job per
    round, halving the round job count), so each round costs exactly
    one job: the top-pair collect. ``base`` is the actually-cached
    DataFrame — ``final_wt`` is a derivation of it, so unpersisting
    final_wt is a plan-sameResult no-op; call ``base.unpersist()``
    when done with the returned table.
    """
    base = wt = wt.cache()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(wt)
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append((a, b, n))
        wt = wt.select(
            "word", "freq", apply_merge(F.col("syms"), a, b).alias("syms")
        )
    return merges, wt, base


def train_bpe(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> list[tuple[str, str, int]]:
    """Return the merge sequence [(left, right, weighted_count), ...]."""
    merges, _wt, base = train_bpe_table(
        word_freq_table(docs, text_col), n_merges
    )
    base.unpersist()
    return merges


def bpe_segment(text, merges: list[tuple[str, str, int]]):
    """Segment a text column's words with a trained merge list: the
    same fold applied merge-by-merge in training order (how BPE
    tokenizers apply merges at inference)."""
    word = text  # single-word column expected
    syms = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )
    for a, b, _ in merges:
        syms = apply_merge(syms, a, b)
    return syms
