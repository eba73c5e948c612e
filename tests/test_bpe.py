"""Distributed BPE trainer vs a reference Python implementation:
merge-for-merge equality, plus segmentation round-trip invariants."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from iot_system_plc_data_to_influxdb_spark.catalog import t
from iot_system_plc_data_to_influxdb_spark.operators.bpe import (
    bpe_segment,
    train_bpe,
    word_freq_table,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_train_bpe(texts: list[str], n_merges: int):
    """Reference BPE: word-frequency weighted adjacent-pair counts,
    argmax with (count desc, pair asc) tie-break, leftmost-first
    greedy merge — the standard Sennrich et al. procedure."""
    words = Counter()
    for txt in texts:
        for w in re.split(r"\s+", txt.strip().lower()):
            if w:
                words[w] += 1
    table = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for w, syms in table.items():
            f = words[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, n))
        for w, syms in table.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            table[w] = out
    return merges, table


def test_bpe_matches_python_reference(spark):
    docs = t(spark, SF_DIR, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    want_merges, want_table = _py_train_bpe(texts, n_merges=12)

    got = train_bpe(docs, n_merges=12)
    assert got == want_merges

    # applying the learned merges reproduces the reference segmentation
    wt = word_freq_table(docs)
    seg = wt.select("word", bpe_segment(F.col("word"), got).alias("syms"))
    got_table = {r["word"]: list(r["syms"]) for r in seg.collect()}
    assert got_table == want_table


def test_bpe_segmentation_roundtrip(spark):
    """Concatenating a word's BPE symbols reproduces the word, and no
    symbol is empty — for every corpus word."""
    docs = t(spark, SF_DIR, "documents")
    merges = train_bpe(docs, n_merges=6)
    assert 1 <= len(merges) <= 6
    wt = word_freq_table(docs)
    check = wt.select(
        "word",
        bpe_segment(F.col("word"), merges).alias("syms"),
    ).select(
        "word",
        F.array_join("syms", "").alias("joined"),
        F.exists("syms", lambda s: F.length(s) == 0).alias("has_empty"),
    )
    bad = check.filter(
        (F.col("word") != F.col("joined")) | F.col("has_empty")
    ).count()
    assert bad == 0
