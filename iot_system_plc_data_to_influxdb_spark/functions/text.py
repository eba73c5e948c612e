"""Text-analysis column functions (north-star B19/B21).

All native Catalyst expressions (split/explode/higher-order functions,
md5) — no Python UDFs — so every operator here has an exact SQL twin
for the DuckDB oracle and stays inside whole-stage codegen at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny English function-word list used by the language/quality
# heuristics (public knowledge; any list works, it just must match the
# oracle literal-for-literal).
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def tokens(text: Column) -> Column:
    """Whitespace tokenization → ARRAY<STRING>."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def shingles(words: Column, n: int = 3) -> Column:
    """Word n-gram shingles: position i → join(words[i:i+n]).

    Docs shorter than n yield one (short) shingle instead of none.
    Built from O(1) element gets (concat_ws skips the NULLs past the
    end) rather than per-position slice+join — cheaper per shingle.
    """
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", *[F.get(words, i + k) for k in range(n)]),
    )


def minhash_cols(shingle_col: Column, k: int = 8) -> list[Column]:
    """k salted-md5 min-hash aggregate expressions over a shingle column.

    MinHash permutation j is emulated by the keyed hash
    ``md5(concat(j, '|', shingle))``; the signature element is the
    lexicographic MIN of the hex digest — identical in any engine with
    md5, which is what makes the whole sketch oracle-checkable.
    """
    return [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), shingle_col))).alias(f"h{j}")
        for j in range(k)
    ]


def nibble(hexchar: Column) -> Column:
    """Hex character → 0..15 (portable: strpos over the hex alphabet)."""
    return F.instr(F.lit("0123456789abcdef"), hexchar) - 1


def token_hash16(token: Column) -> Column:
    """16-bit hash of a token from the first 4 hex chars of md5."""
    h = F.md5(token)
    return (
        nibble(F.substring(h, 1, 1)) * 4096
        + nibble(F.substring(h, 2, 1)) * 256
        + nibble(F.substring(h, 3, 1)) * 16
        + nibble(F.substring(h, 4, 1))
    )


def simhash16(df: DataFrame, id_col: str, token_col: str) -> DataFrame:
    """16-bit SimHash per document from distinct tokens.

    Per bit b: sum over tokens of ±1 by bit b of the token hash; the
    SimHash bit is 1 iff the sum ≥ 0. Emits one row per id with
    ``bit_0..bit_15`` and the packed ``simhash`` value.
    """
    hashed = df.select(id_col, token_hash16(F.col(token_col)).alias("h16"))
    bit_sums = [
        F.sum(
            (F.floor(F.col("h16") / F.lit(2**b)) % 2) * 2 - 1
        ).alias(f"s{b}")
        for b in range(16)
    ]
    sums = hashed.groupBy(id_col).agg(*bit_sums)
    bits = [(F.col(f"s{b}") >= 0).cast("int").alias(f"bit_{b}") for b in range(16)]
    out = sums.select(id_col, *bits)
    packed = sum((F.col(f"bit_{b}") * F.lit(2**b) for b in range(16)), F.lit(0))
    return out.withColumn("simhash", packed)


def stopword_hits(words: Column) -> Column:
    """Number of tokens that are function words (language-ID signal)."""
    return F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))


def gopher_stats(txt: Column, words: Column) -> dict:
    """The Gopher table-A1 rule signals (arXiv:2112.11446) as native
    Columns — shared by the batch query (plans/northstar.py
    b21_gopher_rules) and the streaming ingest gate
    (streaming/curation.py gopher_filter_stream) so the two can never
    drift. Every ratio bound is cross-multiplied into exact integer
    space; the `passes` predicate is the conjunction of: word count in
    [50, 100k], mean word length in [3, 10], symbol-to-word ratio
    (#/ellipsis) <= 0.1, >= 80% alphabetic words, >= 2 stopword hits."""
    n_words = F.size(words).cast("bigint")
    total_len = F.aggregate(
        F.transform(words, F.length),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    alpha_words = F.size(
        F.filter(words, lambda x: x.rlike("[a-z]"))
    ).cast("bigint")
    stop_hits = F.size(
        F.filter(words, lambda x: x.isin(*STOPWORDS))
    ).cast("bigint")
    symbol_hits = (
        (F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit(""))))
        + F.floor(
            (F.length(txt) - F.length(F.replace(txt, F.lit("..."), F.lit(""))))
            / 3
        )
    ).cast("bigint")
    passes = (
        n_words.between(50, 100000)
        & (total_len >= 3 * n_words)
        & (total_len <= 10 * n_words)
        & (10 * symbol_hits <= n_words)
        & (10 * alpha_words >= 8 * n_words)
        & (stop_hits >= 2)
    )
    return {
        "n_words": n_words,
        "total_len": total_len,
        "alpha_words": alpha_words,
        "stop_hits": stop_hits,
        "symbol_hits": symbol_hits,
        "passes": passes,
    }


def surprisal_bits(den: Column, num: Column) -> Column:
    """Integer bit-length surprisal bound: bits(den) − bits(num) where
    bits(n) = length(bin(n)) = floor(log2 n)+1 — within 1 bit of the
    real −log2(num/den) per term and EXACT integer arithmetic, so
    log-domain LM scores hash identically across engines. Shared by
    the batch b21_perplexity_bits query and
    streaming/curation.surprisal_stream (one expression tree — the
    batch and stream legs cannot drift). Both operands must be >= 1
    (callers pass c1+V and c2+1)."""
    return (F.length(F.bin(den)) - F.length(F.bin(num))).cast("bigint")
