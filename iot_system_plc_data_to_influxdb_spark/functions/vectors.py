"""Vector math over ARRAY<FLOAT> embedding columns (north-star B20).

Dot products run in exact DECIMAL arithmetic (components rounded to 7
decimals — lossless for float32 in [-4, 4] at the precision that
matters) so sums are order-independent and bit-identical across
engines; the single sqrt/divide happens once on identical operands.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(9,7)"
_ACC = "decimal(30,14)"


def _dec(x: Column) -> Column:
    return F.round(x.cast("double"), 7).cast(_DEC)


def dot_exact(a: Column, b: Column) -> Column:
    """Exact-decimal dot product of two equal-length float arrays."""
    prods = F.zip_with(a, b, lambda x, y: _dec(x) * _dec(y))
    return F.aggregate(
        prods,
        F.lit(0).cast(_ACC),
        lambda acc, x: (acc + x).cast(_ACC),
    )


def norm2_exact(a: Column) -> Column:
    return dot_exact(a, a)


def dist2_exact(a: Column, b: Column) -> Column:
    """Exact-decimal squared L2 distance: SUM((da-db)²) over the
    7-decimal-rounded components — order-independent and bit-identical
    across engines, so distance ARGMAX/ARGMIN decisions (k-center,
    k-means assignment) can never flip on accumulation order."""
    diffs = F.zip_with(a, b, lambda x, y: _dec(x) - _dec(y))
    return F.aggregate(
        diffs,
        F.lit(0).cast(_ACC),
        lambda acc, d: (acc + d * d).cast(_ACC),
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity as DOUBLE (deterministic cross-engine)."""
    return dot_exact(a, b).cast("double") / F.sqrt(
        norm2_exact(a).cast("double") * norm2_exact(b).cast("double")
    )


def hyperplane_sign_bits(vec: Column, n_planes: int = 8) -> Column:
    """Random-hyperplane LSH bucket id (0..2^n−1) for a float vector.

    Plane j's component i is ±1 derived from md5(j, '_', i) — fully
    deterministic, no RNG state, reproducible on any engine/executor.
    """
    bucket = F.lit(0)
    for j in range(n_planes):
        # ±1 pseudo-random component per position via md5 parity.
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, i: x.cast("double")
                * (
                    (
                        F.instr(
                            F.lit("0123456789abcdef"),
                            F.substring(
                                F.md5(F.concat(F.lit(f"{j}_"), i.cast("string"))), 1, 1
                            ),
                        )
                        % 2
                    ).cast("double")
                    * 2
                    - 1
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + (proj >= 0).cast("int") * F.lit(2**j)
    return bucket


def quantize_int(vec: Column) -> Column:
    """ARRAY<BIGINT> of the components in 1e-7 integer units — the
    b20_embedding_quantization scaling as a reusable expression."""
    return F.transform(
        vec,
        lambda x: (
            F.round(x.cast("double"), 7).cast(_DEC) * 10_000_000
        ).cast("bigint"),
    )


def dot_int(a: Column, b: Column) -> Column:
    """Exact int64 dot of two 1e-7-unit integer arrays. Per-term
    magnitude ≤ (4e7)² = 1.6e15, 64-dim sum ≤ ~1e17 — inside int64
    (ANSI mode faults, not wraps, if data ever violates the bound)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + t,
    )


def cosine_from_int(dot: Column, na: Column, nb: Column) -> Column:
    """Cosine from integer dot + precomputed integer self-dots.

    The panel×corpus fast path: cosine() runs THREE interpreted
    decimal folds per pair (dot + both norms); precomputing each
    side's norm ONCE leaves one int64 fold per pair, and the
    int64→double casts round identically in any IEEE engine, so
    rankings still bit-agree with a DuckDB twin using the same
    integer formulation. NOTE the VALUE differs in ulps from
    cosine()'s decimal-sum path — a query must use one formulation
    consistently with its oracle, never mix them."""
    return dot.cast("double") / F.sqrt(
        na.cast("double") * nb.cast("double")
    )
