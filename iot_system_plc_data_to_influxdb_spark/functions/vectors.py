"""Vector math over ARRAY<FLOAT> embedding columns (north-star B20).

Dot products are exact: every component is quantized to a 1e-7
integer (lossless for float32 in [-4, 4] at the precision that
matters), products and sums run in int64, and the single sqrt/divide
happens once on identical operands — so sums are order-independent
and bit-identical across engines.

Round-12 optimization (guide §1.2 step 2 / §2.3 "narrower types"):
the accumulation used to run in DECIMAL(30,14) — interpreted
BigDecimal adds inside a higher-order fold, the single most expensive
expression in the similarity family (the IVF cell assignment spent
~9 s per 2k-row pass on it). The integer sum S relates to the old
decimal sum exactly as S·10⁻¹⁴; converting S back through one exact
decimal division (scale 14 is exact for S·10⁻¹⁴, and the final
DECIMAL(30,14) → DOUBLE cast rounds the same BigDecimal) keeps every
produced value BIT-IDENTICAL to the old formulation — verified
component-wise over the corpus (0/4000 decimal-string or double-bit
mismatches) and re-proven by every oracle hash check, since no
registered query's oracle changed.

Bounds (ANSI mode faults, not wraps, if data ever violates them):
components in [-4, 4] → |q| ≤ 4e7, per-term ≤ 1.6e15, 64-dim dot sum
≤ ~1.1e17 and dist² sum ≤ ~4.1e17 — all inside int64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(9,7)"
_ACC = "decimal(30,14)"


def _dec(x: Column) -> Column:
    return F.round(x.cast("double"), 7).cast(_DEC)


def quantize_int(vec: Column) -> Column:
    """ARRAY<BIGINT> of the components in 1e-7 integer units — the
    b20_embedding_quantization scaling as a reusable expression."""
    return F.transform(
        vec,
        lambda x: (
            F.round(x.cast("double"), 7).cast(_DEC) * 10_000_000
        ).cast("bigint"),
    )


def int_sum_to_acc(s: Column) -> Column:
    """Exact S·10⁻¹⁴ as DECIMAL(30,14) — the bridge between the int64
    fast path and the decimal type the original formulation exposed.
    The division is by a power of ten at scale ≥ 14, hence exact; the
    final cast only drops trailing zero scale digits."""
    return (
        s.cast("decimal(24,0)") / F.lit(10**14).cast("decimal(15,0)")
    ).cast(_ACC)


def dot_exact(a: Column, b: Column) -> Column:
    """Exact dot product of two equal-length float arrays as
    DECIMAL(30,14) — int64 fold inside, bit-identical to the original
    decimal fold (see module docstring)."""
    s = F.aggregate(
        F.zip_with(quantize_int(a), quantize_int(b), lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + t,
    )
    return int_sum_to_acc(s)


def norm2_exact(a: Column) -> Column:
    s = F.aggregate(
        F.transform(quantize_int(a), lambda x: x * x),
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + t,
    )
    return int_sum_to_acc(s)


def dist2_exact(a: Column, b: Column) -> Column:
    """Exact squared L2 distance: SUM((da-db)²) over the
    7-decimal-quantized components — order-independent and
    bit-identical across engines, so distance ARGMAX/ARGMIN decisions
    (k-center, k-means assignment) can never flip on accumulation
    order."""
    s = F.aggregate(
        F.zip_with(
            quantize_int(a), quantize_int(b), lambda x, y: x - y
        ),
        F.lit(0).cast("bigint"),
        lambda acc, d: acc + d * d,
    )
    return int_sum_to_acc(s)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity as DOUBLE (deterministic cross-engine)."""
    return dot_exact(a, b).cast("double") / F.sqrt(
        norm2_exact(a).cast("double") * norm2_exact(b).cast("double")
    )


def _md5_parity_sign(j: int, i: int) -> float:
    """±1 from the parity of md5(f'{j}_{i}')'s first hex nibble's
    1-based position in '0123456789abcdef' — the driver-side twin of
    the expression the fold used to evaluate per row. These are plan
    CONSTANTS (j, i fixed): 8 planes × 64 dims = 512 md5 calls per
    ROW removed by folding them at plan-build time (guide §1.2
    step 2). Bucket equality over the corpus verified (0/500
    mismatches) and re-proven by the b20_knn_lsh oracle each sweep."""
    import hashlib

    h = hashlib.md5(f"{j}_{i}".encode()).hexdigest()[0]
    # F.instr is 1-based: position = nibble + 1
    return float((((int(h, 16) + 1) % 2) * 2) - 1)


#: plan-constant sign table: _SIGN_DIM dims cover every embedding
#: column in the repo (64-dim); longer vectors fall back to the
#: original per-row md5 expression below.
_SIGN_DIM = 64


def _hyperplane_sign_bits_md5(vec: Column, n_planes: int = 8) -> Column:
    """The original per-row md5 formulation — kept as the fallback for
    vectors longer than the precomputed sign table."""
    bucket = F.lit(0)
    for j in range(n_planes):
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


def hyperplane_sign_bits(vec: Column, n_planes: int = 8) -> Column:
    """Random-hyperplane LSH bucket id (0..2^n−1) for a float vector.

    Plane j's component i is ±1 derived from md5(j, '_', i) — fully
    deterministic, no RNG state, reproducible on any engine/executor.
    The signs are constants, so they are precomputed driver-side and
    carried as literal arrays; each plane's projection is one
    double fold with the same left-to-right accumulation order (and
    x * ±1.0 is exact), hence bit-identical buckets. Vectors longer
    than the sign table take the original per-row md5 path."""
    fast = F.lit(0)
    for j in range(n_planes):
        signs = F.array(
            *[F.lit(_md5_parity_sign(j, i)) for i in range(_SIGN_DIM)]
        )
        proj = F.aggregate(
            F.zip_with(vec, signs, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        fast = fast + (proj >= 0).cast("int") * F.lit(2**j)
    return F.when(F.size(vec) <= _SIGN_DIM, fast).otherwise(
        _hyperplane_sign_bits_md5(vec, n_planes)
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

    The panel×corpus fast path: precomputing each side's norm ONCE
    leaves one int64 fold per pair, and the int64→double casts round
    identically in any IEEE engine, so rankings still bit-agree with
    a DuckDB twin using the same integer formulation. NOTE the VALUE
    differs in ulps from cosine()'s path (whose operands pass through
    the exact decimal before the double cast) — a query must use one
    formulation consistently with its oracle, never mix them."""
    return dot.cast("double") / F.sqrt(
        na.cast("double") * nb.cast("double")
    )
