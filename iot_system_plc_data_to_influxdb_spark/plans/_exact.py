"""Exact integer-space rounding — the cross-engine determinism core.

ROUND(double, d) is the ONE operation the two gate engines disagree
on: Spark rounds the exact binary expansion via BigDecimal HALF_UP,
DuckDB scales-and-rounds in floating point, and a quotient of
integers that lands exactly on a .5 tie at digit d+1 splits them
(observed in the wild at sf0.001 and sf0.1 for three different
queries). Every rounded ratio of exact integers therefore goes
through these helpers: round-half-up computed entirely in int64
(floor division via pmod — double `/`+floor can cross an integer
boundary on near-integer quotients), then ONE division by 10^d which
maps identical integers to identical doubles in any engine.

Magnitude budget: numerators stay < 2^53 for the test scale factors
(cents sums ≤ ~1e13); a 100 TB deployment widens the same formulas to
DECIMAL(38,0) without changing semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_ratio(num: Column, den: Column, digits: int) -> Column:
    """round-half-up(num/den · 10^digits) / 10^digits for NON-NEGATIVE
    integer columns (den > 0)."""
    scale = 10**digits
    n = 2 * num * scale + den
    d = 2 * den
    return ((n - F.pmod(n, d)) / d).cast("bigint") / float(scale)


def round_ratio_signed(num: Column, den: Column, digits: int) -> Column:
    """Sign-magnitude variant: negative integer division conventions
    (floor vs truncate) differ across engines, so round |num|/den and
    reapply the sign."""
    return F.when(num >= 0, round_ratio(num, den, digits)).otherwise(
        -round_ratio(-num, den, digits)
    )


def sql_round_ratio(num: str, den: str, digits: int) -> str:
    """DuckDB twin of round_ratio (`//` truncates = floors for the
    non-negative operands this is restricted to)."""
    scale = 10**digits
    return f"((2 * ({num}) * {scale} + ({den})) // (2 * ({den}))) / {scale}.0"


def sql_round_ratio_signed(num: str, den: str, digits: int) -> str:
    return (
        f"(CASE WHEN ({num}) >= 0 THEN {sql_round_ratio(num, den, digits)} "
        f"ELSE -{sql_round_ratio(f'-({num})', den, digits)} END)"
    )
