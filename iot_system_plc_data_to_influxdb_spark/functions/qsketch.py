"""Shared quantile-sketch bucket expressions (B5q × B26).

The mergeable quantile sketch (DDSketch-shaped log2-octave buckets,
merge = bucket-count SUM) is computed by BOTH the batch queries
(plans/relational.b5_quantile_sketch / b5_quantile_windowed_merge) and
the streaming CQ leg (streaming/rollup.quantile_sketch_stream). The
bucketing expressions live HERE, once, and are imported by both, so
batch and stream physically cannot drift — the gopher_stats /
canonical_url pattern.

Bucket id for a positive integer ``cents``: octave ``e = floor(log2
cents)`` (via ``length(bin(cents)) - 1`` — pure integer, no floating
log) and a 2-bit sub-bucket ``sub`` = the two bits below the leading
one. Relative error is bounded by the bucket width: ≤ 25% of the
value. ~60 (e, sub) pairs cover the full bigint range, so per-series
state is bounded at ANY corpus size.

SQL-expr shifts: pyspark's F.shiftright only takes a literal bit
count, but the count here is a column (the octave).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qsketch_octave() -> Column:
    """Octave e = floor(log2(cents)) of the ``cents`` column."""
    return F.expr("length(bin(cents)) - 1")


def qsketch_sub() -> Column:
    """2-bit sub-bucket: the two bits below the leading one of
    ``cents`` (0..3)."""
    return F.expr(
        "shiftright(cents, greatest(length(bin(cents)) - 3, 0)) & 3"
    )


def qsketch_lower_bound() -> Column:
    """Exact integer lower bound of bucket (e, sub) — the value a
    quantile extraction reports for that bucket."""
    return F.expr(
        "CASE WHEN e >= 2 THEN shiftleft(4 + sub, e - 2) ELSE sub END"
    )
