"""Shared Count-Min-sketch bucket expressions (B5 × B26).

One home for the d=4 × w=256 md5 row/bucket mapping so the batch
queries (plans/relational.py b5_cms_* family) and the streaming CQ
leg (streaming/rollup.cms_cell_stream) hash keys through the SAME
expression tree — the qsketch/hll drift-proofing pattern: duplicated
bucket math is exactly how batch and stream silently diverge.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cms_buckets_col() -> Column:
    """Exploded (i, b) struct column: the d=4 Count-Min row/bucket
    pairs of the key column ``u`` — bucket_i(x) = first byte of
    md5('i|' || x)."""
    from .text import nibble

    def bucket(i):
        h = F.md5(F.concat(F.lit(f"{i}|"), F.col("u")))
        return (
            nibble(F.substring(h, 1, 1)) * 16 + nibble(F.substring(h, 2, 1))
        )

    return F.explode(
        F.array(
            *[
                F.struct(F.lit(i).alias("i"), bucket(i).alias("b"))
                for i in range(4)
            ]
        )
    )
