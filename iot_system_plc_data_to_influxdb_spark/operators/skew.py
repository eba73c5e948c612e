"""Skew-aware aggregation (100 TB hardening).

A PLC fleet is naturally skewed — one chatty PLC can dominate a key.
AQE's skew-join handling covers joins; for groupBy on a hot key the
standard fix is salting: aggregate on (key, salt) first (spreading the
hot key over N reducers), then merge the partials. Works for any
algebraic aggregate; results are identical to the unsalted plan
(tests/test_operators.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted groupBy.

    ``aggs`` maps output name → (partial_expr, merge_expr) where the
    partial runs over (keys + salt) and the merge combines partials per
    key, e.g. ``{"n": (F.count("*"), F.sum("n")), "s": (F.sum("v"),
    F.sum("s")), "mx": (F.max("v"), F.max("mx"))}``.
    """
    salted = df.withColumn(
        "_salt", (F.abs(F.hash(F.monotonically_increasing_id())) % n_salts)
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )
