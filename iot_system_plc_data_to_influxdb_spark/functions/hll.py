"""Shared md5-pinned HyperLogLog expressions (B5 × B26).

One home for the register construction so the batch queries
(plans/relational.py b5_hll_* family) and the streaming CQ leg
(streaming/rollup.hll_register_stream) build REGISTERS FROM THE SAME
EXPRESSION TREE — the qsketch lesson applied to the HLL: duplicated
bucket math is exactly how batch and stream silently drift.

Register j of m=256 = first md5 byte; rho = leading-zero count of the
next 52 bits + 1 (all-zero → 53). Pinned to public md5 so both gate
engines build bit-identical registers; the estimate's integer total
is exact and the single double division maps identical integers to
identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_bucket_rho(df: DataFrame, keycol: str, *carry) -> DataFrame:
    """(bucket, rho) per row for the md5-pinned HLL — plus any carried
    grouping columns (e.g. a day/window column for register tables)."""
    from .text import nibble

    hx = F.md5(F.col(keycol).cast("string"))
    staged = (
        df.select(
            *carry,
            (nibble(F.substring(hx, 1, 1)) * 16
             + nibble(F.substring(hx, 2, 1))).alias("bucket"),
            F.substring(hx, 3, 13).alias("rest"),
        )
        .select(
            *carry,
            "bucket",
            F.length(F.regexp_extract("rest", "^(0*)", 1)).alias("z"),
            "rest",
        )
        .select(
            *carry, "bucket", "z",
            F.expr("substring(rest, z + 1, 1)").alias("c"),
        )
    )
    rho = F.when(F.col("z") == 13, F.lit(53)).otherwise(
        4 * F.col("z")
        + F.when(F.col("c") == "1", 3)
        .when(F.col("c").isin("2", "3"), 2)
        .when(F.col("c").isin("4", "5", "6", "7"), 1)
        .otherwise(0)
        + 1
    )
    return staged.select(*carry, "bucket", rho.alias("rho"))


def hll_estimate(regs: DataFrame) -> DataFrame:
    """(m, n_est) from a register table (bucket, r) — exact-int sum,
    one double division (see b5_hll_deterministic's determinism note)."""
    tot = regs.agg(
        (
            F.sum(F.expr("shiftleft(1L, 53 - r)"))
            + (F.lit(256) - F.count("*")) * F.lit(9007199254740992)
        ).alias("total")
    )
    return tot.select(
        F.lit(256).alias("m"),
        (
            F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(256.0))
            * F.lit(65536.0) * F.lit(9007199254740992.0) / F.col("total")
        ).alias("n_est"),
    )
