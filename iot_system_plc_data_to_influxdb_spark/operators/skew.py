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


def salted_self_join_pairs(
    df: DataFrame,
    bucket_cols: list[str],
    id_col: str = "doc_id",
    n_salts: int = 8,
    hot_threshold: int = 4096,
) -> DataFrame:
    """Within-bucket pair generation (``a.id < b.id``) with hot-bucket
    salting — the LSH band-join hardening.

    A self-join on bucket keys puts a bucket of m rows into ONE reducer
    producing m² pairs; one viral LSH bucket stalls the stage at 100 TB.
    Buckets above ``hot_threshold`` rows are detected with one count
    aggregate (hot keys are few by definition, so their key list
    broadcasts); their probe side is salted by ``hash(id) % n_salts``
    and their build side replicated n_salts times, spreading each hot
    bucket's pairs over n_salts reducers. Cold buckets take the plain
    join. Output is the exact same pair multiset either way — asserted
    against the unsalted join in tests/test_operators.py.

    Returns (d1, d2) with possible duplicates when a pair shares
    several buckets — callers dedupe exactly as with the plain join.
    """

    def _expand_pairs(grouped):
        # ONE shuffle — collect each bucket's ids and expand the
        # ordered pairs natively from the sorted array. Only called on
        # buckets ≤ hot_threshold, so no reducer ever materializes a
        # viral bucket.
        return (
            grouped.groupBy(*bucket_cols)
            .agg(F.sort_array(F.collect_list(id_col)).alias("_ids"))
            .filter(F.size("_ids") >= 2)
            .select(
                F.explode(
                    F.flatten(
                        F.transform(
                            F.col("_ids"),
                            lambda x, i: F.transform(
                                F.slice(
                                    F.col("_ids"),
                                    i + F.lit(2),
                                    F.size(F.col("_ids")) - i - 1,
                                ),
                                lambda y: F.struct(
                                    x.alias("d1"), y.alias("d2")
                                ),
                            ),
                        )
                    )
                ).alias("_p")
            )
            .select("_p.d1", "_p.d2")
        )

    # Hot detection via a bucket-size aggregate whose OUTPUT is tiny
    # (one row per bucket), filtered to the hot few and COLLECTED —
    # hot keys are broadcast-small by definition, so holding them on
    # the driver is the same contract as broadcasting them, and it
    # buys plan-time short-circuits: the common no-hot-bucket case is
    # ONE shuffle total (no anti/semi-join stages, no empty hot-side
    # stages — measured ~2× candidate-stage wall at sf0.1).
    hot_rows = (
        df.groupBy(*bucket_cols)
        .agg(F.count("*").alias("_bn"))
        .filter(F.col("_bn") > hot_threshold)
        .drop("_bn")
        .collect()
    )
    if not hot_rows:
        return _expand_pairs(df)

    # Literal predicate over the collected hot keys (a composite
    # struct comparison) — splits df in a single scan, no join stages.
    # eqNullSafe, not isin: a NULL in any bucket_col makes isin()
    # evaluate to NULL, which would silently drop the row from BOTH
    # the cold and hot sides (groupBy treats NULL as a normal group,
    # so NULL-keyed buckets are legitimate and must route like any
    # other).
    key = F.struct(*[F.col(c) for c in bucket_cols])
    # cast each literal to the source column's type: a NULL literal is
    # VOID-typed and would fail struct <=> struct analysis otherwise
    col_types = {f.name: f.dataType for f in df.schema.fields}
    hot_lits = [
        F.struct(
            *[F.lit(r[c]).cast(col_types[c]) for c in bucket_cols]
        )
        for r in hot_rows
    ]
    hot_pred = F.lit(False)
    for h in hot_lits:
        hot_pred = hot_pred | key.eqNullSafe(h)
    cold_pairs = _expand_pairs(df.filter(~hot_pred))

    # Hot buckets: salted join — probe side split by hash(id) % n_salts,
    # build side replicated n_salts times, spreading each viral
    # bucket's m² pairs over n_salts reducers.
    hot = df.filter(hot_pred)
    hot_a = hot.withColumn(
        "_salt", F.pmod(F.hash(F.col(id_col)), F.lit(n_salts))
    ).alias("a")
    hot_b = hot.withColumn(
        "_rep", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).alias("b")
    cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")) & (
        F.col("a._salt") == F.col("b._rep")
    )
    for c in bucket_cols:
        # eqNullSafe so rows inside a NULL-keyed hot bucket still pair
        cond = cond & F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
    hot_pairs = hot_a.join(hot_b, cond).select(
        F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2")
    )
    return cold_pairs.unionByName(hot_pairs)
