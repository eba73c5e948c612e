"""Round-12 SQL-string fold builders ≡ their pre-optimization shapes.

The optimization round rewrote the map-side argmin/argmax folds (IVF
coarse assignment, PQ cluster assignment) from py4j Column builders to
single SQL strings, and replaced the original crossJoin + window /
broadcast-join + min_by formulations with those folds. The registry
hash checks prove end-to-end value equality per query; these tests pin
the equivalence at the OPERATOR level against straight-line reference
implementations of the r11 shapes, on a deterministic synthetic frame
whose values exercise ties and negatives — so a future edit to the SQL
text cannot drift without a focused failure here.
"""

import sys

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")


def _synth_emb(spark, n=120, dim=64):
    """Deterministic float embeddings with negatives and repeats."""
    return spark.range(n).selectExpr(
        "id AS vec_id",
        f"transform(sequence(1, {dim}), i -> "
        "CAST(CAST(hash(id, i) % 1000000 AS DOUBLE) / 250000.0"
        " AS FLOAT)) AS embedding",
    )


def test_ivf_best_cell_matches_crossjoin_window(spark):
    """The SQL fold's (cell, sim) per row ≡ the r11 crossJoin +
    Window.partitionBy(vec_id) ROW_NUMBER()=1 formulation over the
    same exact-decimal cosine (functions/vectors.cosine)."""
    from iot_system_plc_data_to_influxdb_spark.functions.vectors import (
        cosine,
    )
    from iot_system_plc_data_to_influxdb_spark.operators.similarity import (
        ivf_best_cell,
        ivf_centroids,
    )

    emb = _synth_emb(spark)
    cents = ivf_centroids(emb, n_cells=8)

    got = {
        (int(r["vec_id"]), int(r["b"]["cell"]), float(r["b"]["sim"]))
        for r in emb.select(
            "vec_id", ivf_best_cell(cents).alias("b")
        ).collect()
    }

    cent_df = spark.createDataFrame(
        cents, "cell int, cvec array<float>"
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), "cell"
    )
    ref = {
        (int(r["vec_id"]), int(r["cell"]), float(r["sim"]))
        for r in emb.crossJoin(F.broadcast(cent_df))
        .select(
            "vec_id",
            "cell",
            cosine(F.col("embedding"), F.col("cvec")).alias("sim"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .collect()
    }
    assert got == ref  # winners AND sims bit-identical


def test_pq_assign_matches_broadcast_min_by(spark):
    """The SQL CASE-fold cluster assignment ≡ the r11 broadcast-join +
    groupBy min_by(cluster, struct(r, cluster)) over pq_ratio_expr."""
    from iot_system_plc_data_to_influxdb_spark.functions.pq import (
        pq_assign,
        pq_ratio_expr,
        pq_subvectors,
        pq_train,
    )

    v = pq_subvectors(_synth_emb(spark)).localCheckpoint()
    cb = pq_train(v).localCheckpoint()

    got = {
        (int(r["vec_id"]), int(r["sub"]), int(r["cluster"]))
        for r in pq_assign(v, cb).collect()
    }
    ref = {
        (int(r["vec_id"]), int(r["sub"]), int(r["cluster"]))
        for r in v.join(F.broadcast(cb), "sub")
        .select(
            "vec_id", "sub", "cluster", pq_ratio_expr().alias("r")
        )
        .groupBy("vec_id", "sub")
        .agg(
            F.min_by("cluster", F.struct("r", "cluster")).alias(
                "cluster"
            )
        )
        .collect()
    }
    assert got == ref


def test_pq_code_cols_match_long_assignment(spark):
    """The wide-row code projection (quantized slices inline) ≡ the
    long-form assignment pivoted — the two quantizer texts (_qsub vs
    _qsub_sql) cannot drift."""
    from iot_system_plc_data_to_influxdb_spark.functions.pq import (
        M,
        pq_assign,
        pq_codes_wide,
        pq_subvectors,
        pq_train,
    )

    emb = _synth_emb(spark)
    v = pq_subvectors(emb).localCheckpoint()
    cb = pq_train(v).localCheckpoint()

    got = {
        tuple(int(r[f"c{j}"]) for j in range(M)) + (int(r["vec_id"]),)
        for r in pq_codes_wide(emb, cb).collect()
    }
    long = {
        (int(r["vec_id"]), int(r["sub"])): int(r["cluster"])
        for r in pq_assign(v, cb).collect()
    }
    ref = {
        tuple(long[(vid, j)] for j in range(M)) + (vid,)
        for vid in {k[0] for k in long}
    }
    assert got == ref


@pytest.mark.parametrize("n_parts", [1, 8])
def test_par_floor_is_conditional_and_value_neutral(spark, n_parts):
    """par_floor spreads ONLY narrow inputs (no-op at/above the
    session parallelism) and never changes values."""
    from iot_system_plc_data_to_influxdb_spark.catalog import par_floor

    df = _synth_emb(spark, n=50).repartition(n_parts, "vec_id")
    out = par_floor(df, "vec_id")
    floor = spark.sparkContext.defaultParallelism
    if n_parts >= floor:
        assert out is df  # structural no-op — zero added Exchange
    else:
        assert out.rdd.getNumPartitions() >= min(floor, 50)
    assert {int(r["vec_id"]) for r in out.select("vec_id").collect()} == set(
        range(50)
    )


def test_no_hardcoded_core_count_repartitions():
    """Round-12 sweep guard: no engine query path may hard-code the
    local core count into a repartition — the fan-outs go through
    catalog.par_floor/spread (structural no-ops at scale) or size
    from defaultParallelism / shuffle.partitions. Tools/probes are
    measurement scripts and exempt."""
    import pathlib
    import re

    src_root = (
        pathlib.Path(__file__).resolve().parents[1]
        / "iot_system_plc_data_to_influxdb_spark"
    )
    pat = re.compile(r"\.repartition\(\s*\d+")
    offenders = [
        f"{p.relative_to(src_root)}:{i}"
        for p in sorted(src_root.rglob("*.py"))
        for i, line in enumerate(p.read_text().splitlines(), 1)
        if pat.search(line) and not line.lstrip().startswith("#")
    ]
    assert not offenders, offenders
