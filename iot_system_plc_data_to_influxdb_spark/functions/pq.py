"""Exact-replay product-quantization folds (B20).

The ONE set of PQ expressions shared by the registered exact-replay
query (plans/northstar.b20_pq_exact_replay) and the written IVF-PQ
index (operators/retrieval.write_ivfpq_index) — one implementation, so
the trained codebooks, assigned codes, and ADC lookup values cannot
drift between the ad-hoc query and the serving layout.

Determinism recipe (the b20_kmeans_exact_replay pattern, per
subspace): 64-dim vectors split M=4 × SUBD=16; every subvector
component is quantized to an exact 1e-7 integer
(round(v,7) → DECIMAL(9,7) → ×1e7 → BIGINT); centroids are carried as
exact (sum-vector, count) pairs, so each point-to-centroid score is an
exact integer numerator over one double division — IDENTICAL IEEE
doubles in Spark and DuckDB — and argmins tie-break on (r, cluster).
Two Lloyd iterations from the deterministic seeds vec_id < K; codes
are the iteration-2 argmins. The ADC distance adds the four subspace
terms in ONE fixed association order — ((t0+t1)+t2)+t3 — so the final
double is engine-identical too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: subspace geometry — 64 dims as 4 × 16
M = 4
SUBD = 16
#: codebook size per subspace (codes are 4 × log2(16) = 16 bits/vec)
K = 16


def pq_subvectors(emb: DataFrame) -> DataFrame:
    """(vec_id, sub, x: array<bigint>) — the 1e-7-integer-quantized
    subvectors, one row per (vector, subspace)."""
    qsub = lambda j: F.transform(  # noqa: E731
        F.slice("embedding", j * SUBD + 1, SUBD),
        lambda e: (
            F.round(e.cast("double"), 7).cast("decimal(9,7)") * 10_000_000
        ).cast("bigint"),
    )
    return emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("sub"), qsub(j).alias("x"))
                    for j in range(M)
                ]
            )
        ).alias("e"),
    ).select("vec_id", "e.sub", "e.x")


def pq_ratio_expr():
    """The exact point-to-centroid score: HUGEINT-exact squared-error
    numerator Σ(n·x_i − sx_i)² over one double division by n² —
    expects columns x (point subvector), sx (centroid sum-vector),
    n (centroid count)."""
    num = F.aggregate(
        F.zip_with(
            F.col("x"),
            F.col("sx"),
            lambda a, b: (F.col("n") * a - b).cast("decimal(19,0)")
            * (F.col("n") * a - b).cast("decimal(19,0)"),
        ),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, term: acc + term,
    )
    return num.cast("double") / (F.col("n") * F.col("n")).cast("double")


def pq_assign(v: DataFrame, cent: DataFrame) -> DataFrame:
    """argmin cluster per (vec_id, sub) against broadcast centroids,
    ties to the smallest cluster id."""
    return (
        v.join(F.broadcast(cent), "sub")
        .select("vec_id", "sub", "cluster", pq_ratio_expr().alias("r"))
        .groupBy("vec_id", "sub")
        .agg(F.min_by("cluster", F.struct("r", "cluster")).alias("cluster"))
    )


def pq_train(v: DataFrame) -> DataFrame:
    """Two deterministic Lloyd iterations per subspace: seeds are the
    subvectors of vec_id < K (count-1 centroids), one reassignment,
    one exact (sum, count) recompute. Returns the codebook relation
    (sub, cluster, sx: array<bigint>, n) — K rows per subspace."""
    seeds = v.filter(F.col("vec_id") < K).select(
        "sub",
        F.col("vec_id").alias("cluster"),
        F.col("x").alias("sx"),
        F.lit(1).cast("bigint").alias("n"),
    )
    a1 = pq_assign(v, seeds)
    return (
        a1.join(v, ["vec_id", "sub"])
        .select("sub", "cluster", F.posexplode("x").alias("dim", "xv"))
        .groupBy("sub", "cluster", "dim")
        .agg(F.sum("xv").alias("s"), F.count("*").alias("cn"))
        .groupBy("sub", "cluster")
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "s"))).alias("ds"),
            F.max("cn").alias("n"),
        )
        .select("sub", "cluster", F.col("ds.s").alias("sx"), "n")
    )


def pq_codes_wide(v: DataFrame, cb: DataFrame) -> DataFrame:
    """Assign + pivot to the WRITTEN code layout (vec_id, c0..c{M-1}
    int) — the one long-to-wide expression shared by the full index
    build, the delta merge, and the tests, so the stored code format
    cannot drift between paths."""
    return (
        pq_assign(v, cb)
        .groupBy("vec_id")
        .agg(
            *[
                F.max(F.when(F.col("sub") == j, F.col("cluster")))
                .cast("int")
                .alias(f"c{j}")
                for j in range(M)
            ]
        )
    )


def pq_adc_topk(
    codes_long: DataFrame, lut: DataFrame, k: int = 10
) -> DataFrame:
    """Asymmetric-distance top-k: join per-(vec, sub) codes to the
    broadcast (sub, cluster, r) lookup table, add the M terms in the
    fixed association order, TakeOrdered by (adc_dist, vec_id)."""
    terms = (
        codes_long.join(F.broadcast(lut), ["sub", "cluster"])
        .groupBy("vec_id")
        .agg(
            *[
                F.max(F.when(F.col("sub") == j, F.col("r"))).alias(f"t{j}")
                for j in range(M)
            ]
        )
    )
    dist = ((F.col("t0") + F.col("t1")) + F.col("t2")) + F.col("t3")
    return (
        terms.select("vec_id", dist.alias("adc_dist"))
        .orderBy("adc_dist", "vec_id")
        .limit(k)
    )
