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

Round-12 optimization (guide §2.4 "remove shuffles outright"): the
M×K ≤ 64-row centroid relation is COLLECTED and carried as literal
arrays in the plan, so cluster argmin assignment is a map-side fold
per row — no K× candidate blow-up, no groupBy exchange — and the
wide code layout is a single projection of the wide embedding row
(no subvector explode, no pivot aggregation). Every produced value
is bit-identical: the per-candidate ratio r is the same exact-decimal
numerator over the same double division, and a strict ``<`` fold over
candidates in ascending cluster order IS ``min_by(cluster,
struct(r, cluster))``. The Lloyd recompute aggregates element-wise
sums directly (SUBD SUM columns re-assembled into the array) — one
keyed exchange with map-side partial aggregation instead of the old
posexplode → two-level groupBy chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: subspace geometry — 64 dims as 4 × 16
M = 4
SUBD = 16
#: codebook size per subspace (codes are 4 × log2(16) = 16 bits/vec)
K = 16


def _q7(e):
    """The shared 1e-7-integer quantizer (see module docstring)."""
    return (
        F.round(e.cast("double"), 7).cast("decimal(9,7)") * 10_000_000
    ).cast("bigint")


def _qsub(j: int):
    """Quantized subvector j of an ``embedding`` column."""
    return F.transform(F.slice("embedding", j * SUBD + 1, SUBD), _q7)


def pq_subvectors(emb: DataFrame) -> DataFrame:
    """(vec_id, sub, x: array<bigint>) — the 1e-7-integer-quantized
    subvectors, one row per (vector, subspace)."""
    return emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("sub"), _qsub(j).alias("x"))
                    for j in range(M)
                ]
            )
        ).alias("e"),
    ).select("vec_id", "e.sub", "e.x")


def pq_ratio_expr():
    """The exact point-to-centroid score: exact-decimal squared-error
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


def _collect_codebook(cent: DataFrame) -> dict[int, list[tuple]]:
    """Driver-side {sub: [(cluster, sx, n), …] ascending cluster} —
    bounded by M×K ≤ 64 rows, the one intentionally tiny collect on
    the PQ assignment path."""
    by_sub: dict[int, list[tuple]] = {}
    for r in cent.collect():
        by_sub.setdefault(int(r["sub"]), []).append(
            (int(r["cluster"]), [int(v) for v in r["sx"]], int(r["n"]))
        )
    for sub in by_sub:
        by_sub[sub].sort()
    return by_sub


_QSUB_SQL_Q7 = (
    "CAST(CAST(ROUND(CAST({e} AS DOUBLE), 7) AS DECIMAL(9,7))"
    " * 10000000 AS BIGINT)"
)


def _qsub_sql(j: int) -> str:
    """SQL text of ``_qsub(j)`` — identical expression after parsing
    (same ROUND/DECIMAL(9,7)/×1e7 chain)."""
    q7 = _QSUB_SQL_Q7.format(e="e")
    return (
        f"transform(slice(embedding, {j * SUBD + 1}, {SUBD}),"
        f" e -> {q7})"
    )


def _best_cluster(x_sql: str, cands: list[tuple]):
    """argmin cluster over ``cands`` (ascending cluster, strict ``<``
    — exactly ``min_by(cluster, struct(r, cluster))``, r being the
    same pq_ratio_expr arithmetic with the centroid carried as
    literals) as a map-side fold over a literal candidate array:
    zero candidate explode, zero exchange. The point subvector SQL
    text ``x_sql`` is bound ONCE through a 1-element-array aggregate,
    and each candidate's r is computed EXACTLY once into a scores
    array before the cheap argmin fold — interpreted HOFs do no
    common-subexpression elimination, so an r inside the fold step
    would be evaluated twice per candidate.

    Round 12: the whole fold is ONE SQL string handed to a single
    ``F.expr`` — the Column-builder version spent 2-3 s PER QUERY
    CONSTRUCTION in py4j round-trips (hundreds of lambda closures and
    literal structs), dwarfing the sub-second execution; the parsed
    expression tree is identical, so every produced value is
    unchanged (equality re-proven by the oracle sweep)."""
    if not cands:
        return F.lit(None).cast("bigint")
    arr = "array(" + ",".join(
        f"struct({int(c)}L AS cluster,"
        f"array({','.join(str(int(v)) + 'L' for v in sx)}) AS sx,"
        f"{int(n)}L AS n)"
        for c, sx, n in cands
    ) + ")"
    scores = (
        f"transform({arr}, c -> struct(c.cluster AS cluster,"
        " CAST(aggregate(zip_with(bx, c.sx,"
        " (a, b) -> CAST(c.n * a - b AS DECIMAL(19,0))"
        " * CAST(c.n * a - b AS DECIMAL(19,0))),"
        " CAST(0 AS DECIMAL(38,0)), (acc2, t) -> acc2 + t) AS DOUBLE)"
        " / CAST(c.n * c.n AS DOUBLE) AS r))"
    )
    return F.expr(
        f"aggregate(array({x_sql}),"
        " struct(CAST(-1 AS BIGINT) AS cluster,"
        " CAST('Infinity' AS DOUBLE) AS r),"
        f" (acc, bx) -> aggregate({scores}, acc,"
        " (best, c) -> CASE WHEN c.r < best.r THEN c ELSE best END),"
        " acc -> acc.cluster)"
    )


def _assign_col(x_sql: str, by_sub: dict[int, list[tuple]]):
    """CASE over the row's ``sub``: each subspace argmins against its
    own candidate list (one fold per subspace in the plan; only the
    matching branch evaluates per row)."""
    cluster = F.lit(None).cast("bigint")
    for sub in sorted(by_sub):
        cluster = F.when(
            F.col("sub") == sub, _best_cluster(x_sql, by_sub[sub])
        ).otherwise(cluster)
    return cluster


def pq_assign(v: DataFrame, cent: DataFrame) -> DataFrame:
    """argmin cluster per (vec_id, sub) against the collected
    codebook, ties to the smallest cluster id — a pure projection
    (map-side fold), no candidate blow-up, no aggregation exchange."""
    return v.select(
        "vec_id",
        "sub",
        _assign_col("x", _collect_codebook(cent)).alias("cluster"),
    )


def pq_train(v: DataFrame) -> DataFrame:
    """Two deterministic Lloyd iterations per subspace: seeds are the
    subvectors of vec_id < K (count-1 centroids), one reassignment,
    one exact (sum, count) recompute. Returns the codebook relation
    (sub, cluster, sx: array<bigint>, n) — K rows per subspace."""
    seeds_by_sub: dict[int, list[tuple]] = {}
    for r in v.filter(F.col("vec_id") < K).collect():
        seeds_by_sub.setdefault(int(r["sub"]), []).append(
            (int(r["vec_id"]), [int(x) for x in r["x"]], 1)
        )
    for sub in seeds_by_sub:
        seeds_by_sub[sub].sort()
    a1 = v.select(
        "vec_id", "sub", "x",
        _assign_col("x", seeds_by_sub).alias("cluster"),
    )
    return (
        a1.groupBy("sub", "cluster")
        .agg(
            *[
                F.sum(F.element_at("x", i + 1)).alias(f"s{i}")
                for i in range(SUBD)
            ],
            F.count("*").alias("n"),
        )
        .select(
            "sub",
            "cluster",
            F.array(*[F.col(f"s{i}") for i in range(SUBD)]).alias("sx"),
            "n",
        )
    )


def pq_code_cols(cb: DataFrame) -> list:
    """The M wide-code columns (c0..c{M-1} INT) for an ``embedding``
    row, computed map-side against the collected codebook — the one
    code expression shared by the full index build, the delta merge,
    and the tests, so the stored code format cannot drift."""
    by_sub = _collect_codebook(cb)
    return [
        _best_cluster(_qsub_sql(j), by_sub.get(j, []))
        .cast("int")
        .alias(f"c{j}")
        for j in range(M)
    ]


def pq_codes_wide(emb: DataFrame, cb: DataFrame) -> DataFrame:
    """Assign + the WRITTEN code layout (vec_id, c0..c{M-1} int) in
    one map-side projection of the wide embedding row — no subvector
    explode, no pivot aggregation, no exchange. Takes the WIDE
    (vec_id, embedding) relation (round 12: the long subvector form
    only ever fed the pivot this projection replaces)."""
    return emb.select("vec_id", *pq_code_cols(cb))


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
