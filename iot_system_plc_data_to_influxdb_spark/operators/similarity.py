"""Similarity search over embedding columns (north-star B20).

Two strategies:

- ``knn_bruteforce``: broadcast probe ⋈ corpus, exact-decimal cosine,
  distributed top-k (TakeOrderedAndProject). O(N·d) but embarrassingly
  parallel — the correctness baseline.
- ``knn_lsh``: random-hyperplane LSH. Every vector gets a bucket id
  from deterministic md5-derived ±1 hyperplanes; the probe scans only
  buckets within Hamming distance ``probe_radius`` of its own. At
  100 TB the corpus would be written bucket-partitioned so this is
  partition pruning, not a full scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import spread
from ..functions.vectors import cosine, hyperplane_sign_bits


def knn_bruteforce(emb: DataFrame, probe_vec_id: int, k: int = 10) -> DataFrame:
    probe = emb.filter(F.col("vec_id") == probe_vec_id).select(
        F.col("embedding").alias("pe")
    )
    # fan out CPU-bound cosine work when the corpus arrives as one file
    # (scale-adaptive: a no-op once the scan has >= cores natural splits)
    corpus = emb.filter(F.col("vec_id") != probe_vec_id).transform(
        spread("vec_id")
    )
    return (
        corpus.crossJoin(F.broadcast(probe))
        .select("vec_id", cosine(F.col("embedding"), F.col("pe")).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(k)
    )


def _hamming_neighbors(bucket: int, n_planes: int, radius: int) -> list[int]:
    """All bucket ids within Hamming distance `radius` (radius ≤ 2)."""
    out = {bucket}
    if radius >= 1:
        for i in range(n_planes):
            out.add(bucket ^ (1 << i))
    if radius >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                out.add(bucket ^ (1 << i) ^ (1 << j))
    return sorted(out)


def knn_lsh(
    emb: DataFrame,
    probe_vec_id: int,
    k: int = 10,
    n_planes: int = 8,
    probe_radius: int = 1,
) -> DataFrame:
    bucketed = emb.transform(spread("vec_id")).withColumn(
        "bucket", hyperplane_sign_bits(F.col("embedding"), n_planes)
    )
    probe_row = (
        bucketed.filter(F.col("vec_id") == probe_vec_id)
        .select("bucket", F.col("embedding").alias("pe"))
        .first()
    )
    candidates = _hamming_neighbors(probe_row["bucket"], n_planes, probe_radius)
    probe = emb.sparkSession.createDataFrame(
        [(probe_row["pe"],)], "pe array<float>"
    )
    return (
        bucketed.filter(
            (F.col("vec_id") != probe_vec_id) & F.col("bucket").isin(candidates)
        )
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            "bucket",
            F.round(cosine(F.col("embedding"), F.col("pe")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(k)
    )


def write_lsh_bucketed(emb: DataFrame, path: str, n_planes: int = 8) -> None:
    """Materialize the corpus partitioned by LSH bucket id — the
    storage layout behind the "probe reads ~(1+n)/2^b of the data"
    claim. At 100 TB each bucket directory is its own file set, so a
    probe's bucket IN (...) predicate becomes partition pruning: files
    outside the probed buckets are never opened."""
    (
        emb.withColumn("bucket", hyperplane_sign_bits(F.col("embedding"), n_planes))
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(path)
    )


def knn_lsh_bucketed(
    spark,
    path: str,
    probe_vec_id: int,
    k: int = 10,
    n_planes: int = 8,
    probe_radius: int = 1,
) -> DataFrame:
    """knn_lsh against a write_lsh_bucketed corpus: identical results,
    but the candidate filter hits the PARTITION column, so the scan
    prunes to the probed bucket directories (asserted on the physical
    plan in tests/test_bucketing.py)."""
    bucketed = spark.read.parquet(path)
    probe_row = (
        bucketed.filter(F.col("vec_id") == probe_vec_id)
        .select("bucket", F.col("embedding").alias("pe"))
        .first()
    )
    candidates = _hamming_neighbors(int(probe_row["bucket"]), n_planes, probe_radius)
    probe = spark.createDataFrame([(probe_row["pe"],)], "pe array<float>")
    return (
        bucketed.filter(
            (F.col("vec_id") != probe_vec_id) & F.col("bucket").isin(candidates)
        )
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            F.col("bucket").cast("int").alias("bucket"),
            F.round(cosine(F.col("embedding"), F.col("pe")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(k)
    )


def ivf_centroids(emb: DataFrame, n_cells: int = 8) -> list:
    """The deterministic coarse quantizer shared by the batch IVF
    query and the streaming router: the first ``n_cells`` vectors by
    id (at production scale, k-means centroids computed offline).
    Returns driver-side [(cell, [floats])] sorted by cell — O(n_cells)
    rows, the one intentionally tiny collect in this family."""
    return sorted(
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < n_cells).collect()
    )


def _q7_driver(x: float) -> int:
    """Driver-side twin of the 1e-7 quantizer: HALF_UP at 7 decimals
    on the shortest round-trip decimal representation — exactly the
    ROUND(double, 7) → DECIMAL(9,7) chain the in-plan quantizer
    applies (the JVM's BigDecimal.valueOf and Python's repr() produce
    the same shortest decimal)."""
    import decimal

    return int(
        decimal.Decimal(repr(float(x)))
        .scaleb(7)
        .to_integral_value(rounding=decimal.ROUND_HALF_UP)
    )


def ivf_best_cell(centroids: list) -> "F.Column":
    """Map-side coarse quantizer shared by the batch assignment and
    the streaming router: the [(cell, [floats])] centroid table (from
    ``ivf_centroids`` — driver-side by construction, O(n_cells) rows)
    is carried as an ARRAY-OF-STRUCT LITERAL in the plan and folded
    over per row. Assignment is argmax cosine with ties to the
    smallest cell — the fold iterates cells in ascending order with a
    strict ``>``, which is exactly ``ORDER BY sim DESC, cell`` — and
    the cosine is the same exact formulation as
    functions/vectors.cosine (int64 folds bridged through the exact
    decimal), so no engine or leg can drift.

    Round 12 (guide §1.2 step 2): centroids are pre-quantized
    driver-side with their norms constant-folded, and the row's
    quantized vector + norm are computed ONCE (bound through a
    1-element-array aggregate — the interpreted-HOF equivalent of a
    let-binding) — 8 int64 dot folds per row instead of 24
    interpreted decimal folds; each cell's cosine is evaluated
    EXACTLY once (scores land in an array via ``transform``, the
    argmax folds over cheap struct-field reads — a score inside a
    ``when(sim > acc.sim, struct(..sim..))`` step would be evaluated
    twice per cell, interpreted HOFs do no common-subexpression
    elimination). Winners and sims bit-identical to the r11
    crossJoin+window formulation.

    Returns a STRUCT<cell:int, sim:double> column: zero explode, zero
    exchange — at 100 TB the old broadcast-crossJoin + per-vec_id
    window shuffled an 8×-exploded corpus just to take this argmax.

    Round 12: the fold is ONE SQL string handed to a single
    ``F.expr`` — the Column-builder version spent seconds PER QUERY
    CONSTRUCTION in py4j round-trips (lambda closures + literal
    structs per centroid), dwarfing execution; the parsed tree runs
    the same arithmetic, so every produced value is unchanged
    (re-proven by the oracle sweeps)."""
    import decimal as _d

    cents = []
    for cell, vec in sorted(centroids):
        qc = [_q7_driver(x) for x in vec]
        cents.append((int(cell), qc, sum(q * q for q in qc)))
    arr = "array(" + ",".join(
        f"struct({cell} AS cell,"
        f"array({','.join(str(v) + 'L' for v in qc)}) AS qc,"
        f"CAST(CAST('{_d.Decimal(nc).scaleb(-14)}' AS DECIMAL(30,14))"
        " AS DOUBLE) AS ncd)"
        for cell, qc, nc in cents
    ) + ")"
    q_sql = (
        "transform(embedding, x -> CAST(CAST(ROUND(CAST(x AS DOUBLE),"
        " 7) AS DECIMAL(9,7)) * 10000000 AS BIGINT))"
    )

    def acc14(s: str) -> str:
        # functions/vectors.int_sum_to_acc as SQL: exact S·10⁻¹⁴
        return (
            f"CAST(CAST({s} AS DECIMAL(24,0))"
            " / CAST(100000000000000 AS DECIMAL(15,0))"
            " AS DECIMAL(30,14))"
        )

    nad_sql = "CAST(" + acc14(
        "aggregate(transform(q, x -> x * x), CAST(0 AS BIGINT),"
        " (acc, t) -> acc + t)"
    ) + " AS DOUBLE)"
    dot_sql = acc14(
        "aggregate(zip_with(q, c.qc, (x, y) -> x * y),"
        " CAST(0 AS BIGINT), (a, t) -> a + t)"
    )
    scores = (
        f"transform({arr}, c -> struct(c.cell AS cell,"
        f" CAST({dot_sql} AS DOUBLE) / SQRT(nad * c.ncd) AS sim))"
    )
    # q and nad each bound ONCE via nested 1-element-array aggregates
    # (the interpreted-HOF let-binding); ascending cells + strict
    # ``>`` == ORDER BY sim DESC, cell; cosine ∈ [-1, 1] so the -2.0
    # seed always loses to the first cell
    return F.expr(
        f"aggregate(array({q_sql}),"
        " struct(-1 AS cell, CAST(-2.0 AS DOUBLE) AS sim),"
        f" (acc0, q) -> aggregate(array({nad_sql}), acc0,"
        f" (acc, nad) -> aggregate({scores}, acc,"
        " (best, c) -> CASE WHEN c.sim > best.sim"
        " THEN c ELSE best END)))"
    )


def ivf_cell_assignments(emb: DataFrame, centroids: list) -> DataFrame:
    """Assign every vector to its nearest centroid (argmax cosine,
    ties to the smallest cell) — a PURE PROJECTION over the corpus via
    the shared ``ivf_best_cell`` fold. No crossJoin, no window, no
    Exchange anywhere in the plan (guarded in
    tests/test_plans_physical.py): the index-build path stays map-side
    all the way to the ``repartition("cell")`` write clustering."""
    return emb.select(
        "vec_id", "embedding", ivf_best_cell(centroids)["cell"].alias("cell")
    )


def knn_ivf(
    emb: DataFrame,
    probe_vec_id: int,
    k: int = 10,
    n_cells: int = 8,
    n_probe_cells: int = 2,
) -> DataFrame:
    """IVF-flat ANN: coarse quantizer + inverted lists.

    Deterministic centroids (the first ``n_cells`` vectors by id — at
    production scale, k-means centroids computed offline); every vector
    is assigned to its nearest centroid, the probe searches only its
    ``n_probe_cells`` nearest cells. At 100 TB the corpus is written
    partitioned by cell id, so a probe reads ~n_probe/n_cells of the
    data — partition pruning, same as the LSH variant.
    """
    spark = emb.sparkSession
    cents = ivf_centroids(emb, n_cells)
    cent_df = spark.createDataFrame(cents, "cell int, cvec array<float>")
    from ..catalog import par_floor

    assigned = ivf_cell_assignments(par_floor(emb, "vec_id"), cents)
    # probe-cell ranking scores ONLY the probe vector against the
    # centroids (one row × n_cells), never the whole corpus — the
    # corpus-wide assignment fold runs exactly once, inside
    # ivf_cell_assignments (ADVICE r8: the refactor had duplicated it).
    probe_cells = [
        int(r["cell"])
        for r in emb.filter(F.col("vec_id") == probe_vec_id)
        .crossJoin(F.broadcast(cent_df))
        .select(
            "cell",
            cosine(F.col("embedding"), F.col("cvec")).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "cell")
        .limit(n_probe_cells)
        .collect()
    ]
    probe = emb.filter(F.col("vec_id") == probe_vec_id).select(
        F.col("embedding").alias("pe")
    )
    return (
        assigned.filter(
            (F.col("vec_id") != probe_vec_id) & F.col("cell").isin(probe_cells)
        )
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            "cell",
            F.round(cosine(F.col("embedding"), F.col("pe")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(k)
    )


def knn_multi_probe(
    emb: DataFrame, n_probes: int = 8, k: int = 5
) -> DataFrame:
    """Batch kNN: top-k neighbors for each of a SET of probe vectors
    in one corpus pass — the realistic retrieval workload (N queries
    at once), not N sequential scans.

    The probe set broadcasts (KBs); the corpus streams through one
    narrow stage computing all probe similarities per row; per-probe
    top-k is a window rank over (probe_id) — shuffle size is
    n_probes·corpus, pruned to n_probes·k rows immediately. At 100 TB
    the corpus pass is embarrassingly parallel and probe count scales
    to thousands before the broadcast matters.
    """
    from pyspark.sql import Window

    probes = emb.filter(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe")
    )
    corpus = emb.transform(spread("vec_id"))
    scored = (
        corpus.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            cosine(F.col("embedding"), F.col("pe")).alias("cs"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cs").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "probe_id",
            "vec_id",
            F.round("cs", 6).alias("cos_sim"),
            "rk",
        )
    )
