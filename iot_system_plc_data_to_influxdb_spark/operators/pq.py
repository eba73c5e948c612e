"""Product quantization for embedding columns (north-star B20).

PQ is the standard memory-compression layer of vector search (Jégou et
al., "Product Quantization for Nearest Neighbor Search", TPAMI 2011 —
public knowledge): split each d-dim vector into ``m`` subvectors,
k-means each subspace into ``k`` centroids, and store each vector as m
uint8 codes (here 64 floats → 4 codes, a 64× compression). Queries use
asymmetric distance (ADC): one m×k lookup table per probe, then a
map-only scan summing table entries — no decompression.

Scale shape mirrors operators/clustering.py: training collects only
the m·k codebook rows; encoding is a broadcast-join + min_by per
subspace; ADC search broadcasts the (tiny) lookup table inside the
plan and ends in TakeOrderedAndProject. The corpus never shuffles.

Determinism: subspace k-means reuses the deterministic Lloyd's
iteration (first-k or kmeans|| md5-draw init) — same input, same
codebooks, same codes, every run and engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clustering import _sq_dist, kmeans_assign


def _subvector(col, j: int, sub_d: int):
    return F.slice(col, j * sub_d + 1, sub_d)


def pq_train(
    emb: DataFrame, m: int = 4, k: int = 16, max_iter: int = 5
) -> list[list[list[float]]]:
    """Train per-subspace codebooks; returns ``codebooks[j][c] -> vec``
    (m × k × d/m floats — the only thing collected to the driver)."""
    dim = len(emb.select("embedding").first()["embedding"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_d = dim // m
    books = []
    for j in range(m):
        sub = emb.select(
            "vec_id", _subvector(F.col("embedding"), j, sub_d).alias("embedding")
        )
        assigned = kmeans_assign(sub, k=k, max_iter=max_iter)
        cents = (
            assigned.join(sub, "vec_id")
            .select("cluster", F.posexplode("embedding").alias("dim", "v"))
            .groupBy("cluster", "dim")
            .agg(F.avg("v").alias("mv"))
            .groupBy("cluster")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "mv"))
                ).alias("dm")
            )
            .select("cluster", F.col("dm.mv").alias("cvec"))
            .collect()
        )
        by_cluster = {int(r["cluster"]): [float(x) for x in r["cvec"]] for r in cents}
        # clusters that attracted no vectors keep no row — pad with the
        # first centroid so codes stay in [0, k)
        pad = by_cluster[min(by_cluster)]
        books.append([by_cluster.get(c, pad) for c in range(k)])
    return books


def pq_encode(emb: DataFrame, codebooks) -> DataFrame:
    """(vec_id, codes array<int>): map-only assign against the
    broadcast codebooks, one min_by per subspace."""
    spark = emb.sparkSession
    m, sub_d = len(codebooks), len(codebooks[0][0])
    rows = [
        (j, c, codebooks[j][c])
        for j in range(m)
        for c in range(len(codebooks[j]))
    ]
    cb = F.broadcast(
        spark.createDataFrame(rows, "sub int, code int, cvec array<double>")
    )
    subs = emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("sub"),
                        _subvector(F.col("embedding"), j, sub_d)
                        .cast("array<double>")
                        .alias("svec"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("e"),
    ).select("vec_id", "e.sub", "e.svec")
    best = (
        subs.join(cb, "sub")
        .select(
            "vec_id",
            "sub",
            "code",
            _sq_dist(F.col("svec"), F.col("cvec")).alias("d2"),
        )
        .groupBy("vec_id", "sub")
        .agg(F.min_by("code", F.struct("d2", "code")).alias("code"))
    )
    return (
        best.groupBy("vec_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("sub", "code"))).alias("sc")
        )
        .select("vec_id", F.col("sc.code").alias("codes"))
    )


def pq_knn(
    emb: DataFrame,
    codes: DataFrame,
    codebooks,
    probe_vec_id: int,
    k: int = 10,
) -> DataFrame:
    """Asymmetric-distance top-k: build the probe's m×k lookup table on
    the driver (m·k subvector distances — trivial), embed it as a plan
    literal, and scan the codes table summing lut[sub][code]."""
    probe = emb.filter(F.col("vec_id") == probe_vec_id).first()
    if probe is None:
        raise KeyError(f"probe vec_id {probe_vec_id} not found")
    pv = [float(x) for x in probe["embedding"]]
    m, sub_d = len(codebooks), len(codebooks[0][0])
    lut = [
        [
            sum(
                (pv[j * sub_d + i] - cvec[i]) ** 2 for i in range(sub_d)
            )
            for cvec in codebooks[j]
        ]
        for j in range(m)
    ]
    lut_col = F.array(
        *[F.array(*[F.lit(d) for d in row]) for row in lut]
    )
    dist = F.aggregate(
        F.zip_with(
            lut_col,
            F.col("codes"),
            lambda row, c: F.get(row, c),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        codes.filter(F.col("vec_id") != probe_vec_id)
        .select("vec_id", dist.alias("adc_dist"))
        .orderBy("adc_dist", "vec_id")
        .limit(k)
    )
