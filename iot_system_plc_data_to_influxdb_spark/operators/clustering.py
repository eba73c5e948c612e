"""Distributed k-means over embedding columns (north-star B20/B22).

Embedding-space clustering is the other half of a training-data
curation pipeline (after dedup): cluster the corpus, inspect/score
clusters, drop or re-weight whole regions of embedding space.

Classic distributed Lloyd's iteration, shaped for scale:

- **assign** is map-only: the k×d centroid table is broadcast, every
  vector computes argmin squared-distance locally — no shuffle of the
  corpus, ever.
- **update** is one aggregation: per-dimension partial sums flow
  through a single ``groupBy(cluster, dim)`` (map-side combine makes
  this k·d rows per partition), and only the k×d centroid matrix is
  collected to the driver — never data rows.
- iterations stop when no vector changes cluster (scalar count check)
  or after ``max_iter``.

At 100 TB this is exactly the MLlib/Mahout k-means dataflow; it is
re-implemented here DataFrame-native (higher-order array functions,
no RDDs, no MLlib dependency) so the engine owns the operator.

Init is deterministic: the k lowest ``vec_id`` vectors seed the
centroids, so results are reproducible run-to-run (a property tests
rely on; k-means++ would add a sampling pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec_col, cent_col):
    """Squared euclidean distance between two float arrays."""
    return F.aggregate(
        F.zip_with(vec_col, cent_col, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_assign(
    emb: DataFrame, k: int = 8, max_iter: int = 10, init: str = "first-k"
) -> DataFrame:
    """Lloyd's k-means; returns (vec_id, cluster, sq_dist).

    ``emb`` must have columns ``vec_id`` (unique id) and ``embedding``
    (array<float>). Deterministic given the input. ``init`` is
    ``first-k`` (k lowest vec_ids — cheap, fine for isotropic data) or
    ``kmeans||`` (the Bahmani oversampling sketch below — pays a few
    extra passes to avoid the pathological all-seeds-in-one-cluster
    start).
    """
    spark = emb.sparkSession
    # scale-adaptive fan-out: repartitions only when the scan plans
    # narrower than the session's cores (one-file local inputs)
    from ..catalog import par_floor

    emb = par_floor(emb.select("vec_id", "embedding"), "vec_id").cache()

    if init == "kmeans||":
        centroids = kmeans_pp_init(emb, k=k)
    else:
        centroids = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in emb.orderBy("vec_id").limit(k).collect()
        ]
        centroids = [(i, v) for i, (_, v) in enumerate(centroids)]

    def assign(cents) -> DataFrame:
        cent_df = F.broadcast(
            spark.createDataFrame(cents, "cluster int, cvec array<double>")
        )
        scored = emb.join(cent_df).select(
            "vec_id",
            "embedding",
            "cluster",
            _sq_dist(
                F.col("embedding").cast("array<double>"), F.col("cvec")
            ).alias("sq_dist"),
        )
        best = F.min_by(
            F.struct("cluster", "sq_dist"), F.struct("sq_dist", "cluster")
        ).alias("best")
        return scored.groupBy("vec_id", "embedding").agg(best).select(
            "vec_id",
            "embedding",
            F.col("best.cluster").alias("cluster"),
            F.col("best.sq_dist").alias("sq_dist"),
        )

    assigned = assign(centroids).cache()
    prev_changed = None
    for _ in range(max_iter):
        # update: k×d partial sums via one agg; only the centroid
        # matrix leaves the executors
        new_cents_rows = (
            assigned.select(
                "cluster", F.posexplode("embedding").alias("dim", "v")
            )
            .groupBy("cluster", "dim")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .groupBy("cluster")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", (F.col("s") / F.col("n")).alias("m")))
                ).alias("dm")
            )
            .select("cluster", F.col("dm.m").alias("cvec"))
            .collect()
        )
        new_cents = [
            (int(r["cluster"]), [float(x) for x in r["cvec"]])
            for r in new_cents_rows
        ]
        new_assigned = assign(new_cents).cache()
        changed = (
            new_assigned.alias("n")
            .join(assigned.alias("o"), "vec_id")
            .filter(F.col("n.cluster") != F.col("o.cluster"))
            .count()
        )
        assigned.unpersist()
        assigned = new_assigned
        if changed == 0:
            break
        prev_changed = changed  # noqa: F841 — kept for debuggability

    return assigned.select("vec_id", "cluster", F.round("sq_dist", 6).alias("sq_dist"))


def kmeans_summary(assigned: DataFrame) -> DataFrame:
    """Cluster audit view: size and within-cluster sum of squares."""
    return assigned.groupBy("cluster").agg(
        F.count("*").alias("n_vectors"),
        F.round(F.sum("sq_dist"), 4).alias("wcss"),
    )


def _md5_uniform(prefix, id_col):
    """Deterministic pseudo-uniform in [0, 1): 48 bits of md5(round, id).

    Replaces the RNG draw of k-means|| so the sketch is reproducible
    across runs and engines — same rationale as the md5 hyperplanes in
    functions/vectors.py.
    """
    h = F.md5(F.concat(F.lit(prefix), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("double") / float(16**12)


def kmeans_pp_init(
    emb: DataFrame, k: int = 8, oversample: float = 2.0, rounds: int = 3
) -> list[tuple[int, list[float]]]:
    """k-means|| initialization (Bahmani et al., VLDB'12), deterministic.

    Each round computes every vector's squared distance to its nearest
    center-so-far (map-only over the broadcast center set) and admits
    vectors with probability min(1, l·d²/Σd²), drawn from an md5-keyed
    uniform instead of an RNG. After ``rounds`` passes the ~l·rounds
    candidates are weighted by how many vectors they attract and
    reduced to k centers with greedy weighted k-means++ on the driver —
    only candidate rows (not data) ever leave the executors.
    """
    spark = emb.sparkSession
    emb = emb.select("vec_id", "embedding").cache()
    l = max(1, int(oversample * k))  # noqa: E741 — paper notation

    first = emb.orderBy("vec_id").limit(1).collect()[0]
    centers = [(int(first["vec_id"]), [float(x) for x in first["embedding"]])]

    def d2_to(cents):
        cent_df = F.broadcast(
            spark.createDataFrame(
                [(i, v) for i, (_, v) in enumerate(cents)],
                "cluster int, cvec array<double>",
            )
        )
        return (
            emb.join(cent_df)
            .select(
                "vec_id",
                "embedding",
                _sq_dist(
                    F.col("embedding").cast("array<double>"), F.col("cvec")
                ).alias("d2"),
            )
            .groupBy("vec_id", "embedding")
            .agg(F.min("d2").alias("d2"))
        )

    for r in range(rounds):
        scored = d2_to(centers).cache()
        total = scored.agg(F.sum("d2")).collect()[0][0]
        if not total:
            break  # every vector coincides with a center
        picked = (
            scored.filter(
                _md5_uniform(f"kmpp{r}_", F.col("vec_id"))
                < F.least(F.lit(1.0), F.lit(l) * F.col("d2") / F.lit(total))
            )
            .select("vec_id", "embedding")
            .collect()
        )
        scored.unpersist()
        have = {vid for vid, _ in centers}
        for row in sorted(picked, key=lambda x: int(x["vec_id"])):
            if int(row["vec_id"]) not in have:
                centers.append(
                    (int(row["vec_id"]), [float(x) for x in row["embedding"]])
                )

    # weight candidates by attraction counts (one broadcast-assign pass)
    cent_df = F.broadcast(
        spark.createDataFrame(
            [(i, v) for i, (_, v) in enumerate(centers)],
            "cluster int, cvec array<double>",
        )
    )
    weights_rows = (
        emb.join(cent_df)
        .select(
            "vec_id",
            "cluster",
            _sq_dist(
                F.col("embedding").cast("array<double>"), F.col("cvec")
            ).alias("d2"),
        )
        .groupBy("vec_id")
        .agg(F.min_by("cluster", F.struct("d2", "cluster")).alias("cluster"))
        .groupBy("cluster")
        .count()
        .collect()
    )
    weights = {int(r["cluster"]): int(r["count"]) for r in weights_rows}

    # greedy weighted k-means++ on the (small) candidate set, driver-side
    cand = [
        (w_id, vec, weights.get(i, 0))
        for i, (w_id, vec) in enumerate(centers)
    ]
    cand.sort(key=lambda c: (-c[2], c[0]))  # heaviest first, id tie-break
    chosen = [cand[0]]
    rest = cand[1:]
    while len(chosen) < k and rest:
        def _gain(c):
            d2 = min(
                sum((a - b) * (a - b) for a, b in zip(c[1], ch[1]))
                for ch in chosen
            )
            return (c[2] * d2, -c[0])

        best = max(rest, key=_gain)
        rest.remove(best)
        chosen.append(best)
    return [(i, vec) for i, (_id, vec, _w) in enumerate(chosen)]
