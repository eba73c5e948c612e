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


def kmeans_assign(emb: DataFrame, k: int = 8, max_iter: int = 10) -> DataFrame:
    """Lloyd's k-means; returns (vec_id, cluster, sq_dist).

    ``emb`` must have columns ``vec_id`` (unique id) and ``embedding``
    (array<float>). Deterministic given the input.
    """
    spark = emb.sparkSession
    emb = emb.select("vec_id", "embedding").repartition(32, "vec_id").cache()

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
