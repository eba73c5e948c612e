"""A/B the two round-4 connected-components changes at sf0.1.

Variants:
  base   — current code (no large-star distinct, lazy checkpoint)
  dist   — re-add .distinct() after _large_star
  eager  — eager localCheckpoint
  both   — r3 shape (distinct + eager)

Times b19_neardup_clusters end-to-end (noop sink) min-of-3 after one
warm-up, matching bench.py's protocol. Run one variant per process:
    python tools/ab_cc.py base|dist|eager|both
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iot_system_plc_data_to_influxdb_spark.operators import graph  # noqa: E402


def patch(variant: str) -> None:
    orig_large = graph._large_star
    small = graph._small_star
    dist = variant in ("dist", "both")
    eager = variant in ("eager", "both")

    if dist:
        def _large(edges):
            return orig_large(edges).distinct()
    else:
        _large = orig_large

    def connected_components(pairs, max_rounds=30):
        edges = (
            pairs.select(
                F.col(pairs.columns[0]).alias("src"),
                F.col(pairs.columns[1]).alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint()
        )
        prev = None
        rounds = 0
        for _ in range(max_rounds):
            rounds += 1
            new_edges = small(_large(edges)).localCheckpoint(eager=eager)
            chk = new_edges.agg(
                F.count("*").alias("n"),
                F.sum(F.col("src") + F.col("dst")).alias("s"),
            ).first()
            edges = new_edges
            if prev == (chk["n"], chk["s"]):
                break
            prev = (chk["n"], chk["s"])
        adj = graph._adjacency(edges)
        labels = adj.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("component")
        )
        return labels.select(F.col("src").alias("node"), "component"), rounds

    graph.connected_components = connected_components


def main():
    variant = sys.argv[1]
    if variant != "base":
        patch(variant)
    from iot_system_plc_data_to_influxdb_spark import plans
    from iot_system_plc_data_to_influxdb_spark.session import get_spark

    spark = get_spark("ab-cc")
    qs = plans.all_queries()
    fn = qs["b19_neardup_clusters"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def run_once():
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    spark.catalog.clearCache()
    warm = run_once()
    runs = sorted(run_once() for _ in range(3))
    print(
        f"RESULT {variant}: warm={warm:.2f} min={runs[0]:.2f} "
        f"all={[round(r, 2) for r in runs]}"
    )


if __name__ == "__main__":
    main()
