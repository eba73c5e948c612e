"""Runnable link-graph analytics demo: the four graph algorithms on
one crawl graph, chained into a per-page frontier profile.

    python examples/link_graph_demo.py

The question a crawl/dedup planner asks of a link graph, in order:

1. influence  — fixed-point PageRank (who is worth crawling first),
2. cohesion   — per-page triangle counts (is the neighborhood a
                link ring / spam clique or an honest hub),
3. backbone   — the k-core (is the page inside the densely-linked
                web or dangling off its edge),
4. community  — label propagation (which shard/community the page
                belongs to — the partition key for per-community
                dedup),

then joins all four into one profile table and prints the pages an
operator would actually look at: the highest-ranked pages OUTSIDE
the 4-core (influential but weakly embedded — the classic
link-spam / isolated-hub review queue).

Every step is a registered query with a DuckDB oracle; this script
chains them the way a crawl operator would.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from iot_system_plc_data_to_influxdb_spark import plans  # noqa: E402
from iot_system_plc_data_to_influxdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    spark = get_spark("link-graph-demo")
    qs = plans.all_queries()

    pr = qs["b19_pagerank"](spark, SF_DIR)
    tri = qs["b19_triangle_count"](spark, SF_DIR)
    core = qs["b19_kcore"](spark, SF_DIR)
    lpa = qs["b19_label_propagation"](spark, SF_DIR)

    profile = (
        pr.join(tri, "doc_id", "left")
        .join(core.withColumnRenamed("core_deg", "core4_deg"), "doc_id", "left")
        .join(lpa, "doc_id", "left")
        .select(
            "doc_id",
            "rank_fp",
            "out_deg",
            F.coalesce("n_tri", F.lit(0)).alias("n_tri"),
            F.col("core4_deg").isNotNull().alias("in_4core"),
            "label",
            "community_size",
        )
    )

    print("\n=== per-page link profile (top by PageRank) ===")
    profile.orderBy(F.col("rank_fp").desc(), "doc_id").show(10)

    print("=== review queue: influential pages OUTSIDE the 4-core ===")
    profile.filter(~F.col("in_4core")).orderBy(
        F.col("rank_fp").desc(), "doc_id"
    ).show(10)

    print("=== community size distribution (top communities) ===")
    lpa.groupBy("label").agg(
        F.count("*").alias("n_pages")
    ).orderBy(F.col("n_pages").desc(), "label").show(5)

    n = profile.count()
    in_core = profile.filter(F.col("in_4core")).count()
    print(f"{n} pages profiled; {in_core} inside the 4-core, "
          f"{n - in_core} in the review queue")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
