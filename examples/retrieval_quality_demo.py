"""Runnable retrieval/index-quality demo: the embedding audit suite
end to end — the checks an operator runs BEFORE trusting a vector
index on a refreshed corpus.

    python examples/retrieval_quality_demo.py

1. sketch calibration — is MinHash's similarity estimate tracking
   exact Jaccard on THIS corpus (b19_minhash_calibration),
2. index recall    — what does IVF(2-of-8 cells) actually recall
   against brute-force ground truth (b20_ann_recall),
3. cluster health  — which k-means clusters are boundary blobs whose
   membership flips under drift (b20_cluster_margin),
4. result quality  — MMR re-ranking demoting near-duplicate hits
   (b20_mmr_rerank),
5. training pairs  — the contrastive triplets those embeddings would
   be tuned with (b20_triplet_mining).

Every step is a registered query with a DuckDB oracle; this script
chains them the way an index operator would before a rollout.
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
    spark = get_spark("retrieval-quality-demo")
    qs = plans.all_queries()

    cal = qs["b19_minhash_calibration"](spark, SF_DIR)
    print("\n=== 1. MinHash calibration (estimate vs exact, bp) ===")
    cal.select(
        "d1", "d2", (F.col("mh_matches") * 1250).alias("est_bp"), "jac_bp"
    ).orderBy(F.col("jac_bp").desc()).show(5)
    stats = cal.agg(
        F.avg(F.abs(F.col("mh_matches") * 1250 - F.col("jac_bp"))).alias("mae")
    ).first()
    print(f"mean |estimate - exact| = {stats['mae']:.0f} bp")

    print("=== 2. IVF recall@10 vs brute force ===")
    rec = qs["b20_ann_recall"](spark, SF_DIR)
    rec.orderBy("pid").show()
    mean_rec = rec.agg(F.avg("recall_bp")).first()[0]
    print(f"mean recall {mean_rec / 100:.1f}% — near-uniform corpus, "
          "2/8 cells: add probe cells before trusting this index")

    print("=== 3. cluster assignment margins ===")
    qs["b20_cluster_margin"](spark, SF_DIR).orderBy("min_margin").show()

    print("=== 4. MMR diverse top-5 (vs relevance-only order) ===")
    qs["b20_mmr_rerank"](spark, SF_DIR).orderBy("rank").show()

    print("=== 5. contrastive triplets ===")
    qs["b20_triplet_mining"](spark, SF_DIR).orderBy("anchor").show(5)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
