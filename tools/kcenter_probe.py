"""k-center scaling probe (round-8 verdict #4 "Done =" evidence).

The incremental Gonzalez rewrite carries the running min-distance
column forward, so per-round cost must be FLAT in k (O(N·d) per round,
O(kN) total) — the old shape recomputed against ALL selected centers
and paid O(k²N). This probe measures per-round wall clock (total over
the k-1 selection rounds divided by k-1) at k=4 vs k=16 on the 1x and
10x embedding corpus and prints one JSON line per cell; flat-in-k
per-round cost at BOTH corpus sizes is the pass condition recorded in
STRESS.md.

Usage: python tools/kcenter_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from pyspark.sql import functions as F

    from iot_system_plc_data_to_influxdb_spark.catalog import t
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        b18_kcenter_coreset,
    )
    from iot_system_plc_data_to_influxdb_spark.session import get_spark

    spark = get_spark("kcenter-probe")

    # 10x corpus: 10 shifted copies (ids stay unique; the probe
    # measures cost shape, not the selected set)
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    big_dir = "/tmp/kcenter_probe_10x"
    shutil.rmtree(big_dir, ignore_errors=True)
    big = emb
    for c in range(1, 10):
        big = big.unionAll(
            emb.select(
                (F.col("vec_id") + c * n).alias("vec_id"), "embedding"
            )
        )
    big.write.mode("overwrite").parquet(
        os.path.join(big_dir, "embeddings.parquet")
    )

    for label, d in (("1x", sf_dir), ("10x", big_dir)):
        for k in (4, 16):
            # warm-up at k=2 pays the scan/cache costs once
            b18_kcenter_coreset(spark, d, k=2).collect()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            rows = b18_kcenter_coreset(spark, d, k=k).collect()
            wall = time.perf_counter() - t0
            spark.catalog.clearCache()
            print(json.dumps({
                "corpus": label,
                "k": k,
                "n_vectors": n if label == "1x" else 10 * n,
                "selected": len(rows),
                "total_s": round(wall, 2),
                "per_round_s": round(wall / (k - 1), 3),
            }))
            sys.stdout.flush()
    shutil.rmtree(big_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
