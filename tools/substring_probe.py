"""Substring-dedup scaling probe (round-8 verdict #5 "Done =" row).

b19_substring_dedup discovers candidate doc pairs through RARE
anchor-gram buckets (df in [2, cap]), never all-pairs. This probe
builds a 10x corpus of gram-DISJOINT copies (every token prefixed
with its copy id, so copies share no grams and each copy reproduces
the base corpus's internal duplication exactly) and measures:

  - candidate-pair count: must grow ~LINEARLY (10x) — each copy
    contributes its own pairs, no cross-copy candidates;
  - all-pairs baseline N(N-1)/2: grows 100x — the shape the anchor
    bucketing avoids;
  - wall clock at both sizes.

Usage: python tools/substring_probe.py [sf_dir]
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
        _SUBSTR_DF_CAP,
        _SUBSTR_L,
        b19_substring_dedup,
        tokens,
    )
    from iot_system_plc_data_to_influxdb_spark.session import get_spark

    spark = get_spark("substring-probe")

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    big_dir = "/tmp/substring_probe_10x"
    shutil.rmtree(big_dir, ignore_errors=True)
    big = None
    for c in range(10):
        # prefix every token with the copy id: copies are DISJOINT in
        # gram space, so candidate growth isolates the bucketing shape
        part = docs.select(
            (F.col("doc_id") + c * n).alias("doc_id"),
            F.regexp_replace(
                F.col("text"), r"(^|\s)(\S)", f"$1k{c}$2"
            ).alias("text"),
        )
        big = part if big is None else big.unionAll(part)
    big.write.mode("overwrite").parquet(
        os.path.join(big_dir, "documents.parquet")
    )

    def candidates(d):
        """Replay stages 1-2 (anchors -> distinct candidate pairs)."""
        L = _SUBSTR_L
        dd = (
            t(spark, d, "documents")
            .repartition(32, "doc_id")
            .select("doc_id", tokens(F.col("text")).alias("w"))
            .filter(F.size("w") >= L)
        )
        w = F.col("w")
        grams = dd.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(w) - L),
                    lambda i: F.xxhash64(
                        F.concat_ws(
                            " ", *[F.get(w, i + k) for k in range(L)]
                        )
                    ),
                )
            ).alias("gh"),
        )
        rare = (
            grams.groupBy("gh")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .filter((F.col("nd") >= 2) & (F.col("nd") <= _SUBSTR_DF_CAP))
            .select("gh")
        )
        anch = grams.join(rare, "gh").select("doc_id", "gh").distinct()
        return (
            anch.select(F.col("doc_id").alias("da"), "gh")
            .join(anch.select(F.col("doc_id").alias("db"), "gh"), "gh")
            .filter(F.col("da") < F.col("db"))
            .select("da", "db")
            .distinct()
            .count()
        )

    for label, d, ndocs in (("1x", sf_dir, n), ("10x", big_dir, 10 * n)):
        b19_substring_dedup(spark, d).write.format("noop").mode(
            "overwrite"
        ).save()  # warm-up
        t0 = time.perf_counter()
        out_rows = b19_substring_dedup(spark, d).count()
        wall = time.perf_counter() - t0
        cand = candidates(d)
        print(json.dumps({
            "corpus": label,
            "n_docs": ndocs,
            "candidate_pairs": cand,
            "all_pairs_baseline": ndocs * (ndocs - 1) // 2,
            "result_pairs": out_rows,
            "wall_s": round(wall, 2),
        }))
        sys.stdout.flush()
    shutil.rmtree(big_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
