"""The whole engine, end to end, in one runnable script.

    python examples/full_pipeline.py

Chains the two halves a real deployment runs:

INDUSTRIAL HALF (the reference's own dataflow, composed as ONE
registered + hash-checked query, plans/pipeline.py):
  config scan → active filter → simulated PLC acquisition → address
  parse → type decode (+ null gate) → points table → an InfluxQL
  statement compiled by the B3 gateway compiler (count/mean/min/max
  per 15-minute bucket per measurement/field).

CORPUS HALF (the training-data pipeline, each stage a registered
query):
  curation  — b21_curation_pipeline (exact dedup → quality gate →
              chunking, hash-checked end to end),
  near-dup  — b19_minhash_lsh_neardup (banded LSH candidates),
  retrieval — b20_embedding_audit (per-label norm/dim QA).

Then one cross-half summary: a stage inventory with row counts — the
"did every stage produce data" relation an operator reads first.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from iot_system_plc_data_to_influxdb_spark import plans  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

#: (title, registered query name) — in pipeline order
STAGES = [
    ("PLC ingest→decode→points→InfluxQL downsample", "pipeline_plc_e2e"),
    ("Curation: dedup → quality gate → chunking", "b21_curation_pipeline"),
    ("Near-dup candidates (MinHash LSH)", "b19_minhash_lsh_neardup"),
    ("Embedding audit (per-label QA)", "b20_embedding_audit"),
    (
        "Training funnel: gate → dedup → bounded pack (per-lang report)",
        "pipeline_training_e2e",
    ),
]


def run(spark, sf_dir: str = SF_DIR, show: bool = True) -> dict[str, int]:
    """Run every stage; return {query_name: row_count}. ``show=False``
    for the CI test (counts only, no console tables)."""
    qs = plans.all_queries()
    counts: dict[str, int] = {}
    for title, name in STAGES:
        df = qs[name](spark, sf_dir)
        counts[name] = df.count()
        if show:
            print(f"\n=== {title} ({name}) — {counts[name]} rows ===")
            df.show(5, truncate=False)
    if show:
        print("\npipeline stage inventory:")
        for title, name in STAGES:
            print(f"  {name:32s} {counts[name]:>8d} rows")
        print(
            "\nall stages ran; every relation above is a registered "
            "query with a DuckDB oracle"
        )
    return counts


def main() -> int:
    from iot_system_plc_data_to_influxdb_spark.session import get_spark

    run(get_spark("full-pipeline-demo"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
