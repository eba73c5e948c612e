"""Runnable training-data pipeline demo: the LLM-curation path end to
end, on the engine's own operators.

    python examples/training_data_demo.py

Walks the nightly pipeline a data team runs before a training job:

1. corpus ingest (the driver's documents table),
2. curation — exact dedup → integer quality gate → context-window
   chunking (the oracle-checked `b21_curation_pipeline` plan),
3. dedup at scale — MinHash-LSH near-dup pairs and their connected
   components; SemDeDup semantic pruning over the embedding space;
   duplicated-span localization (which tokens, not just which docs),
4. quality models — linear-classifier keep/drop scoring and bigram-LM
   head/middle/tail terciles,
5. retrieval side — kNN over the embeddings table (brute-force
   baseline + LSH bucketed path),
6. packing + shards — greedy doc→context-window binning, materialized
   as a (lang, bin_id)-partitioned shard tree a trainer prunes into;
   a deterministic epoch shuffle orders the corpus into shards.

Every step is a registered query or operator with its own oracle or
pytest; this script just chains them the way a user would.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    from iot_system_plc_data_to_influxdb_spark.session import get_spark

    import __spark_entry__ as entry
    from iot_system_plc_data_to_influxdb_spark import plans

    spark = get_spark("training-data-demo")
    qs = plans.all_queries()

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    print(f"corpus: {docs.count()} documents from {SF_DIR}")

    chunks = qs["b21_curation_pipeline"](spark, SF_DIR).cache()
    n_docs = chunks.select("doc_id").distinct().count()
    print(
        f"curation: {n_docs} docs survive dedup+quality gate → "
        f"{chunks.count()} training chunks (50-token windows, stride 40)"
    )

    urls = qs["b19_url_dedup"](spark, SF_DIR)
    pr = qs["b19_pagerank"](spark, SF_DIR)
    n_alias = urls.filter("NOT is_canonical").count()
    top = pr.orderBy(pr["rank_fp"].desc()).first()
    print(
        f"crawl front-door: {n_alias} URL aliases collapse onto canonical "
        f"keys before any fetch; PageRank frontier head = doc "
        f"{top['doc_id']} (rank {top['rank_fp']/1e6:.3f})"
    )

    pairs = qs["b19_minhash_lsh_neardup"](spark, SF_DIR)
    clusters = qs["b19_neardup_clusters"](spark, SF_DIR)
    print(
        f"near-dup: {pairs.count()} LSH-verified pairs, "
        f"{clusters.filter('cluster_size > 1').count()} docs in non-trivial "
        "clusters"
    )

    sem = qs["b19_semdedup"](spark, SF_DIR)
    spans = qs["b19_span_dedup"](spark, SF_DIR)
    print(
        f"semantic dedup: {sem.count()} embeddings pruned within k-means "
        f"clusters; span dedup: {spans.count()} duplicated token spans "
        "localized"
    )

    cls = qs["b21_classifier_score"](spark, SF_DIR)
    lm = qs["b21_lm_bigram_fit"](spark, SF_DIR)
    kept = cls.filter("label = 'keep'").count()
    head = lm.filter("ppl_bucket = 1").count()
    print(
        f"quality models: classifier keeps {kept}/{cls.count()} docs; "
        f"LM-fit head tercile holds {head} docs"
    )

    knn = qs["b20_knn_bruteforce"](spark, SF_DIR)
    print("retrieval (top-5 exact-cosine neighbors of vec 0):")
    knn.show(5, truncate=False)

    packed = qs["b21_sequence_pack"](spark, SF_DIR)
    from iot_system_plc_data_to_influxdb_spark.operators.retention import (
        write_training_shards,
    )

    with tempfile.TemporaryDirectory() as tmp:
        shards = os.path.join(tmp, "shards")
        write_training_shards(docs, packed, shards)
        one = spark.read.parquet(shards).filter(
            "lang = 'en' AND bin_id = 0"
        )
        plan = one._jdf.queryExecution().executedPlan().toString()
        pf = (
            plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
            if "PartitionFilters: [" in plan
            else ""
        )
        print(
            f"shards: packed {packed.count()} docs into "
            f"{packed.select('lang', 'shard', 'bin_id').distinct().count()}"
            " bins (shard-local ids); "
            f"a (lang, bin) read prunes at the scan — "
            f"PartitionFilters: [{pf}]"
        )
        assert "lang" in pf and "bin_id" in pf, "partition pruning missing"
        print(f"  rows in (en, bin 0): {one.count()}")

    shuffled = qs["b18_epoch_shuffle"](spark, SF_DIR)
    n_shards = shuffled.select("shard").distinct().count()
    print(
        f"epoch shuffle: corpus dealt into {n_shards} ordered shards "
        "(salt change = next epoch, bit-identical replay)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
