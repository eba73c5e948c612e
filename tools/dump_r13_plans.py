"""Dump plans/r13/<query>_{before|after}.txt evidence files.

Round-13 optimization targets are (a) the rrf-recall harnesses — whose
registered relation (the fusion aggregation) is directly explainable
and shows the leg-consumption restructure — and (b) index-lifecycle
internals (the postings build's terms derivation, the delta merges'
Observation-riding landed relations). The *before* side must be
generated from a git worktree at the pre-round-13 commit so both sides
are honest checkouts.

Usage: python tools/dump_r13_plans.py before|after [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def fmt(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    # evidence always lands in the MAIN repo's plans/r13, even when
    # this script runs from a before-side worktree
    out_dir = os.path.join("/root/repo", "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)

    from iot_system_plc_data_to_influxdb_spark.catalog import t
    from iot_system_plc_data_to_influxdb_spark.operators import (
        retrieval as rt,
    )
    from iot_system_plc_data_to_influxdb_spark.session import get_spark
    import iot_system_plc_data_to_influxdb_spark.plans.northstar as ns

    spark = get_spark(f"dump-r13-{tag}")
    sections: dict[str, list[tuple[str, str]]] = {}

    def add(query: str, label: str, df) -> None:
        sections.setdefault(query, []).append((label, fmt(df)))

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    # --- the two rrf-recall harnesses: the registered relation itself
    # (the fusion tail). BEFORE: three bf-side joins, each leg consumed
    # twice; AFTER: one full-joined candidate relation with the hybrid
    # rank as a window column, one bf join, each leg read once.
    add(
        "b20_rrf_recall",
        "registered relation — RRF fusion + three-way truth scoring",
        ns.b20_rrf_recall(spark, sf_dir),
    )
    add(
        "b20_rrf_recall_correlated",
        "registered relation — correlated twin (shared tokenize pass, "
        "hashed-BOW source, qtf-preaggregated lexical leg)",
        ns.b20_rrf_recall_correlated(spark, sf_dir),
    )

    # --- postings build: the terms/ derivation. BEFORE: read off the
    # corpus-sized localCheckpoint'ed tf (Scan ExistingRDD); AFTER:
    # column-pruned read-back of the WRITTEN postings (Scan parquet,
    # ReadSchema term/tb only).
    import tempfile
    import shutil

    tmp = tempfile.mkdtemp(prefix="dump_r13_idx_")
    try:
        rt.write_postings_index(docs, tmp)
        if hasattr(rt, "_observed_term_freqs") and tag == "before":
            tf, _obs = rt._observed_term_freqs(docs)
            tf = tf.localCheckpoint()
            add(
                "b21_bm25_indexed",
                "terms(df) derivation — from the checkpointed tf "
                "relation (the corpus-sized executor-disk barrier)",
                tf.groupBy("term").agg(
                    F.count("*").cast("bigint").alias("df")
                ),
            )
        else:
            add(
                "b21_bm25_indexed",
                "terms(df) derivation — from the WRITTEN postings "
                "(replicated store read-back, term/tb columns only)",
                spark.read.parquet(os.path.join(tmp, "postings"))
                .groupBy("tb", "term")
                .agg(F.count("*").cast("bigint").alias("df")),
            )

        # --- delta merges: the landed/assigned relation the append
        # writes. AFTER: CollectMetrics (Observation) rides the pass —
        # no checkpoint, no second distinct-collect job.
        from iot_system_plc_data_to_influxdb_spark.operators.similarity import (  # noqa: E501
            ivf_cell_assignments,
            ivf_centroids,
        )

        cents = ivf_centroids(emb, 8)
        assigned = ivf_cell_assignments(
            emb.filter("pmod(vec_id, 7) = 3"), cents
        )
        if tag == "after":
            from pyspark.sql import Observation

            obs = Observation()
            assigned = assigned.observe(
                obs, F.collect_set("cell").alias("cells")
            )
        add(
            "b20_ivf_index_delta",
            "delta assignment relation the append writes (AFTER: "
            "CollectMetrics node carries the landed-cell set; BEFORE: "
            "a localCheckpoint + separate distinct-collect job)",
            assigned,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # --- IVF-PQ delta prepare (after only: the function is new)
    if hasattr(rt, "prepare_ivfpq_delta"):
        quant = rt.ivfpq_quantizers(emb)
        landed, _o = rt.prepare_ivfpq_delta(
            emb.filter("vec_id >= 16 AND pmod(vec_id, 7) = 3"), *quant
        )
        add(
            "b20_ivfpq_index_delta",
            "prepared delta (encode+assign against in-memory frozen "
            "quantizers, checkpointed delta-sized; runs CONCURRENT "
            "with the layout writes)",
            landed,
        )

    for query, parts in sections.items():
        path = os.path.join(out_dir, f"{query}_{tag}.txt")
        with open(path, "w") as f:
            f.write(
                f"# {query} — plan evidence ({tag}, sf_dir={sf_dir})\n\n"
            )
            for label, text in parts:
                f.write(f"## {label}\n\n{text}\n")
        print("wrote", path)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
