"""Dump plans/r12/<query>_{before|after}.txt evidence files.

The round-12 optimization targets are index-LIFECYCLE queries whose
registered return value is a localCheckpoint()ed top-k (the plan of
the returned relation is just `Scan ExistingRDD`), so the honest
plan evidence is the INTERNAL relations the optimization restructures:
the IVF cell-assignment projection, the PQ code assignment, the
postings-build dataflow, and the recall harness's coarse relations.
Each output file labels every dumped section.

Usage: python tools/dump_r12_plans.py before|after [sf_dir]
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
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)

    from iot_system_plc_data_to_influxdb_spark.catalog import t
    from iot_system_plc_data_to_influxdb_spark.operators.similarity import (
        ivf_cell_assignments,
        ivf_centroids,
        knn_lsh,
    )
    from iot_system_plc_data_to_influxdb_spark.session import get_spark

    spark = get_spark(f"dump-r12-{tag}")
    sections: dict[str, list[tuple[str, str]]] = {}

    def add(query: str, label: str, df) -> None:
        sections.setdefault(query, []).append((label, fmt(df)))

    emb = t(spark, sf_dir, "embeddings")
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")

    # --- IVF cell assignment: the build-path projection shared by
    # write_ivf_index / merge_ivf_delta / the streaming router
    cents = ivf_centroids(emb, 8)
    add(
        "b20_knn_ivf_indexed",
        "ivf_cell_assignments(emb, cents) — the index-build "
        "assignment projection (also the b20_ivf_index_delta / "
        "b20_ivf_compaction / b20_rrf_indexed build half)",
        ivf_cell_assignments(emb, cents),
    )

    # --- PQ: subvectors, trained codebook, wide code assignment
    from iot_system_plc_data_to_influxdb_spark.functions import pq as pqf

    v = pqf.pq_subvectors(emb).localCheckpoint()
    cb = pqf.pq_train(v)
    add("b20_knn_ivfpq_indexed", "pq_train(v) — codebook relation", cb)
    cb = cb.localCheckpoint()
    try:
        codes_wide = pqf.pq_codes_wide(emb, cb)  # wide signature (after)
    except Exception:
        codes_wide = pqf.pq_codes_wide(v, cb)  # long signature (before)
    add(
        "b20_knn_ivfpq_indexed",
        "pq_codes_wide — the written code layout "
        "(also b20_ivfpq_index_delta / b20_ivfpq_rerank / "
        "b20_pq_recall's assignment arithmetic)",
        codes_wide,
    )

    # --- postings index build: the tf relation + the terms(df) relation
    from iot_system_plc_data_to_influxdb_spark.operators import retrieval as rt

    if hasattr(rt, "_doc_postings"):
        _base, tf = rt._doc_postings(docs)
        add(
            "b21_bm25_indexed",
            "_doc_postings tf — the postings relation the build "
            "writes (also b21_bm25_index_delta / b21_index_compaction "
            "/ b21_bm25_index_stream / b20_rrf_indexed)",
            tf,
        )
        pdf = tf.groupBy("term").agg(
            F.count("*").cast("bigint").alias("df")
        )
        add(
            "b21_bm25_indexed",
            "terms(df) relation derived from tf (BEFORE: recomputed "
            "lineage — a second tokenize+explode pass; AFTER: read "
            "off the one checkpointed tf)",
            pdf,
        )
        stats = _base.agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("dl").cast("bigint").alias("sum_len"),
        )
        add(
            "b21_bm25_indexed",
            "stats relation (BEFORE: a third full tokenize pass; "
            "AFTER: an Observation on the single corpus pass)",
            stats,
        )

    # --- LSH bucket expression (b20_knn_lsh) — per-row md5 vs literal signs
    add(
        "b20_knn_lsh",
        "knn_lsh bucketed corpus scoring (hyperplane_sign_bits)",
        knn_lsh(emb, probe_vec_id=0, k=10),
    )

    # --- ann/rrf recall harness coarse relations
    import iot_system_plc_data_to_influxdb_spark.plans.northstar as ns

    sim, bf, ivf = ns._ann_sim_bf_ivf(spark, sf_dir, ivf_k=10)
    add(
        "b20_ann_recall",
        "ivf candidate relation (coarse assignment + probe-cell "
        "routing; also the b20_rrf_recall / b20_rrf_recall_correlated "
        "/ b20_pq_recall coarse half)",
        ivf,
    )

    # --- radius search: the pruned-hits relation (BEFORE: cells×-
    # exploded crossJoin + per-vec_id window argmin; AFTER: literal-
    # centroid map-side fold, assignment materialized once)
    try:
        hits, _kept = ns._radius_search(
            emb.select("vec_id", "embedding")
        )
        add(
            "b20_radius_search",
            "_radius_search hits — cell assignment + triangle-bound "
            "pruned distance filter",
            hits,
        )
    except Exception as exc:  # noqa: BLE001 — absent on old trees
        print("radius section skipped:", exc)

    # --- cluster margin: the registered relation itself (BEFORE:
    # own ⋈ other ⋈ min join tree over the K×-exploded score relation;
    # AFTER: one two-best fold over literal centroids)
    try:
        add(
            "b20_cluster_margin",
            "b20_cluster_margin registered relation — per-vector "
            "(own, second-best) distance margin + per-cluster rollup",
            ns.b20_cluster_margin(spark, sf_dir),
        )
    except Exception as exc:  # noqa: BLE001
        print("margin section skipped:", exc)

    for query, parts in sections.items():
        path = os.path.join(out_dir, f"{query}_{tag}.txt")
        with open(path, "w") as f:
            f.write(
                f"# {query} — internal-relation plans ({tag}, "
                f"sf_dir={sf_dir})\n"
                "# Lifecycle queries return a localCheckpoint()ed "
                "top-k, so the evidence is the internal dataflow "
                "the round-12 optimization touches.\n\n"
            )
            for label, text in parts:
                f.write(f"## {label}\n\n{text}\n")
        print("wrote", path)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
