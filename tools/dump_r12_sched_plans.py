"""Dump plans/r12/<query>_sched_{before|after}.txt evidence files for
the round-12 §2.6 scheduling change (catalog.run_jobs).

The change overlaps independent driver ACTIONS; it must not alter any
plan. Evidence: dump `.explain("formatted")` of (a) the registered
recall queries' returned relations (their leaves are the checkpointed
inputs, the tails are the fusion/scoring plans the refactor moved
between functions), and (b) the index-build write relations and serve
relations that the overlapped writes produce/consume. The *before*
side is generated from a git worktree at the pre-change commit; diff
of the pair must be empty modulo plan/expression ids.

Usage: python tools/dump_r12_sched_plans.py before|after [sf_dir] [out_dir]
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
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        here, "plans", "r12"
    )
    os.makedirs(out_dir, exist_ok=True)

    import shutil
    import tempfile

    from iot_system_plc_data_to_influxdb_spark import plans
    from iot_system_plc_data_to_influxdb_spark.catalog import t
    from iot_system_plc_data_to_influxdb_spark.operators.retrieval import (
        _observed_term_freqs,
        _term_bucket,
        bm25_from_index,
        knn_ivf_from_index,
        write_ivf_index,
        write_postings_index,
    )
    from iot_system_plc_data_to_influxdb_spark.session import get_spark

    spark = get_spark(f"dump-r12-sched-{tag}")
    sections: dict[str, list[tuple[str, str]]] = {}

    def add(query: str, label: str, df) -> None:
        sections.setdefault(query, []).append((label, fmt(df)))

    qs = plans.all_queries()
    # the recall queries RETURN real plans (aggregations over the
    # checkpointed legs) — the full downstream dataflow of the
    # refactored harness is in the dump
    for name in ("b20_rrf_recall", "b20_rrf_recall_correlated",
                 "b20_pq_recall"):
        add(name, "registered relation (returned DataFrame)",
            qs[name](spark, sf_dir))

    # the overlapped index writes: the relations each write job
    # computes, and the serve relations over a built index
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    tf, _obs = _observed_term_freqs(docs)
    tf = tf.localCheckpoint()
    add("b21_bm25_indexed", "postings write relation",
        tf.withColumn("tb", _term_bucket(F.col("term")))
        .repartition("tb").sortWithinPartitions("term", "doc_id"))
    add("b21_bm25_indexed", "terms write relation",
        tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
        .withColumn("tb", _term_bucket(F.col("term")))
        .repartition("tb").sortWithinPartitions("term"))

    tmp = tempfile.mkdtemp(prefix="sched_plan_dump_")
    try:
        write_postings_index(docs, os.path.join(tmp, "lex"))
        emb = t(spark, sf_dir, "embeddings")
        write_ivf_index(emb, os.path.join(tmp, "ivf"))
        probe = emb.filter(F.col("vec_id") == 0).select(
            "embedding"
        ).first()["embedding"]
        add("b21_bm25_indexed", "serve relation (bm25_from_index)",
            bm25_from_index(
                spark, os.path.join(tmp, "lex"),
                ("the", "sensor", "data", "stream"), topk=10,
            ))
        add("b20_knn_ivf_indexed", "serve relation (knn_ivf_from_index)",
            knn_ivf_from_index(
                spark, os.path.join(tmp, "ivf"), list(probe),
                probe_vec_id=0, k=10,
            ))
        for query, parts in sections.items():
            out = os.path.join(out_dir, f"{query}_sched_{tag}.txt")
            with open(out, "w") as f:
                f.write(
                    f"# {query} — scheduling-change evidence ({tag})\n"
                    f"# sf_dir={sf_dir}\n\n"
                )
                for label, text in parts:
                    f.write(f"## {label}\n\n{text}\n")
            print("wrote", out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
