"""Partitioned inverted index (operators/retrieval.py): the indexed
BM25 serving path must (a) answer exactly like the corpus scan —
also enforced on every sweep by b21_bm25_indexed sharing
b21_bm25_retrieval's oracle — and (b) READ only the query terms'
term-bucket partitions, which is the entire point of building the
index at 100 TB."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from iot_system_plc_data_to_influxdb_spark.catalog import t
from iot_system_plc_data_to_influxdb_spark.operators.retrieval import (
    N_BUCKETS,
    bm25_from_index,
    write_postings_index,
)

SF_DIR = "/root/testdata/sf0.001"
TERMS = ("spark", "join", "merge", "vector")


def test_indexed_bm25_prunes_to_query_term_buckets(spark, tmp_path):
    path = str(tmp_path / "idx")
    write_postings_index(
        t(spark, SF_DIR, "documents").select("doc_id", "text"), path
    )
    served = bm25_from_index(spark, path, TERMS, topk=10)

    # (a) answer identical to the corpus-scan query
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        b21_bm25_retrieval,
    )

    want = [
        (r["doc_id"], r["dl"], r["n_hit_terms"], r["score_fp"])
        for r in b21_bm25_retrieval(spark, SF_DIR).collect()
    ]
    got = [
        (r["doc_id"], r["dl"], r["n_hit_terms"], r["score_fp"])
        for r in served.collect()
    ]
    assert got == want and len(got) == 10

    # (b) partition pruning: the executed postings scan opens ONLY the
    # tb= directories the query terms hash into (4 terms -> <= 4 of
    # the N_BUCKETS buckets), proven from the files actually read
    query_buckets = {
        r[0]
        for r in spark.createDataFrame([(x,) for x in TERMS], "term string")
        .select(F.pmod(F.xxhash64("term"), F.lit(N_BUCKETS)).cast("int"))
        .collect()
    }
    post = (
        spark.read.parquet(os.path.join(path, "postings"))
        .filter(F.col("tb").isin(sorted(query_buckets)))
        .filter(F.col("term").isin(*TERMS))
    )
    opened = {
        int(r["f"].split("tb=")[1].split("/")[0])
        for r in post.select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert opened
    assert opened <= query_buckets
    # the index holds (many) more buckets than the query touches
    all_buckets = {
        int(d.split("=")[1])
        for d in os.listdir(os.path.join(path, "postings"))
        if d.startswith("tb=")
    }
    assert len(all_buckets) > len(query_buckets)
    # and the predicate lands in PartitionFilters (plan-level proof)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        post.explain(True)
    pf = buf.getvalue().split("PartitionFilters: [")[1].split("]")[0]
    assert "tb" in pf


def test_index_df_and_stats_match_corpus(spark, tmp_path):
    """The terms/ and stats/ relations must agree with direct corpus
    aggregation — the self-consistency the scoring formula assumes."""
    path = str(tmp_path / "idx2")
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text")
    write_postings_index(docs, path)

    from iot_system_plc_data_to_influxdb_spark.functions.text import tokens

    base = docs.select(
        "doc_id", tokens(F.col("text")).alias("w")
    ).select("doc_id", F.size("w").cast("bigint").alias("dl"), "w")
    want_stats = base.agg(
        F.count("*").alias("n"), F.sum("dl").alias("s")
    ).first()
    got_stats = spark.read.parquet(os.path.join(path, "stats")).first()
    assert (got_stats["n_docs"], got_stats["sum_len"]) == (
        want_stats["n"], want_stats["s"]
    )
    for term in TERMS:
        want_df = (
            base.select("doc_id", F.explode("w").alias("term"))
            .filter(F.col("term") == term)
            .select("doc_id")
            .distinct()
            .count()
        )
        got = (
            spark.read.parquet(os.path.join(path, "terms"))
            .filter(F.col("term") == term)
            .collect()
        )
        assert len(got) == 1 and got[0]["df"] == want_df


def test_indexed_ivf_prunes_to_probe_cells(spark, tmp_path):
    """The vector twin: knn_ivf_from_index must return exactly
    b20_knn_ivf's answer while reading ONLY the probe's 2 cell=
    partitions of the written layout."""
    from iot_system_plc_data_to_influxdb_spark.operators.retrieval import (
        knn_ivf_from_index,
        write_ivf_index,
    )
    from iot_system_plc_data_to_influxdb_spark.operators.similarity import (
        knn_ivf,
    )

    emb = t(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, path)
    probe = emb.filter(F.col("vec_id") == 0).first()["embedding"]

    served = knn_ivf_from_index(
        spark, path, list(probe), probe_vec_id=0, k=10
    )
    want = [
        (r["vec_id"], r["cell"], r["cos_sim"])
        for r in knn_ivf(emb, probe_vec_id=0, k=10).collect()
    ]
    got = [
        (r["vec_id"], r["cell"], r["cos_sim"]) for r in served.collect()
    ]
    assert got == want and len(got) == 10

    # pruning: the candidate scan opens <= 2 of the 8 cell= dirs
    opened_cells = {
        int(r["f"].split("cell=")[1].split("/")[0])
        for r in spark.read.parquet(os.path.join(path, "cells"))
        .filter(F.col("cell").isin([c for c in range(8)]))  # all cells
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert len(opened_cells) > 2  # the index genuinely spans cells
    probe_cells = {r["cell"] for r in served.collect()}
    scan = (
        spark.read.parquet(os.path.join(path, "cells"))
        .filter(F.col("cell").isin(sorted(probe_cells)))
    )
    opened = {
        int(r["f"].split("cell=")[1].split("/")[0])
        for r in scan.select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert opened == probe_cells and len(opened) <= 2
