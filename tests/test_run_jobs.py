"""catalog.run_jobs — the guide-§2.6 concurrent-action helper.

The round-12 optimization overlaps independent driver actions (index
builds' postings/terms/stats writes, the recall harnesses' vector and
lexical chains). Value equality of every overlapped query is proven by
the registry oracle sweep; THESE tests pin the helper's contract —
results in call order, error propagation, nesting — and that an
overlapped index build serves byte-identically to a sequential
reference build.
"""

import threading
import time

import pytest

from iot_system_plc_data_to_influxdb_spark.catalog import run_jobs


def test_results_in_call_order():
    assert run_jobs(lambda: 1, lambda: 2, lambda: 3) == [1, 2, 3]


def test_single_thunk_runs_inline():
    tid = {}
    out = run_jobs(lambda: tid.setdefault("t", threading.get_ident()) and 7)
    assert tid["t"] == threading.get_ident()
    assert len(out) == 1


def test_thunks_actually_overlap():
    # two thunks that each block until the other has started: passes
    # only under real concurrency (a sequential runner deadlocks the
    # 5 s wait and fails the flag check)
    started = [threading.Event(), threading.Event()]

    def mk(i):
        def th():
            started[i].set()
            assert started[1 - i].wait(timeout=5.0)
            return i

        return th

    assert run_jobs(mk(0), mk(1)) == [0, 1]


def test_error_propagates_after_settle():
    done = []

    def boom():
        time.sleep(0.05)
        raise ValueError("job failed")

    def ok():
        done.append(1)
        return "ok"

    with pytest.raises(ValueError, match="job failed"):
        run_jobs(boom, ok)
    assert done == [1]  # the sibling job still ran to completion


def test_nested_run_jobs():
    # b20_rrf_indexed nests: run_jobs(build_lex, build_ivf) where each
    # build itself calls run_jobs over its sub-writes
    inner = lambda: run_jobs(lambda: "a", lambda: "b")  # noqa: E731
    assert run_jobs(inner, inner) == [["a", "b"], ["a", "b"]]


def test_prepared_delta_merge_matches_inline_merge(spark, tmp_path):
    """merge_postings_delta(pre=prepare_postings_delta(d)) — the form
    that lets the delta tokenize overlap the base build — lands the
    same buckets and the same served answer as the inline
    merge_postings_delta(delta_docs=d)."""
    from pyspark.sql import functions as F

    from iot_system_plc_data_to_influxdb_spark.catalog import t
    from iot_system_plc_data_to_influxdb_spark.operators.retrieval import (
        bm25_from_index,
        merge_postings_delta,
        prepare_postings_delta,
        write_postings_index,
    )

    docs = t(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    base = docs.filter(F.expr("pmod(doc_id, 5) != 3"))
    delta = docs.filter(F.expr("pmod(doc_id, 5) = 3"))
    terms = ("the", "sensor", "data", "stream")

    p_inline = str(tmp_path / "inline")
    write_postings_index(base, p_inline)
    got_inline = merge_postings_delta(spark, p_inline, delta_docs=delta)

    p_pre = str(tmp_path / "pre")
    pre = prepare_postings_delta(delta)  # before the build, like the
    write_postings_index(base, p_pre)  # overlapped callers do
    got_pre = merge_postings_delta(spark, p_pre, pre=pre)

    assert got_pre == got_inline
    a = bm25_from_index(spark, p_inline, terms, topk=10).collect()
    b = bm25_from_index(spark, p_pre, terms, topk=10).collect()
    assert a == b


def test_overlapped_postings_build_matches_sequential(spark, tmp_path):
    """write_postings_index (now 3 concurrent writes off one
    checkpointed pass) produces the same postings/terms/stats CONTENT
    as a hand-sequential build of the same relations."""
    from pyspark.sql import functions as F

    from iot_system_plc_data_to_influxdb_spark.catalog import t
    from iot_system_plc_data_to_influxdb_spark.operators.retrieval import (
        _observed_term_freqs,
        _term_bucket,
        write_postings_index,
    )

    docs = t(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    out = str(tmp_path / "idx")
    write_postings_index(docs, out)

    # sequential reference: same expressions, one at a time
    tf, obs = _observed_term_freqs(docs)
    tf = tf.localCheckpoint()
    ref_post = tf.withColumn("tb", _term_bucket(F.col("term")))
    got_post = spark.read.parquet(out + "/postings")
    assert got_post.count() == ref_post.count()
    assert (
        got_post.exceptAll(
            ref_post.select([F.col(c) for c in got_post.columns])
        ).count()
        == 0
    )
    ref_terms = tf.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df")
    )
    got_terms = spark.read.parquet(out + "/terms").drop("tb")
    assert got_terms.exceptAll(ref_terms).count() == 0
    stats = spark.read.parquet(out + "/stats").first()
    ref_stats = obs.get
    assert int(stats["n_docs"]) == int(ref_stats["n_docs"])
    assert int(stats["sum_len"]) == int(ref_stats["sum_len"])
