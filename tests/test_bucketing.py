"""SCALE.md claim check: bucketing both fact tables on the join key
eliminates the b8 shuffle — the plan must join without any Exchange.
"""

import contextlib
import io

from pyspark.sql import functions as F

from iot_system_plc_data_to_influxdb_spark.catalog import t

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_fact_join_has_no_shuffle(spark):
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    (
        t(spark, SF_DIR, "orders")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        t(spark, SF_DIR, "lineitem")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )
    try:
        # disable broadcast so the join strategy is decided by layout
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table("orders_b")
            .join(
                spark.table("lineitem_b"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderkey")
            .agg(F.count("*").alias("n"))
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: zero shuffles
        # correctness unchanged vs the plain (shuffling) join
        plain = (
            t(spark, SF_DIR, "orders")
            .join(
                t(spark, SF_DIR, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderkey")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_lsh_bucket_partition_pruning(spark, tmp_path):
    """ANN storage path (operators/similarity.py): embeddings written
    partitioned by LSH bucket id; the probe's bucket IN (...) filter
    must prune at the partition level (scan reads only the probed
    bucket directories), and results must equal the unpartitioned
    knn_lsh."""
    import os

    from iot_system_plc_data_to_influxdb_spark.operators.similarity import (
        knn_lsh,
        knn_lsh_bucketed,
        write_lsh_bucketed,
    )

    emb = t(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "emb_bucketed")
    write_lsh_bucketed(emb, path, n_planes=8)

    n_bucket_dirs = len(
        [d for d in os.listdir(path) if d.startswith("bucket=")]
    )
    assert n_bucket_dirs > 9  # meaningful spread, else pruning is moot

    df = knn_lsh_bucketed(spark, path, probe_vec_id=0, k=10, n_planes=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(True)
    plan = buf.getvalue()
    # the bucket predicate must land in PartitionFilters, not as a
    # post-scan filter
    part_filters = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "bucket" in part_filters

    # file-level proof: input_file_name() over the pruned scan shows
    # only candidate bucket directories were opened (≤9 for Hamming
    # radius 1 over 8 planes; inputFiles() would list all files, it
    # ignores pruning)
    from iot_system_plc_data_to_influxdb_spark.operators.similarity import (
        _hamming_neighbors,
    )

    bucketed = spark.read.parquet(path)
    pb = int(
        bucketed.filter(F.col("vec_id") == 0).select("bucket").first()["bucket"]
    )
    cands = _hamming_neighbors(pb, 8, 1)
    scanned_dirs = {
        r["f"].split("bucket=")[1].split("/")[0]
        for r in bucketed.filter(F.col("bucket").isin(cands))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert len(scanned_dirs) <= 9 < n_bucket_dirs

    got = [(r["vec_id"], r["cos_sim"]) for r in df.collect()]
    want = [
        (r["vec_id"], r["cos_sim"])
        for r in knn_lsh(emb, probe_vec_id=0, k=10).collect()
    ]
    assert got == want
