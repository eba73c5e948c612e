"""Batched inference plumbing: the mapInPandas encoder equals its
pure-Catalyst twin row-for-row (the swap-in-a-real-model contract)."""

from pyspark.sql import functions as F

from iot_system_plc_data_to_influxdb_spark.catalog import t
from iot_system_plc_data_to_influxdb_spark.operators.inference import (
    encode_documents,
    encode_documents_native,
)

SF_DIR = "/root/testdata/sf0.001"


def test_mapinpandas_encoder_equals_native_twin(spark):
    docs = t(spark, SF_DIR, "documents")
    got = {
        r["doc_id"]: (r["n_tokens"], list(r["embedding"]))
        for r in encode_documents(docs).collect()
    }
    want = {
        r["doc_id"]: (r["n_tokens"], list(r["embedding"]))
        for r in encode_documents_native(docs).collect()
    }
    assert got == want
    assert len(got) == docs.count()


def test_encoder_batch_size_is_respected(spark):
    """Arrow batch size config partitions the forward passes; output is
    identical regardless of batch size (stateless model contract)."""
    docs = t(spark, SF_DIR, "documents").limit(100)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        small = {r["doc_id"]: list(r["embedding"]) for r in encode_documents(docs).collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    big = {r["doc_id"]: list(r["embedding"]) for r in encode_documents(docs).collect()}
    assert small == big
