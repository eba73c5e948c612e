"""Stream-stream interval join: the streaming plan produces exactly the
batch join's rows, with watermark-bounded state."""

from pyspark.sql import functions as F

from iot_system_plc_data_to_influxdb_spark.catalog import t
from iot_system_plc_data_to_influxdb_spark.streaming.joins import interval_join

SF_DIR = "/root/testdata/sf0.001"


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    ev = t(spark, SF_DIR, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id", "value"
    )
    cdir, edir = str(tmp_path / "clicks"), str(tmp_path / "errors")
    clicks.write.parquet(cdir)
    errors.write.parquet(edir)

    cs = spark.readStream.schema(clicks.schema).parquet(cdir)
    es = spark.readStream.schema(errors.schema).parquet(edir)
    joined = interval_join(cs, es, "user_id", lookback="10 minutes")
    assert joined.isStreaming

    rows = []
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: rows.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    batch = interval_join(clicks, errors, "user_id", lookback="10 minutes")
    want = {
        (r["user_id"], r["p_event_id"], r["r_event_id"]) for r in batch.collect()
    }
    got = {(r["user_id"], r["p_event_id"], r["r_event_id"]) for r in rows}
    assert got == want and len(want) > 0


def test_stream_static_config_enrichment(spark, tmp_path):
    """Stream–static broadcast join: readings pick up config metadata;
    inactive tags are filtered; streaming rows == batch rows."""
    from iot_system_plc_data_to_influxdb_spark.plans.config_plane import (
        config_df,
    )
    from iot_system_plc_data_to_influxdb_spark.streaming.joins import (
        enrich_with_config,
    )

    config = config_df(spark)
    pairs = [
        (r["plc_ip"], r["alias"], r["active"])
        for r in config.collect()
    ]
    active_pairs = {(ip, al) for ip, al, act in pairs if act}
    inactive = [(ip, al) for ip, al, act in pairs if not act]

    readings = spark.createDataFrame(
        [(ip, al, float(i)) for i, (ip, al, _) in enumerate(pairs)],
        "plc_ip string, alias string, value double",
    )
    rdir = str(tmp_path / "readings")
    readings.write.parquet(rdir)
    rs = spark.readStream.schema(readings.schema).parquet(rdir)

    enriched = enrich_with_config(rs, config)
    assert enriched.isStreaming
    rows = []
    q = (
        enriched.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: rows.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {(r["plc_ip"], r["alias"]) for r in rows}
    assert got == active_pairs
    assert all((ip, al) not in got for ip, al in inactive)
    for r in rows:
        assert r["poll_interval"] is not None and r["data_type"] is not None
    batch = {
        (r["plc_ip"], r["alias"])
        for r in enrich_with_config(readings, config).collect()
    }
    assert batch == got
