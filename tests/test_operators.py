"""Operator-level tests: salted aggregation equivalence, partition-drop
retention."""

import datetime
import os
import tempfile

from pyspark.sql import functions as F

from iot_system_plc_data_to_influxdb_spark.catalog import t
from iot_system_plc_data_to_influxdb_spark.operators.retention import (
    drop_expired,
    write_points_partitioned,
)
from iot_system_plc_data_to_influxdb_spark.operators.skew import salted_aggregate

SF_DIR = "/root/testdata/sf0.001"


def test_salted_aggregate_matches_plain(spark):
    ev = t(spark, SF_DIR, "events").withColumn(
        "v", F.col("value").cast("decimal(12,2)")
    )
    plain = {
        (r["event_type"],): (r["n"], r["s"], r["mx"])
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["event_type"],): (r["n"], r["s"], r["mx"])
        for r in salted_aggregate(
            ev,
            ["event_type"],
            {
                "n": (F.count("*"), F.sum("n")),
                "s": (F.sum("v"), F.sum("s")),
                "mx": (F.max("v"), F.max("mx")),
            },
        ).collect()
    }
    assert plain == salted


def test_retention_partition_drop(spark):
    ev = (
        t(spark, SF_DIR, "events")
        .filter(F.col("ts") < F.lit("2024-01-06").cast("timestamp"))
        .select(
            "ts",
            F.col("user_id").cast("string").alias("plc_ip"),
            F.col("event_type").alias("alias"),
            "value",
        )
        .filter(F.col("plc_ip").isin("1", "2"))
    )
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "points")
        write_points_partitioned(ev, path)
        before = spark.read.parquet(path).count()
        assert before == ev.count()
        n = drop_expired(path, datetime.date(2024, 1, 3))
        assert n > 0
        kept = spark.read.parquet(path)
        assert kept.count() < before
        # partition values are inferred as DateType
        assert kept.select(F.min("date")).first()[0] >= datetime.date(2024, 1, 3)
        # age-off is partition pruning: no pre-cutoff dates remain
        assert (
            kept.filter(F.col("date") < F.lit("2024-01-03").cast("date")).count() == 0
        )


def test_ewma_matches_sequential_fold(spark):
    from iot_system_plc_data_to_influxdb_spark.plans.timeseries import b12_ewma

    rows = b12_ewma(spark, SF_DIR).collect()
    assert rows
    by_user = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    for user, seq in by_user.items():
        acc = None
        for r in seq:
            acc = r["value"] if acc is None else 0.3 * r["value"] + 0.7 * acc
            assert abs(r["ewma"] - acc) < 1e-9, (user, r["event_id"])
