"""A11/A12 wire-format parity: line protocol + reference JSON body."""

import json

from pyspark.sql import functions as F

from iot_system_plc_data_to_influxdb_spark.streaming.influx import (
    to_line_protocol,
    to_point_json,
)


def _points(spark):
    return spark.createDataFrame(
        [
            ("2024-01-01 00:00:00", "192.168.0.10", "boiler_temp", 21.5),
            ("2024-01-01 00:00:01", "192.168.0.10", "door open", 1.0),
        ],
        "ts string, plc_ip string, alias string, value double",
    ).select(F.col("ts").cast("timestamp"), "plc_ip", "alias", "value")


def test_line_protocol_shape(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    lines = sorted(r["line"] for r in to_line_protocol(_points(spark)).collect())
    assert lines[0] == "192.168.0.10 boiler_temp=21.5 1704067200000000000"
    # spaces in field keys must be escaped
    assert lines[1] == "192.168.0.10 door\\ open=1.0 1704067201000000000"


def test_point_json_matches_reference_shape(spark):
    """create_my_json (Linux/InfluxConnector2.py:222-240): measurement =
    plc_ip, tags always empty, one field per point."""
    out = [json.loads(r["json"]) for r in to_point_json(_points(spark)).collect()]
    for body in out:
        assert body["measurement"] == "192.168.0.10"
        assert body.get("tags", {}) == {}
        assert len(body["fields"]) == 1
    assert {"boiler_temp": 21.5} in [b["fields"] for b in out]
