"""InfluxDB-wire-protocol gateway: Grafana-shaped /query JSON, /write
line-protocol ingest, /ping health check — over real HTTP."""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

import pytest
from pyspark.sql import functions as F

from iot_system_plc_data_to_influxdb_spark.streaming.http_api import (
    InfluxAPI,
    serve,
)


@pytest.fixture(scope="module")
def gateway(spark, tmp_path_factory):
    write_dir = str(tmp_path_factory.mktemp("api") / "points")
    pts = spark.createDataFrame(
        [
            (f"2024-01-01T{h:02d}:00:00", "plc1", "temp", float(h))
            for h in range(24)
        ],
        "ts_s string, plc_ip string, alias string, value double",
    ).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "plc_ip", "alias", "value"
    )
    pts.write.mode("overwrite").parquet(write_dir)

    def get_table(_measurement):
        return spark.read.parquet(write_dir)

    api = InfluxAPI(spark, get_table, write_dir=write_dir)
    server, thread, port = serve(api, port=0)
    yield f"http://127.0.0.1:{port}", write_dir
    server.shutdown()


def _get(url: str):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, r.read()


def test_ping(gateway):
    base, _ = gateway
    status, _body = _get(f"{base}/ping")
    assert status == 204


def test_query_grafana_shape(gateway):
    base, _ = gateway
    q = urllib.parse.quote(
        "SELECT mean(value) FROM points WHERE time >= '2024-01-01' "
        "GROUP BY time(6h)"
    )
    status, body = _get(f"{base}/query?db=iot&q={q}")
    assert status == 200
    out = json.loads(body)
    series = out["results"][0]["series"][0]
    assert series["name"] == "points"
    assert series["columns"][0] == "time"
    assert len(series["values"]) == 4
    # RFC3339 timestamps by default
    assert series["values"][0][0].endswith("Z")
    means = [v[1] for v in series["values"]]
    assert means == [2.5, 8.5, 14.5, 20.5]


def test_query_epoch_ms(gateway):
    base, _ = gateway
    q = urllib.parse.quote(
        "SELECT max(value) FROM points GROUP BY time(12h)"
    )
    status, body = _get(f"{base}/query?epoch=ms&q={q}")
    vals = json.loads(body)["results"][0]["series"][0]["values"]
    assert isinstance(vals[0][0], int)  # epoch millis, not RFC3339
    assert vals[0][0] % 1000 == 0 and vals[0][0] > 1_700_000_000_000


def test_query_error_is_typed_json(gateway):
    base, _ = gateway
    q = urllib.parse.quote("SELECT bogus(")
    status, body = _get(f"{base}/query?q={q}")
    assert status == 200  # InfluxDB returns per-statement errors in-band
    out = json.loads(body)
    assert "error" in out["results"][0]


def test_write_then_query_roundtrip(gateway, spark):
    base, write_dir = gateway
    lines = "\n".join(
        f"plc9 rpm={100 + i} 17040672{i:02d}000000000" for i in range(5)
    )
    req = urllib.request.Request(
        f"{base}/write?db=iot", data=lines.encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        assert r.status == 204
    q = urllib.parse.quote(
        "SELECT count(value) FROM points WHERE \"plc_ip\" = 'plc9'"
    )
    _status, body = _get(f"{base}/query?q={q}")
    vals = json.loads(body)["results"][0]["series"][0]["values"]
    # a global aggregate has no time column — the row is just [count]
    assert vals == [[5]]
