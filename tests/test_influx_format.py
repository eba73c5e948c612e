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


def test_line_protocol_round_trip(spark):
    """to_line_protocol → parse_line_protocol reproduces the points."""
    import datetime as dt

    from iot_system_plc_data_to_influxdb_spark.streaming.influx import (
        parse_line_protocol,
        to_line_protocol,
    )

    rows = [
        (dt.datetime(2024, 1, 1, 0, 0, 0, 123456), "192.168.0.7", "temp one", 21.5),
        (dt.datetime(2024, 1, 1, 0, 0, 1), "plc,weird name", "pres=sure", -3.25),
        (dt.datetime(2024, 1, 1, 0, 0, 2), "10.0.0.2", "flow", 0.0),
    ]
    pts = spark.createDataFrame(
        rows, "ts timestamp, plc_ip string, alias string, value double"
    )
    back = parse_line_protocol(to_line_protocol(pts)).collect()
    got = {(r["measurement"], r["field"]): r for r in back}
    assert set(got) == {(ip, al) for _t, ip, al, _v in rows}
    for ts, ip, al, v in rows:
        r = got[(ip, al)]
        assert r["value"] == v
        assert r["ts"] == ts
        assert r["tags"] == {}


def test_line_protocol_foreign_lines(spark):
    """Lines from other InfluxDB writers: tags, multiple fields,
    int/bool values, missing timestamp, and garbage."""
    from iot_system_plc_data_to_influxdb_spark.streaming.influx import (
        parse_line_protocol,
    )

    lines = spark.createDataFrame(
        [
            ("weather,city=NYC,unit=c temp=21.5,humid=40i 1704067200000000000",),
            ("m1 ok=true",),
            ("not a line protocol entry at all",),
        ],
        "line string",
    )
    out = parse_line_protocol(lines).collect()
    weather = {r["field"]: r for r in out if r["measurement"] == "weather"}
    assert weather["temp"]["tags"] == {"city": "NYC", "unit": "c"}
    assert weather["temp"]["value"] == 21.5
    assert weather["humid"]["value"] == 40.0
    assert weather["humid"]["value_raw"] == "40i"
    assert weather["temp"]["ts"].year == 2024
    m1 = [r for r in out if r["measurement"] == "m1"]
    assert m1[0]["value"] == 1.0 and m1[0]["ts"] is None
    bad = [r for r in out if r["measurement"] is None]
    assert bad  # null-gated, not crashed


def test_line_protocol_string_fields_and_precisions(spark):
    """Telegraf-style quoted string fields: spaces, commas, and '='
    ride inside the quotes; numeric value is null and value_raw holds
    the unquoted text. Also the m/h wire precisions."""
    from iot_system_plc_data_to_influxdb_spark.streaming.influx import (
        parse_line_protocol,
    )

    lines = spark.createDataFrame(
        [
            ('ev,host=web1 msg="disk full, on /var x=1",level=3i 1704067200000000000',),
            ('status note="all ok" 1704067200000000000',),
        ],
        "line string",
    )
    out = parse_line_protocol(lines).collect()
    ev = {r["field"]: r for r in out if r["measurement"] == "ev"}
    assert ev["msg"]["value"] is None
    assert ev["msg"]["value_raw"] == "disk full, on /var x=1"
    assert ev["level"]["value"] == 3.0
    assert ev["msg"]["tags"] == {"host": "web1"}
    note = [r for r in out if r["measurement"] == "status"][0]
    assert note["value_raw"] == "all ok" and note["value"] is None

    # minute/hour precision: epoch units scale to the same instant
    for prec, unit in (("m", 28401120), ("h", 473352)):
        one = spark.createDataFrame([(f"m v=1 {unit}",)], "line string")
        r = parse_line_protocol(one, precision=prec).collect()[0]
        assert r["ts"].year == 2024 and r["ts"].month == 1, (prec, r["ts"])


def test_line_protocol_file_stream(spark, tmp_path):
    """Streamed line-protocol files land as parsed points; malformed
    lines are null-gated out."""
    from iot_system_plc_data_to_influxdb_spark.streaming.influx import (
        read_line_protocol_stream,
    )

    src = tmp_path / "lp"
    src.mkdir()
    (src / "a.lp").write_text(
        "plc1 temp=21.5 1704067200000000000\n"
        "plc1,unit=c pres=9i 1704067201000000000\n"
        "garbage line that is not protocol\n"
    )
    (src / "b.lp").write_text("plc2 flow=3.25 1704067202000000000\n")

    rows = []
    q = (
        read_line_protocol_stream(spark, str(src), max_files_per_trigger=1)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: rows.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["measurement"], r["field"]): r for r in rows}
    assert set(got) == {("plc1", "temp"), ("plc1", "pres"), ("plc2", "flow")}
    assert got[("plc1", "pres")]["tags"] == {"unit": "c"}
    assert got[("plc1", "pres")]["value"] == 9.0
    assert got[("plc2", "flow")]["value"] == 3.25
    assert got[("plc1", "temp")]["ts"].year == 2024


def test_post_retry_against_flaky_endpoint():
    """post_lines_with_retry survives transient 500s/refused sockets
    and delivers the payload; a 400 fails fast (retrying malformed
    line protocol can never succeed)."""
    import http.server
    import threading
    import urllib.error

    import pytest as _pytest

    from iot_system_plc_data_to_influxdb_spark.streaming.influx import (
        post_lines_with_retry,
    )

    received = []
    fail_first = [2]

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            if self.path.startswith("/bad"):
                self.send_response(400)
                self.end_headers()
                return
            if fail_first[0] > 0:
                fail_first[0] -= 1
                self.send_response(500)
                self.end_headers()
                return
            received.append(body)
            self.send_response(204)
            self.end_headers()

        def log_message(self, *a):  # noqa: D102 - silence test output
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}"
        status = post_lines_with_retry(
            f"{url}/write", b"m v=1 1\nm v=2 2", backoff_s=0.01
        )
        assert status == 204
        assert received == [b"m v=1 1\nm v=2 2"]
        assert fail_first[0] == 0  # both transient failures were consumed

        with _pytest.raises(urllib.error.HTTPError):
            post_lines_with_retry(f"{url}/bad", b"garbage", backoff_s=0.01)

        # dead socket: all attempts exhausted -> the last URLError raises
        srv.shutdown()
        with _pytest.raises(urllib.error.URLError):
            post_lines_with_retry(
                f"http://127.0.0.1:1/write", b"x v=1", attempts=2,
                backoff_s=0.01,
            )
    finally:
        srv.shutdown()
        srv.server_close()


def test_read_line_protocol_batch(spark, tmp_path):
    """Batch twin of the streaming reader: same rows, same null gate."""
    from iot_system_plc_data_to_influxdb_spark.streaming.influx import (
        read_line_protocol,
    )

    src = tmp_path / "lp"
    src.mkdir()
    (src / "a.lp").write_text(
        "plc1 temp=21.5 1704067200000000000\n"
        "plc1,unit=c pres=9i 1704067201000000000\n"
        "not line protocol at all\n"
    )
    got = {
        (r["measurement"], r["field"]): r
        for r in read_line_protocol(spark, str(src)).collect()
    }
    assert set(got) == {("plc1", "temp"), ("plc1", "pres")}
    assert got[("plc1", "pres")]["tags"] == {"unit": "c"}
    assert got[("plc1", "temp")]["value"] == 21.5


def test_post_retry_catches_socket_timeout(monkeypatch):
    """Socket read timeouts surface as bare TimeoutError (not wrapped
    in URLError) — the retry loop must treat them as transient."""
    import urllib.request

    from iot_system_plc_data_to_influxdb_spark.streaming.influx import (
        post_lines_with_retry,
    )

    calls = {"n": 0}

    class _Resp:
        status = 204

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout=None):
        calls["n"] += 1
        if calls["n"] < 3:
            raise TimeoutError("read timed out")
        return _Resp()

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    status = post_lines_with_retry(
        "http://localhost:9/write", b"m v=1", attempts=3, backoff_s=0.0
    )
    assert status == 204
    assert calls["n"] == 3
