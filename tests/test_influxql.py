"""InfluxQL mini-dialect compiler (functions/influxql.py): the queries
a reference user's Grafana dashboards emit must compile to plans whose
results match hand-built DataFrame equivalents."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from iot_system_plc_data_to_influxdb_spark.functions.influxql import (
    InfluxQLError,
    compile_influxql,
    parse,
)


@pytest.fixture(scope="module")
def points(spark):
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for i in range(600):
        rows.append(
            (
                t0 + dt.timedelta(seconds=10 * i),
                "192.168.0.1" if i % 2 == 0 else "192.168.0.2",
                "temp" if i % 3 else "pressure",
                float((i * 7) % 100) / 2.0,
            )
        )
    return spark.createDataFrame(
        rows, "ts timestamp, plc_ip string, alias string, value double"
    ).cache()


def test_downsample_group_by_time(points):
    out = compile_influxql(
        "SELECT mean(value) AS m, count(value) AS n FROM points "
        "WHERE time >= '2024-01-01 00:10:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(5m), plc_ip",
        points,
    ).collect()
    exp = (
        points.filter(
            (F.col("ts") >= "2024-01-01 00:10:00")
            & (F.col("ts") < "2024-01-01 01:00:00")
        )
        .groupBy(F.window("ts", "300 seconds").start.alias("time"), "plc_ip")
        .agg(F.avg("value").alias("m"), F.count("value").alias("n"))
        .collect()
    )
    assert {(r["time"], r["plc_ip"]): (r["m"], r["n"]) for r in out} == {
        (r["time"], r["plc_ip"]): (r["m"], r["n"]) for r in exp
    }
    assert len(out) == len(exp) > 0


def test_tag_filter_and_selectors(points):
    out = compile_influxql(
        "SELECT first(value) AS f, last(value) AS l, spread(value) AS s "
        "FROM points WHERE alias = 'pressure' AND plc_ip = '192.168.0.1'",
        points,
    ).collect()
    sub = points.filter((F.col("alias") == "pressure") & (F.col("plc_ip") == "192.168.0.1"))
    exp = sub.agg(
        F.min_by("value", "ts").alias("f"),
        F.max_by("value", "ts").alias("l"),
        (F.max("value") - F.min("value")).alias("s"),
    ).first()
    assert out[0]["f"] == exp["f"]
    assert out[0]["l"] == exp["l"]
    assert out[0]["s"] == exp["s"]


def test_fill_previous(points, spark):
    # carve a gap so fill(previous) has something to do
    gappy = points.filter(
        ~F.col("ts").between("2024-01-01 00:20:00", "2024-01-01 00:29:59")
    )
    out = compile_influxql(
        "SELECT last(value) AS lv FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(5m), alias fill(previous)",
        gappy,
    ).collect()
    # no null lv anywhere after the first bucket per alias
    by_alias = {}
    for r in sorted(out, key=lambda r: (r["alias"], r["time"])):
        by_alias.setdefault(r["alias"], []).append(r["lv"])
    for vals in by_alias.values():
        assert all(v is not None for v in vals[1:])


def test_raw_select_order_limit(points):
    out = compile_influxql(
        "SELECT value FROM points WHERE alias = 'temp' "
        "ORDER BY time DESC LIMIT 5",
        points,
    ).collect()
    exp = (
        points.filter(F.col("alias") == "temp")
        .select("ts", "value")
        .orderBy(F.col("ts").desc())
        .limit(5)
        .collect()
    )
    assert [r["value"] for r in out] == [r["value"] for r in exp]


def test_numeric_fill(points):
    out = compile_influxql(
        "SELECT mean(value) AS m FROM points "
        "WHERE alias = 'pressure' AND time < '2024-01-01 00:30:00' "
        "GROUP BY time(1m) fill(0)",
        points.filter(F.col("value") > 1000),  # empty → still parses/runs
    )
    assert out.count() == 0


def test_parse_errors():
    with pytest.raises(InfluxQLError):
        parse("SELECT percentile_weird(value) FROM p")
    with pytest.raises(InfluxQLError):
        parse("SELECT mean(value) FROM p GROUP BY time(5m) fill(previous) HAVING x")
    with pytest.raises(InfluxQLError):
        parse("SELECT value FROM p GROUP BY time(5m)")  # raw + time bucket
    with pytest.raises(InfluxQLError):
        parse("SELECT mean(value), value FROM p")  # mixed agg/raw
    with pytest.raises(InfluxQLError):
        parse("DELETE FROM p")
    # non-numeric math/predictor arguments must surface as InfluxQLError
    # (never a bare ValueError, which would escape the gateway's
    # per-statement isolation and 400 a whole multi-statement request)
    with pytest.raises(InfluxQLError):
        parse("SELECT pow(mean(value), 2h) FROM p")
    with pytest.raises(InfluxQLError):
        parse(
            "SELECT holt_winters(mean(value), 2h, 0) FROM p "
            "WHERE time > now() - 1h GROUP BY time(10m)"
        )


def test_parse_shape():
    q = parse(
        'SELECT mean("value") AS m FROM "points" WHERE time >= \'2024-01-01\' '
        "AND plc_ip = '10.0.0.1' GROUP BY time(10s), alias fill(none) "
        "ORDER BY time DESC LIMIT 100;"
    )
    assert q.measurement == "points"
    assert q.select == [("mean", "value", "m", None)]
    assert q.time_lo == (">=", "2024-01-01")
    assert q.tag_eq == [("plc_ip", "10.0.0.1")]
    assert q.group_time_s == 10
    assert q.group_tags == ["alias"]
    assert q.fill == "none"
    assert q.order_desc and q.limit == 100


def test_show_meta_queries(points):
    from iot_system_plc_data_to_influxdb_spark.functions.influxql import (
        compile_show,
    )

    ms = [r["name"] for r in compile_show("SHOW MEASUREMENTS", points).collect()]
    assert ms == ["192.168.0.1", "192.168.0.2"]
    fk = compile_show(
        'SHOW FIELD KEYS FROM "192.168.0.1"', points
    ).collect()
    assert [r["fieldKey"] for r in fk] == ["pressure", "temp"]
    assert all(r["fieldType"] == "float" for r in fk)
    assert compile_show("SHOW TAG KEYS", points).count() == 0  # tags empty
    assert (
        compile_show('SHOW TAG VALUES WITH KEY = "host"', points).count() == 0
    )
    with pytest.raises(InfluxQLError):
        compile_show("SHOW TAG VALUES", points)
    with pytest.raises(InfluxQLError):
        compile_show("SHOW GRANTS FOR admin", points)


def test_show_where_field_condition_errors(points):
    """SHOW ... WHERE on a FIELD key must raise like InfluxDB 1.x
    ("fields not supported"), not silently resolve through the tags
    map, compare against '' and return an empty template-variable
    list to Grafana."""
    from iot_system_plc_data_to_influxdb_spark.functions.influxql import (
        compile_show,
    )

    with pytest.raises(InfluxQLError, match="field key"):
        compile_show(
            "SHOW TAG VALUES WITH KEY = \"alias\" WHERE \"value\" = '3'",
            points,
        )
    # tag conditions (string columns / tags-map keys) still compile
    # and run (the fixture has no tags map, so the listing is empty —
    # the point is no InfluxQLError)
    compile_show(
        "SHOW TAG VALUES WITH KEY = \"alias\" WHERE \"alias\" = 'temp'",
        points,
    ).count()
    # unknown keys keep InfluxDB's missing-tag ''-comparison semantics
    assert (
        compile_show(
            "SHOW TAG VALUES WITH KEY = \"alias\" WHERE \"nosuch\" != ''",
            points,
        ).count()
        == 0
    )


def test_rollup_routing_in_compiler(points, spark, tmp_path):
    """An eligible GROUP BY time() statement routes to the CQ rollup
    (verified via input files) and returns exactly the raw-path
    result; a non-mergeable aggregate falls back to raw points."""
    from iot_system_plc_data_to_influxdb_spark.streaming.rollup import (
        backfill_downsample,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rollup_path = str(tmp_path / "rollup1m")
    assert backfill_downsample(spark, points, rollup_path, every="1 minute") > 0
    rollup = spark.read.parquet(rollup_path)

    q = (
        "SELECT mean(value) AS m, count(value) AS n, max(value) AS mx "
        "FROM points WHERE time >= '2024-01-01 00:10:00' "
        "AND time < '2024-01-01 01:00:00' GROUP BY time(5m), plc_ip"
    )
    routed = compile_influxql(q, points, rollup, 60)
    raw = compile_influxql(q, points)
    assert any("rollup1m" in f for f in routed.inputFiles())
    key = lambda r: (r["time"], r["plc_ip"])  # noqa: E731
    rd = {key(r): r for r in routed.collect()}
    dd = {key(r): r for r in raw.collect()}
    assert set(rd) == set(dd) and rd
    for k in rd:
        assert rd[k]["n"] == dd[k]["n"]
        assert rd[k]["mx"] == dd[k]["mx"]
        assert abs(rd[k]["m"] - dd[k]["m"]) < 1e-9

    # median is not mergeable -> must fall back to the raw table
    q2 = (
        "SELECT median(value) AS md FROM points "
        "WHERE time >= '2024-01-01 00:10:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(5m)"
    )
    fallback = compile_influxql(q2, points, rollup, 60)
    assert not any("rollup1m" in f for f in fallback.inputFiles())

    # unaligned lower bound -> fallback too
    q3 = q.replace("00:10:00", "00:10:30")
    assert not any(
        "rollup1m" in f
        for f in compile_influxql(q3, points, rollup, 60).inputFiles()
    )


def test_rollup_routing_prunes_date_partitions(spark, tmp_path):
    """The routed plan must carry the derived date predicate down to
    the rollup scan's partition filters — at scale, time-bounded
    dashboard queries read only the covered date partitions."""
    import datetime as dt2

    from iot_system_plc_data_to_influxdb_spark.streaming.rollup import (
        backfill_downsample,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = [
        (
            dt2.datetime(2024, 1, 1 + d, h, 0, 0),
            "p1",
            "a",
            float(d * 24 + h),
        )
        for d in range(5)
        for h in range(24)
    ]
    pts = spark.createDataFrame(
        rows, "ts timestamp, plc_ip string, alias string, value double"
    )
    rollup_path = str(tmp_path / "rollup_days")
    assert backfill_downsample(spark, pts, rollup_path, every="1 hour") > 0
    rollup = spark.read.parquet(rollup_path)

    routed = compile_influxql(
        "SELECT mean(value) AS m FROM points "
        "WHERE time >= '2024-01-02 00:00:00' AND time < '2024-01-04 00:00:00' "
        "GROUP BY time(2h), plc_ip",
        pts,
        rollup,
        3600,
    )
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1][:300]
    # both derived date bounds must reach the partition filter
    assert "date" in seg and ">=" in seg and "<=" in seg
    # and the result matches the raw path
    raw = compile_influxql(
        "SELECT mean(value) AS m FROM points "
        "WHERE time >= '2024-01-02 00:00:00' AND time < '2024-01-04 00:00:00' "
        "GROUP BY time(2h), plc_ip",
        pts,
    )
    key = lambda r: (r["time"], r["plc_ip"])  # noqa: E731
    rd = {key(r): r["m"] for r in routed.collect()}
    dd = {key(r): r["m"] for r in raw.collect()}
    assert rd == dd and len(rd) == 24


def test_delete_and_drop_measurement(points):
    from iot_system_plc_data_to_influxdb_spark.functions.influxql import (
        compile_delete,
    )

    total = points.count()
    n1 = points.filter(F.col("plc_ip") == "192.168.0.1").count()

    dropped = compile_delete('DROP MEASUREMENT "192.168.0.1"', points)
    assert dropped.count() == total - n1

    doomed = points.filter(
        (F.col("plc_ip") == "192.168.0.2")
        & (F.col("ts") < F.lit("2024-01-01 00:30:00").cast("timestamp"))
        & (F.col("alias") == "temp")
    ).count()
    kept = compile_delete(
        "DELETE FROM \"192.168.0.2\" WHERE time < '2024-01-01 00:30:00' "
        "AND alias = 'temp'",
        points,
    )
    assert doomed > 0
    assert kept.count() == total - doomed

    with pytest.raises(InfluxQLError):
        compile_delete("DELETE FROM m WHERE value > 3", points)


def test_drop_series(points):
    from iot_system_plc_data_to_influxdb_spark.functions.influxql import (
        compile_delete,
    )

    total = points.count()
    doomed = points.filter(
        (F.col("plc_ip") == "192.168.0.1") & (F.col("alias") == "temp")
    ).count()
    kept = compile_delete(
        "DROP SERIES FROM \"192.168.0.1\" WHERE alias = 'temp'", points
    )
    assert doomed > 0 and kept.count() == total - doomed
    # whole-measurement series drop
    n1 = points.filter(F.col("plc_ip") == "192.168.0.1").count()
    kept2 = compile_delete('DROP SERIES FROM "192.168.0.1"', points)
    assert kept2.count() == total - n1
    # InfluxDB parity: series are dropped whole, never by time
    with pytest.raises(InfluxQLError):
        compile_delete(
            "DROP SERIES FROM m WHERE alias = 'x' AND time < '2024-01-01'",
            points,
        )


def test_limit_offset(points):
    full = compile_influxql(
        "SELECT value FROM points WHERE alias = 'temp' ORDER BY time DESC LIMIT 10",
        points,
    ).collect()
    page2 = compile_influxql(
        "SELECT value FROM points WHERE alias = 'temp' "
        "ORDER BY time DESC LIMIT 5 OFFSET 5",
        points,
    ).collect()
    assert [r["value"] for r in page2] == [r["value"] for r in full[5:]]


def test_subquery_aggregate_of_aggregate(points):
    from iot_system_plc_data_to_influxdb_spark.functions.influxql import (
        compile_statement,
    )

    out = compile_statement(
        "SELECT max(m) AS peak, min(m) AS trough FROM "
        "(SELECT mean(value) AS m FROM points "
        " WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00' "
        " GROUP BY time(5m), plc_ip) "
        "GROUP BY plc_ip",
        points,
    ).collect()
    inner = (
        points.filter(
            (F.col("ts") >= "2024-01-01 00:00:00")
            & (F.col("ts") < "2024-01-01 01:00:00")
        )
        .groupBy(F.window("ts", "300 seconds").start.alias("time"), "plc_ip")
        .agg(F.avg("value").alias("m"))
    )
    exp = {
        r["plc_ip"]: r
        for r in inner.groupBy("plc_ip")
        .agg(F.max("m").alias("peak"), F.min("m").alias("trough"))
        .collect()
    }
    assert len(out) == 2
    for r in out:
        assert r["peak"] == exp[r["plc_ip"]]["peak"]
        assert r["trough"] == exp[r["plc_ip"]]["trough"]


def test_subquery_plain_statement_passthrough(points):
    from iot_system_plc_data_to_influxdb_spark.functions.influxql import (
        compile_statement,
    )

    n = compile_statement(
        "SELECT count(value) AS n FROM points", points
    ).first()["n"]
    assert n == points.count()


def test_slimit_series_limit(points):
    out = compile_influxql(
        "SELECT mean(value) AS m FROM points GROUP BY time(10m), plc_ip SLIMIT 1",
        points,
    ).collect()
    assert {r["plc_ip"] for r in out} == {"192.168.0.1"}  # first series only
    # no GROUP BY <tag> → one series; SLIMIT parses and is the identity
    # (semantics covered in test_slimit_without_tag_grouping)
    q = parse("SELECT mean(value) FROM p GROUP BY time(5m) SLIMIT 2")
    assert q.slimit == 2 and not q.group_tags


def test_fill_previous_emits_empty_buckets(points, spark):
    """InfluxDB emits one row per interval across the queried range;
    gap buckets must appear (not vanish) and carry the previous value."""
    gappy = points.filter(
        ~F.col("ts").between("2024-01-01 00:20:00", "2024-01-01 00:29:59")
    )
    out = compile_influxql(
        "SELECT last(value) AS lv FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(5m), alias fill(previous)",
        gappy,
    ).collect()
    per_alias = {}
    for r in out:
        per_alias.setdefault(r["alias"], set()).add(r["time"].minute)
    for mins in per_alias.values():
        # all 12 five-minute buckets present, including the carved gap
        assert mins == {0, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50, 55}
    gap_rows = [r for r in out if r["time"].minute in (20, 25)]
    assert gap_rows and all(r["lv"] is not None for r in gap_rows)


def test_fill_zero_emits_empty_buckets(points):
    out = compile_influxql(
        "SELECT count(value) AS n FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time <= '2024-01-01 00:30:00' "
        "AND alias = 'temp' GROUP BY time(10m) fill(0)",
        points.filter(F.col("ts") < "2024-01-01 00:10:00"),
    ).collect()
    # grid: 00:00, 00:10, 00:20, 00:30 (<= includes the bound's bucket)
    assert [r["time"].minute for r in out] == [0, 10, 20, 30]
    assert [r["n"] == 0 for r in out] == [False, True, True, True]


def test_limit_pages_per_series(points):
    out = compile_influxql(
        "SELECT mean(value) AS m FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(10m), alias LIMIT 2 OFFSET 1",
        points,
    ).collect()
    per_series = {}
    for r in out:
        per_series.setdefault(r["alias"], []).append(r["time"].minute)
    # every series contributes exactly 2 buckets, starting after the
    # first (offset 1) — InfluxQL pages points per series
    assert len(per_series) > 1
    for mins in per_series.values():
        assert mins == [10, 20]


def test_percentile_nearest_rank(points):
    out = compile_influxql(
        "SELECT percentile(value, 90) AS p90, count(value) AS n FROM points "
        "WHERE alias = 'temp' GROUP BY plc_ip",
        points,
    ).collect()
    assert out
    for r in out:
        vals = sorted(
            x["value"]
            for x in points.filter(
                (F.col("alias") == "temp") & (F.col("plc_ip") == r["plc_ip"])
            ).collect()
        )
        import math

        expect = vals[max(math.ceil(0.9 * len(vals)), 1) - 1]
        assert r["p90"] == expect  # an observed sample, nearest rank
        assert r["n"] == len(vals)


def test_top_bottom_selectors(points):
    top = compile_influxql(
        "SELECT top(value, 3) AS t FROM points GROUP BY alias", points
    ).collect()
    per = {}
    for r in top:
        per.setdefault(r["alias"], []).append(r["t"])
    for alias, got in per.items():
        vals = sorted(
            (x["value"] for x in points.filter(F.col("alias") == alias).collect()),
            reverse=True,
        )
        assert sorted(got, reverse=True) == vals[:3]
    bottom = compile_influxql(
        "SELECT bottom(value, 2) AS b FROM points GROUP BY alias", points
    ).collect()
    per_b = {}
    for r in bottom:
        per_b.setdefault(r["alias"], []).append(r["b"])
    for alias, got in per_b.items():
        vals = sorted(
            x["value"] for x in points.filter(F.col("alias") == alias).collect()
        )
        assert sorted(got) == vals[:2]
    with pytest.raises(InfluxQLError):
        parse_and_raise = compile_influxql(
            "SELECT top(value, 2), mean(value) FROM points", points
        )

# ---------------------------------------------------------------------------
# Transformations (derivative / difference / moving_average /
# cumulative_sum / elapsed) and round-2 aggregates (mode, integral,
# distinct, count(distinct)) — InfluxDB 1.x semantics.
# ---------------------------------------------------------------------------


def test_nested_derivative_of_mean(points):
    out = compile_influxql(
        "SELECT derivative(mean(value), 1m) AS dv FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(5m), plc_ip",
        points,
    ).collect()
    base = (
        points.filter(
            (F.col("ts") >= "2024-01-01 00:00:00")
            & (F.col("ts") < "2024-01-01 01:00:00")
        )
        .groupBy(F.window("ts", "300 seconds").start.alias("time"), "plc_ip")
        .agg(F.avg("value").alias("m"))
        .collect()
    )
    series = {}
    for r in sorted(base, key=lambda r: r["time"]):
        series.setdefault(r["plc_ip"], []).append((r["time"], r["m"]))
    exp = {}
    for ip, pts in series.items():
        for (t0, v0), (t1, v1) in zip(pts, pts[1:]):
            exp[(t1, ip)] = (v1 - v0) / ((t1 - t0).total_seconds() / 60.0)
    got = {(r["time"], r["plc_ip"]): r["dv"] for r in out}
    assert got.keys() == exp.keys()
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-9
    # one fewer bucket per series than the plain aggregate
    assert len(out) == len(base) - len(series)


def test_default_derivative_unit_is_bucket_width(points):
    # derivative(mean(v)) with GROUP BY time(5m) defaults unit to 5m →
    # plain bucket-over-bucket delta
    dv = compile_influxql(
        "SELECT derivative(mean(value)) AS dv FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(5m), plc_ip",
        points,
    ).collect()
    diff = compile_influxql(
        "SELECT difference(mean(value)) AS dv FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(5m), plc_ip",
        points,
    ).collect()
    a = {(r["time"], r["plc_ip"]): r["dv"] for r in dv}
    b = {(r["time"], r["plc_ip"]): r["dv"] for r in diff}
    assert a.keys() == b.keys()
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12


def test_moving_average_warmup(points):
    out = compile_influxql(
        "SELECT moving_average(mean(value), 4) AS ma FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(5m), plc_ip",
        points,
    ).collect()
    # 12 buckets per series, warm-up of 3 → 9 rows per series
    per_ip = {}
    for r in out:
        per_ip.setdefault(r["plc_ip"], []).append(r)
    assert all(len(v) == 9 for v in per_ip.values())
    assert all(r["ma"] is not None for r in out)


def test_cumulative_sum_and_mixed_warmup(points):
    out = compile_influxql(
        "SELECT cumulative_sum(sum(value)) AS cs, difference(sum(value)) AS d "
        "FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:30:00' "
        "GROUP BY time(10m)",
        points,
    ).collect()
    rows = sorted(out, key=lambda r: r["time"])
    # cumulative_sum emits from the first bucket; difference pads it null
    assert len(rows) == 3
    assert rows[0]["d"] is None and rows[0]["cs"] is not None
    assert abs(rows[-1]["cs"] - sum(
        r["cs"] - (rows[i - 1]["cs"] if i else 0) for i, r in enumerate(rows)
    )) < 1e-9


def test_non_negative_difference_drops_negatives(points):
    out = compile_influxql(
        "SELECT non_negative_difference(max(value)) AS d FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(5m), alias",
        points,
    ).collect()
    assert all(r["d"] >= 0 for r in out)


def test_elapsed_raw_series(points):
    out = compile_influxql(
        "SELECT elapsed(value, 1s) AS el FROM points WHERE alias = 'pressure' "
        "AND plc_ip = '192.168.0.1'",
        points,
    ).collect()
    # pressure points on one PLC sit 60 s apart (i % 3 == 0, even i)
    assert len(out) > 0
    assert all(r["el"] == 60 for r in out)


def test_mode_and_integral_and_count_distinct(points):
    out = compile_influxql(
        "SELECT mode(value) AS md, integral(value, 1m) AS itg, "
        "count(distinct(value)) AS cd FROM points WHERE alias = 'temp'",
        points,
    ).first()
    sub = [
        (r["ts"], r["value"])
        for r in points.filter(F.col("alias") == "temp")
        .orderBy("ts")
        .collect()
    ]
    vals = [v for _, v in sub]
    freq = {}
    for v in vals:
        freq[v] = freq.get(v, 0) + 1
    best = max(freq.values())
    assert out["md"] == min(v for v, c in freq.items() if c == best)
    assert out["cd"] == len(set(vals))
    trap = sum(
        (v1 + v0) / 2.0 * (t1 - t0).total_seconds() / 60.0
        for (t0, v0), (t1, v1) in zip(sub, sub[1:])
    )
    assert abs(out["itg"] - trap) < 1e-6


def test_distinct_selector(points):
    out = compile_influxql(
        "SELECT distinct(plc_ip) AS ip FROM points", points
    ).collect()
    assert sorted(r["ip"] for r in out) == ["192.168.0.1", "192.168.0.2"]


def test_where_neq_regex_and_field_predicates(points):
    out = compile_influxql(
        "SELECT count(value) AS n FROM points "
        "WHERE alias != 'temp' AND plc_ip =~ /0\\.1$/ AND value >= 10",
        points,
    ).first()
    exp = points.filter(
        (F.col("alias") != "temp")
        & F.col("plc_ip").rlike("0\\.1$")
        & (F.col("value") >= 10)
    ).count()
    assert out["n"] == exp > 0


def test_transform_parse_errors(points):
    with pytest.raises(InfluxQLError):
        parse("SELECT derivative(mean(value), 1s) FROM m")  # no GROUP BY time
    with pytest.raises(InfluxQLError):
        parse("SELECT moving_average(value) FROM m GROUP BY time(1m)")
    with pytest.raises(InfluxQLError):
        parse("SELECT elapsed(mean(value)) FROM m GROUP BY time(1m)")
    with pytest.raises(InfluxQLError):
        parse("SELECT distinct(value), max(value) FROM m")
    with pytest.raises(InfluxQLError):
        parse("SELECT integral(value) FROM m GROUP BY time(1m)")


def test_fill_linear_interpolates_gap(points):
    gappy = points.filter(
        ~F.col("ts").between("2024-01-01 00:20:00", "2024-01-01 00:29:59")
    )
    out = compile_influxql(
        "SELECT mean(value) AS m FROM points "
        "WHERE plc_ip = '192.168.0.1' "
        "AND time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(5m) fill(linear)",
        gappy,
    ).collect()
    rows = {r["time"].minute + 60 * r["time"].hour: r["m"] for r in out}
    # all 12 buckets present, none null (gap is interior)
    assert len(rows) == 12 and all(v is not None for v in rows.values())
    # the two emptied buckets sit on the line between their neighbors
    t15, t20, t25, t30 = rows[15], rows[20], rows[25], rows[30]
    assert abs(t20 - (t15 + (t30 - t15) / 3.0)) < 1e-9
    assert abs(t25 - (t15 + 2 * (t30 - t15) / 3.0)) < 1e-9


def test_from_regex_measurement(points):
    out = compile_influxql(
        "SELECT mean(value) AS m, count(value) AS n FROM /^192\\.168\\./ "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:30:00' "
        "GROUP BY time(10m)",
        points,
    ).collect()
    # implicit series split per matching measurement (plc_ip)
    ips = {r["plc_ip"] for r in out}
    assert ips == {"192.168.0.1", "192.168.0.2"}
    assert len(out) == 6  # 3 buckets x 2 measurements
    narrow = compile_influxql(
        "SELECT count(value) AS n FROM /0\\.2$/ "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:30:00'",
        points,
    ).collect()
    assert len(narrow) == 1 and narrow[0]["plc_ip"] == "192.168.0.2"


def test_select_scalar_math(points):
    out = compile_influxql(
        "SELECT mean(value) * 100 AS pct, count(value) - 1 AS nm1 FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:30:00' "
        "GROUP BY time(10m)",
        points,
    ).collect()
    base = compile_influxql(
        "SELECT mean(value) AS m, count(value) AS n FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:30:00' "
        "GROUP BY time(10m)",
        points,
    ).collect()
    got = {r["time"]: (r["pct"], r["nm1"]) for r in out}
    want = {r["time"]: (r["m"] * 100, r["n"] - 1) for r in base}
    assert got == want and len(got) == 3


def test_scalar_math_on_raw_and_transform(points):
    raw = compile_influxql(
        "SELECT value / 2 AS half FROM points WHERE alias = 'pressure' "
        "ORDER BY time ASC LIMIT 4",
        points,
    ).collect()
    src = compile_influxql(
        "SELECT value FROM points WHERE alias = 'pressure' "
        "ORDER BY time ASC LIMIT 4",
        points,
    ).collect()
    assert [r["half"] for r in raw] == [r["value"] / 2 for r in src]

    xf = compile_influxql(
        "SELECT difference(max(value)) * 10 AS d10 FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:30:00' "
        "GROUP BY time(10m)",
        points,
    ).collect()
    plain = compile_influxql(
        "SELECT difference(max(value)) AS d FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:30:00' "
        "GROUP BY time(10m)",
        points,
    ).collect()
    assert [r["d10"] for r in xf] == [r["d"] * 10 for r in plain]


def test_math_does_not_rescale_fill_literal(points):
    out = compile_influxql(
        "SELECT mean(value) * 100 AS pct FROM points "
        "WHERE alias = 'nope' "
        "AND time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:30:00' "
        "GROUP BY time(10m) fill(7)",
        points,
    ).collect()
    # no data → the grid-less grouped query yields no buckets... but with
    # both bounds the grid emits every interval; fill literal must stay 7
    assert len(out) == 3 and all(r["pct"] == 7.0 for r in out)


def test_group_by_time_offset(points):
    out = compile_influxql(
        "SELECT count(value) AS n FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(10m, 3m)",
        points,
    ).collect()
    # buckets align to :03, :13, :23... and rows partition among them
    assert all(r["time"].minute % 10 == 3 for r in out)
    assert sum(r["n"] for r in out) == points.filter(
        (F.col("ts") >= "2024-01-01 00:00:00")
        & (F.col("ts") < "2024-01-01 01:00:00")
    ).count()


def test_offset_fill_grid_alignment(points):
    gappy = points.filter(
        ~F.col("ts").between("2024-01-01 00:25:00", "2024-01-01 00:34:59")
    )
    out = compile_influxql(
        "SELECT count(value) AS n FROM points "
        "WHERE time >= '2024-01-01 00:05:00' AND time < '2024-01-01 00:55:00' "
        "GROUP BY time(10m, 5m) fill(0)",
        gappy,
    ).collect()
    times = sorted(r["time"].minute for r in out)
    assert times == [5, 15, 25, 35, 45]
    filled = {r["time"].minute: r["n"] for r in out}
    assert filled[25] == 0  # emptied bucket exists with the fill value


def test_tz_day_buckets(points, spark):
    # day buckets in America/New_York (UTC-5 in January): local midnight
    # is 05:00 UTC, and the WHERE literals are interpreted in that zone
    out = compile_influxql(
        "SELECT count(value) AS n FROM points "
        "WHERE time >= '2023-12-31 19:00:00' AND time < '2024-01-01 19:00:00' "
        "GROUP BY time(1d) tz('America/New_York')",
        points,
    ).collect()
    # 2023-12-31 19:00 NY == 2024-01-01 00:00 UTC == the whole dataset
    assert len(out) == 1
    (row,) = out
    assert row["n"] == points.count()
    # the bucket start is NY-midnight expressed in UTC
    assert (row["time"].hour, row["time"].minute) == (0, 0) or row[
        "time"
    ].hour == 5


def test_tz_explicit_zone_literal_is_absolute(spark):
    """InfluxDB time-literal semantics under tz(): a BARE literal is a
    wall-clock instant in the tz() zone, but an RFC3339 literal with an
    explicit zone (trailing Z / ±HH:MM) is an ABSOLUTE instant
    regardless of tz(). A Grafana range like time < '...Z' under
    tz('Europe/Warsaw') used to be re-shifted by the zone offset,
    silently dropping the last local-offset hour(s) of data."""
    import datetime as dtm

    df = spark.createDataFrame(
        [(dtm.datetime(2024, 1, 1, h), float(h)) for h in range(24)],
        "ts timestamp, value double",
    )
    # explicit-Z bound: absolute 12:00 UTC → 12 rows (00:00Z..11:00Z)
    out = compile_influxql(
        "SELECT count(value) AS n FROM m "
        "WHERE time >= '2024-01-01T00:00:00Z' "
        "AND time < '2024-01-01T12:00:00Z' tz('Europe/Warsaw')",
        df,
    ).collect()
    assert out[0]["n"] == 12
    # bare bound: 12:00 WARSAW wall-clock == 11:00 UTC → 11 rows
    out = compile_influxql(
        "SELECT count(value) AS n FROM m "
        "WHERE time >= '2024-01-01T00:00:00Z' "
        "AND time < '2024-01-01 12:00:00' tz('Europe/Warsaw')",
        df,
    ).collect()
    assert out[0]["n"] == 11
    # explicit numeric offset behaves like Z shifted by that offset:
    # 12:00+02:00 == 10:00 UTC → 10 rows
    out = compile_influxql(
        "SELECT count(value) AS n FROM m "
        "WHERE time < '2024-01-01T12:00:00+02:00' tz('Europe/Warsaw')",
        df,
    ).collect()
    assert out[0]["n"] == 10
    # without tz(): explicit-zone literal converts to UTC (identical
    # result to the bare UTC spelling)
    out = compile_influxql(
        "SELECT count(value) AS n FROM m "
        "WHERE time < '2024-01-01T05:00:00+01:00'",
        df,
    ).collect()
    assert out[0]["n"] == 4


def test_tz_with_fill_parses(points):
    # fill()+tz() composes now (DST-aware local grid); the statement
    # must parse cleanly — behavior is covered by the DST tests below
    q = parse(
        "SELECT mean(value) FROM m WHERE time >= '2024-01-01 00:00:00' "
        "AND time < '2024-01-02 00:00:00' GROUP BY time(1h) fill(previous) "
        "tz('America/New_York')"
    )
    assert q.fill == "previous" and q.tz == "America/New_York"


def test_show_databases_and_retention_policies(points):
    from iot_system_plc_data_to_influxdb_spark.functions.influxql import (
        compile_show,
    )

    dbs = compile_show("SHOW DATABASES", points).collect()
    assert [r["name"] for r in dbs] == ["iot"]
    rp = compile_show("SHOW RETENTION POLICIES ON iot", points).collect()
    assert len(rp) == 1
    assert rp[0]["name"] == "autogen" and rp[0]["default"] is True


def test_transform_inverse_property(points):
    """cumulative_sum(difference(x)) telescopes back to x - x0 per
    series — a dialect-level invariant across the two transforms."""
    base = compile_influxql(
        "SELECT sum(value) AS s FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(10m), plc_ip",
        points,
    ).collect()
    diff = compile_influxql(
        "SELECT difference(sum(value)) AS d FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(10m), plc_ip",
        points,
    ).collect()
    per_ip: dict = {}
    for r in sorted(base, key=lambda r: r["time"]):
        per_ip.setdefault(r["plc_ip"], []).append(r["s"])
    for ip, series in per_ip.items():
        deltas = [r["d"] for r in sorted(
            (x for x in diff if x["plc_ip"] == ip), key=lambda r: r["time"]
        )]
        run = 0.0
        for i, d in enumerate(deltas):
            run += d
            assert abs(run - (series[i + 1] - series[0])) < 1e-9


def test_select_into_backfill(points, spark, tmp_path):
    from iot_system_plc_data_to_influxdb_spark.api import IoTEngine

    engine = IoTEngine(spark)
    target, n = engine.influxql_into(
        'SELECT mean(value) AS m, count(value) AS n INTO "hourly_means" '
        "FROM points WHERE time >= '2024-01-01 00:00:00' "
        "AND time < '2024-01-01 01:00:00' GROUP BY time(30m), plc_ip",
        points,
        str(tmp_path),
    )
    assert target == "hourly_means"
    assert n == 4  # 2 buckets x 2 PLCs
    back = spark.read.parquet(str(tmp_path / "hourly_means"))
    direct = compile_influxql(
        "SELECT mean(value) AS m, count(value) AS n FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(30m), plc_ip",
        points,
    )
    key = lambda r: (r["time"], r["plc_ip"])  # noqa: E731
    assert {key(r): (r["m"], r["n"]) for r in back.collect()} == {
        key(r): (r["m"], r["n"]) for r in direct.collect()
    }


def test_into_parse_roundtrip():
    from iot_system_plc_data_to_influxdb_spark.functions.influxql import (
        split_into,
    )

    t, rest = split_into(
        "SELECT mean(value) INTO rollup FROM points GROUP BY time(1h)"
    )
    assert t == "rollup"
    assert "INTO" not in rest and parse(rest).group_time_s == 3600
    t2, same = split_into("SELECT mean(value) FROM points")
    assert t2 is None and same == "SELECT mean(value) FROM points"


def test_now_relative_bounds(points):
    # Grafana's time picker: WHERE time > now() - 30m (now injected for
    # the test; production resolves to the current UTC time)
    out = compile_influxql(
        "SELECT count(value) AS n FROM points WHERE time > now() - 30m "
        "AND time <= now()",
        points,
        now="2024-01-01 01:00:00",
    ).first()
    exp = points.filter(
        (F.col("ts") > "2024-01-01 00:30:00")
        & (F.col("ts") <= "2024-01-01 01:00:00")
    ).count()
    assert out["n"] == exp > 0


def test_now_bounds_feed_fill_grid(points):
    out = compile_influxql(
        "SELECT count(value) AS n FROM points "
        "WHERE time >= now() - 1h AND time < now() "
        "GROUP BY time(15m) fill(0)",
        points.filter(F.col("value") < -1),  # empty source
        now="2024-01-01 02:00:00",
    ).collect()
    assert len(out) == 4 and all(r["n"] == 0.0 for r in out)


def test_soffset_series_paging(points):
    def series(q):
        return {
            r["plc_ip"]
            for r in compile_influxql(q, points).collect()
        }

    base = (
        "SELECT mean(value) AS m FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(30m), plc_ip"
    )
    assert series(base + " SLIMIT 1") == {"192.168.0.1"}
    assert series(base + " SLIMIT 1 SOFFSET 1") == {"192.168.0.2"}
    assert series(base + " SLIMIT 2 SOFFSET 2") == set()


def test_epoch_numeric_time_literals(points):
    import datetime as dtm

    lo = dtm.datetime(2024, 1, 1, 0, 10)
    hi = dtm.datetime(2024, 1, 1, 0, 40)
    lo_ms = int((lo - dtm.datetime(1970, 1, 1)).total_seconds() * 1000)
    hi_ns = int((hi - dtm.datetime(1970, 1, 1)).total_seconds() * 1_000_000_000)
    out = compile_influxql(
        f"SELECT count(value) AS n FROM points "
        f"WHERE time >= {lo_ms}ms AND time < {hi_ns}",
        points,
    ).first()
    exp = points.filter(
        (F.col("ts") >= "2024-01-01 00:10:00")
        & (F.col("ts") < "2024-01-01 00:40:00")
    ).count()
    assert out["n"] == exp > 0


def test_selector_with_scalar_math(points):
    out = compile_influxql(
        "SELECT top(value, 3) * 2 AS double_top FROM points "
        "WHERE alias = 'temp'",
        points,
    ).collect()
    plain = compile_influxql(
        "SELECT top(value, 3) AS t FROM points WHERE alias = 'temp'",
        points,
    ).collect()
    assert sorted(r["double_top"] for r in out) == sorted(
        r["t"] * 2 for r in plain
    )


def test_tz_buckets_across_dst_transition(spark):
    # US spring-forward 2024-03-10: local midnight is 05:00 UTC before
    # and 04:00 UTC after; day buckets must follow the wall clock
    import datetime as dtm

    rows = []
    t = dtm.datetime(2024, 3, 9, 5, 0)  # 2024-03-09 00:00 NY
    while t < dtm.datetime(2024, 3, 12, 4, 0):  # through 03-11 NY
        rows.append((t, "p", 1.0))
        t += dtm.timedelta(hours=1)
    df = spark.createDataFrame(rows, "ts timestamp, plc_ip string, value double")
    out = compile_influxql(
        "SELECT count(value) AS n FROM m "
        "WHERE time >= '2024-03-09 00:00:00' AND time < '2024-03-12 00:00:00' "
        "GROUP BY time(1d) tz('America/New_York')",
        df,
        now=None,
    ).collect()
    got = {r["time"]: r["n"] for r in out}
    # three local days: 24h, 23h (spring forward), 24h
    assert sorted(got.values()) == [23, 24, 24]
    starts = sorted(got)
    # bucket starts sit at NY midnight: 05:00 UTC, 05:00 UTC, 04:00 UTC
    assert [s.hour for s in starts] == [5, 5, 4]


def test_transform_of_percentile(points):
    out = compile_influxql(
        "SELECT moving_average(percentile(value, 90), 2) AS mp FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(15m)",
        points,
    ).collect()
    base = compile_influxql(
        "SELECT percentile(value, 90) AS p FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(15m)",
        points,
    ).collect()
    ps = [r["p"] for r in sorted(base, key=lambda r: r["time"])]
    want = [(a + b) / 2 for a, b in zip(ps, ps[1:])]
    got = [r["mp"] for r in sorted(out, key=lambda r: r["time"])]
    assert got == want and len(got) == 3


def test_math_fn_of_aggregate(points):
    out = compile_influxql(
        "SELECT sqrt(mean(value)) AS s, ln(max(value)) AS l FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(30m), plc_ip",
        points,
    ).collect()
    exp = {
        (r["time"], r["plc_ip"]): (r["s"], r["l"])
        for r in points.filter(
            (F.col("ts") >= "2024-01-01 00:00:00")
            & (F.col("ts") < "2024-01-01 01:00:00")
        )
        .groupBy(F.window("ts", "1800 seconds").start.alias("time"), "plc_ip")
        .agg(
            F.sqrt(F.avg("value")).alias("s"),
            F.log(F.max("value")).alias("l"),
        )
        .collect()
    }
    assert {(r["time"], r["plc_ip"]): (r["s"], r["l"]) for r in out} == exp
    assert len(out) == 4


def test_math_fn_raw_field(points):
    import math

    out = compile_influxql(
        "SELECT abs(value) AS a, floor(value) AS f, value FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:05:00'",
        points,
    ).collect()
    assert len(out) == 30
    for r in out:
        assert r["a"] == abs(r["value"])
        assert r["f"] == math.floor(r["value"])


def test_math_fn_with_scalar_suffix(points):
    # sqrt(mean(value)) * 10 — function first, then the scalar suffix
    out = compile_influxql(
        "SELECT sqrt(mean(value)) * 10 AS s FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:30:00'",
        points,
    ).collect()
    exp = points.filter(
        (F.col("ts") >= "2024-01-01 00:00:00")
        & (F.col("ts") < "2024-01-01 00:30:00")
    ).agg((F.sqrt(F.avg("value")) * 10).alias("s")).collect()
    assert out[0]["s"] == exp[0]["s"]


def test_math_fn_rejects_second_argument(points):
    with pytest.raises(InfluxQLError):
        parse("SELECT round(value, 2) FROM points")


def test_holt_winters_no_season_matches_holt_fold(points):
    # S=0 → plain double-exponential Holt; replay the fold in python
    out = compile_influxql(
        "SELECT holt_winters(mean(value), 2, 0) AS hw FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(10m), plc_ip",
        points,
    ).collect()
    buckets = (
        points.filter(
            (F.col("ts") >= "2024-01-01 00:00:00")
            & (F.col("ts") < "2024-01-01 01:00:00")
        )
        .groupBy(F.window("ts", "600 seconds").start.alias("time"), "plc_ip")
        .agg(F.avg("value").alias("y"))
        .collect()
    )
    series = {}
    for r in sorted(buckets, key=lambda r: r["time"]):
        series.setdefault(r["plc_ip"], []).append((r["time"], r["y"]))
    exp = {}
    import datetime as dtm

    for ip, rows in series.items():
        ys = [y for _t, y in rows]
        lvl, trd = ys[0], 0.0
        for y in ys[1:]:
            l_new = 0.5 * y + (1 - 0.5) * (lvl + trd)
            trd = 0.1 * (l_new - lvl) + (1 - 0.1) * trd
            lvl = l_new
        last = rows[-1][0]
        for h in (1, 2):
            exp[(last + dtm.timedelta(seconds=600 * h), ip)] = lvl + h * trd
    assert {(r["time"], r["plc_ip"]): r["hw"] for r in out} == exp
    assert len(out) == 4


def test_holt_winters_insufficient_series_emits_nothing(spark):
    import datetime as dtm

    rows = [
        (dtm.datetime(2024, 1, 1, 0, m), "a", float(m)) for m in range(5)
    ]  # 5 buckets < 2*4
    df = spark.createDataFrame(rows, "ts timestamp, tag string, value double")
    out = compile_influxql(
        "SELECT holt_winters(mean(value), 2, 4) AS hw FROM m "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(1m), tag",
        df,
    ).collect()
    assert out == []


def test_holt_winters_validation(points):
    with pytest.raises(InfluxQLError):
        parse("SELECT holt_winters(mean(value), 3, 4), max(value) FROM m GROUP BY time(1h)")
    with pytest.raises(InfluxQLError):
        parse("SELECT holt_winters(mean(value), 3, 4) FROM m")
    with pytest.raises(InfluxQLError):
        parse("SELECT holt_winters(mean(value)) FROM m GROUP BY time(1h)")
    with pytest.raises(InfluxQLError):
        parse("SELECT holt_winters_with_fit(mean(value)) FROM m GROUP BY time(1h)")


def test_holt_winters_with_fit_emits_fitted_then_forecast(spark):
    """with_fit = the one-step-ahead fitted value at each observed
    bucket (pre-update model state), then the same N forecasts as the
    plain predictor — replayed bit-for-bit by a python fold."""
    import datetime as dtm

    rows = [
        (dtm.datetime(2024, 1, 1, 0, 0) + dtm.timedelta(hours=i), "a",
         float((i % 4) + i * 0.1))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, tag string, value double")
    out = compile_influxql(
        "SELECT holt_winters_with_fit(mean(value), 2, 4) AS hw FROM m "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-02 00:00:00' "
        "GROUP BY time(1h), tag",
        df,
    ).collect()
    ys = [(i % 4) + i * 0.1 for i in range(12)]
    a, b, g, s = 0.5, 0.1, 0.1, 4
    lvl = sum(ys[:4]) / 4.0
    trd = (sum(ys[4:8]) / 4.0 - lvl) / 4.0
    seas = [ys[i] - lvl for i in range(4)]
    exp = []
    for t in range(4, 12):
        si = t % s
        exp.append(lvl + trd + seas[si])
        l_new = a * (ys[t] - seas[si]) + (1 - a) * (lvl + trd)
        trd = b * (l_new - lvl) + (1 - b) * trd
        lvl = l_new
        seas[si] = g * (ys[t] - l_new) + (1 - g) * seas[si]
    exp += [lvl + h * trd + seas[(12 + h - 1) % 4] for h in (1, 2)]
    assert [r["hw"] for r in out] == exp
    # fitted rows sit AT the observed buckets (5th..12th), forecasts after
    assert out[0]["time"] == dtm.datetime(2024, 1, 1, 4, 0)
    assert out[-1]["time"] == dtm.datetime(2024, 1, 1, 13, 0)


def test_sample_selector_deterministic(points):
    q = (
        "SELECT sample(value, 3) AS v FROM points "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 00:30:00' "
        "GROUP BY plc_ip"
    )
    a = compile_influxql(q, points).collect()
    b = compile_influxql(q, points).collect()
    assert a == b
    assert len(a) == 6  # 3 per plc_ip
    # sampled rows are genuine points
    src = {
        (r["ts"], r["plc_ip"], r["value"])
        for r in points.filter(
            (F.col("ts") >= "2024-01-01 00:00:00")
            & (F.col("ts") < "2024-01-01 00:30:00")
        ).collect()
    }
    for r in a:
        assert (r["time"], r["plc_ip"], r["v"]) in src


def test_create_continuous_query_lifecycle(spark, points, tmp_path):
    from iot_system_plc_data_to_influxdb_spark.api import IoTEngine

    eng = IoTEngine(spark)
    st = eng.influxql(
        "CREATE CONTINUOUS QUERY cq_10m ON iot RESAMPLE EVERY 10m FOR 30m "
        "BEGIN SELECT mean(value) AS m, count(value) AS n INTO rollup_10m "
        "FROM points GROUP BY time(10m), plc_ip END",
        points,
    ).collect()
    assert st[0]["name"] == "cq_10m" and st[0]["target"] == "rollup_10m"
    listed = eng.influxql("SHOW CONTINUOUS QUERIES", points).collect()
    assert [r["name"] for r in listed] == ["cq_10m"]
    assert eng.continuous_queries["cq_10m"].resample_every_s == 600

    target, rows = eng.run_cq("cq_10m", points, str(tmp_path))
    assert target == "rollup_10m" and rows > 0
    rolled = spark.read.parquet(str(tmp_path / "rollup_10m"))
    exp = (
        points.groupBy(F.window("ts", "600 seconds").start.alias("time"), "plc_ip")
        .agg(F.avg("value").alias("m"), F.count("value").alias("n"))
        .collect()
    )
    got = {(r["time"], r["plc_ip"]): (r["m"], r["n"]) for r in rolled.collect()}
    assert got == {(r["time"], r["plc_ip"]): (r["m"], r["n"]) for r in exp}

    dropped = eng.influxql("DROP CONTINUOUS QUERY cq_10m ON iot", points).collect()
    assert dropped[0]["dropped"] is True
    assert eng.influxql("SHOW CONTINUOUS QUERIES", points).collect() == []


def test_or_group_multivalue_variable(points):
    """Grafana multi-value template variables emit parenthesized OR
    chains — ("host" = 'a' OR "host" = 'b') — ANDed with the rest."""
    out = compile_influxql(
        "SELECT mean(value) AS m FROM sensors "
        "WHERE (\"plc_ip\" = '192.168.0.1' OR \"plc_ip\" = '10.9.9.9') "
        "AND \"alias\" = 'temp' GROUP BY time(1h), plc_ip",
        points,
    ).collect()
    exp = (
        points.filter(
            (F.col("plc_ip") == "192.168.0.1") & (F.col("alias") == "temp")
        )
        .groupBy(F.date_trunc("hour", "ts").alias("time"), "plc_ip")
        .agg(F.avg("value").alias("m"))
        .collect()
    )
    assert sorted((r["time"], r["plc_ip"], r["m"]) for r in out) == sorted(
        (r["time"], r["plc_ip"], r["m"]) for r in exp
    )


def test_or_group_mixed_terms(points):
    """OR groups may mix tag and field predicates; time bounds may not."""
    out = compile_influxql(
        "SELECT count(value) AS n FROM m "
        "WHERE (\"alias\" = 'pressure' OR value >= 49.5)",
        points,
    ).collect()
    exp = points.filter(
        (F.col("alias") == "pressure") | (F.col("value") >= 49.5)
    ).count()
    assert out[0]["n"] == exp
    with pytest.raises(InfluxQLError, match="OR"):
        parse("SELECT mean(value) FROM m WHERE (time > now() - 1h OR \"a\" = 'b')")


def test_parenthesized_single_condition(points):
    """Grafana wraps builder conditions in parens even when single."""
    out = compile_influxql(
        "SELECT count(value) AS n FROM m WHERE (\"alias\" = 'temp')", points
    ).collect()
    assert out[0]["n"] == 400


def test_group_by_star(points):
    """GROUP BY * groups by every tag column (plc_ip, alias here)."""
    out = compile_influxql(
        "SELECT last(value) AS l FROM m GROUP BY *", points
    )
    assert sorted(out.columns) == ["alias", "l", "plc_ip"]
    got = {(r["plc_ip"], r["alias"]): r["l"] for r in out.collect()}
    exp = {
        (r["plc_ip"], r["alias"]): r["l"]
        for r in points.groupBy("plc_ip", "alias")
        .agg(F.max_by("value", "ts").alias("l"))
        .collect()
    }
    assert got == exp


def test_group_by_time_and_star_with_fill(points):
    out = compile_influxql(
        "SELECT mean(value) AS m FROM m GROUP BY time(1h), * fill(null)",
        points,
    )
    assert set(out.columns) == {"time", "plc_ip", "alias", "m"}
    # 600 points * 10s = 100 min span → 2 hourly buckets per series
    assert out.count() == 2 * 4


def test_agg_star_expands_numeric_fields(points):
    out = compile_influxql("SELECT mean(*) FROM m GROUP BY time(1h)", points)
    assert out.columns == ["time", "mean_value"]
    out2 = compile_influxql(
        "SELECT max(*) AS peak FROM m GROUP BY plc_ip", points
    )
    assert sorted(out2.columns) == ["peak_value", "plc_ip"]
    with pytest.raises(InfluxQLError):
        parse("SELECT top(*, 3) FROM m")


def test_agg_regex_field_selector(spark):
    """mean(/re/) expands to the regex-matched numeric fields only —
    InfluxDB's multi-field dashboard idiom (unanchored search, like
    Go's regexp)."""
    import datetime as dtm

    rows = [
        (dtm.datetime(2024, 1, 1, 0, m), float(m), float(m * 2), float(m * 3))
        for m in range(4)
    ]
    df = spark.createDataFrame(
        rows, "ts timestamp, load1 double, load5 double, temp double"
    )
    out = compile_influxql(
        "SELECT mean(/load/) FROM m "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(1h)",
        df,
    )
    assert out.columns == ["time", "mean_load1", "mean_load5"]
    row = out.collect()[0]
    assert row["mean_load1"] == 1.5 and row["mean_load5"] == 3.0
    with pytest.raises(InfluxQLError):
        compile_influxql("SELECT mean(/nomatch/) FROM m", df)
    with pytest.raises(InfluxQLError):
        parse("SELECT top(/load/, 3) FROM m")
    # raw regex projection expands to matching columns (fields + tags)
    raw = compile_influxql(
        "SELECT /load/ FROM m "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00'",
        df,
    )
    assert raw.columns == ["ts", "load1", "load5"] and raw.count() == 4


def test_field_regex_keeps_python_only_syntax(spark):
    """Field-name projection regexes execute purely Python-side, so
    Python-only syntax like (?P<name>...) must keep working there
    (real InfluxDB's Go RE2 accepts it) — the JVM compile check is
    scoped to rlike-destined measurement/tag/key patterns only."""
    import datetime as dtm

    rows = [
        (dtm.datetime(2024, 1, 1, 0, m), float(m), float(m * 2))
        for m in range(4)
    ]
    df = spark.createDataFrame(
        rows, "ts timestamp, load1 double, temp double"
    )
    out = compile_influxql(
        "SELECT mean(/(?P<x>load.*)/) FROM m "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(1h)",
        df,
    )
    assert out.columns == ["time", "mean_load1"]
    assert out.collect()[0]["mean_load1"] == 1.5
    raw = compile_influxql(
        "SELECT /(?P<x>load.*)/ FROM m "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00'",
        df,
    )
    assert raw.columns == ["ts", "load1"] and raw.count() == 4
    # tag/measurement regexes stay JVM-validated: same syntax errors
    with pytest.raises(InfluxQLError, match="invalid regex"):
        compile_influxql(
            "SELECT mean(load1) FROM m WHERE \"host\" =~ /(?P<h>a.*)/",
            df.withColumn("host", F.lit("a")),
        )


def test_quoted_measurement_names_parse():
    """Measurement identifiers with spaces parse when double-quoted —
    Grafana quotes every measurement it emits."""
    q = parse('SELECT mean(value) FROM "m with space" GROUP BY time(1h)')
    assert q.measurement == "m with space"
    q2 = parse('SELECT value FROM db."retention policy"."my m"')
    assert '"my m"' in q2.measurement


def test_grafana_type_suffixes_are_stripped(spark):
    """::field / ::tag disambiguators from Grafana's query builder are
    no-ops — the same statement compiles with and without them."""
    import datetime as dtm

    rows = [
        (dtm.datetime(2024, 1, 1, 0, m), "a", float(m)) for m in range(4)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, tag1 string, value double")
    out = compile_influxql(
        'SELECT mean("value"::field) AS mv FROM m '
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-01 01:00:00' "
        'GROUP BY time(1h), "tag1"::tag',
        df,
    ).collect()
    assert len(out) == 1 and out[0]["mv"] == 1.5 and out[0]["tag1"] == "a"


def test_show_series(points, spark):
    from iot_system_plc_data_to_influxdb_spark.functions.influxql import (
        compile_show,
    )

    keys = [r["key"] for r in compile_show("SHOW SERIES", points).collect()]
    assert keys == ["192.168.0.1", "192.168.0.2"]
    tagged = points.withColumn(
        "tags", F.create_map(F.lit("unit"), F.lit("c"))
    )
    keys2 = [r["key"] for r in compile_show("SHOW SERIES", tagged).collect()]
    assert keys2 == ["192.168.0.1,unit=c", "192.168.0.2,unit=c"]


def test_show_templating_variants(points, spark):
    """Grafana chained template variables: WITH KEY IN / =~, WHERE tag
    conditions on SHOW, and WITH MEASUREMENT =~ on SHOW MEASUREMENTS."""
    from iot_system_plc_data_to_influxdb_spark.functions.influxql import (
        InfluxQLError,
        compile_show,
    )

    tagged = points.withColumn(
        "tags",
        F.when(
            F.col("plc_ip") == "192.168.0.1",
            F.create_map(F.lit("unit"), F.lit("c"), F.lit("room"), F.lit("a")),
        ).otherwise(
            F.create_map(F.lit("unit"), F.lit("bar"), F.lit("room"), F.lit("b"))
        ),
    )
    both = [
        (r["key"], r["value"])
        for r in compile_show(
            'SHOW TAG VALUES WITH KEY IN ("unit", "room")', tagged
        ).collect()
    ]
    assert both == [("room", "a"), ("room", "b"), ("unit", "bar"), ("unit", "c")]
    rex = [
        (r["key"], r["value"])
        for r in compile_show(
            "SHOW TAG VALUES WITH KEY =~ /uni/", tagged
        ).collect()
    ]
    assert rex == [("unit", "bar"), ("unit", "c")]
    chained = [
        r["value"]
        for r in compile_show(
            "SHOW TAG VALUES WITH KEY = \"unit\" WHERE \"room\" = 'a'", tagged
        ).collect()
    ]
    assert chained == ["c"]
    ms = [
        r["name"]
        for r in compile_show(
            "SHOW MEASUREMENTS WITH MEASUREMENT =~ /0\\.2/", tagged
        ).collect()
    ]
    assert ms == ["192.168.0.2"]
    series = [
        r["key"]
        for r in compile_show(
            "SHOW SERIES WHERE plc_ip = '192.168.0.1'", tagged
        ).collect()
    ]
    assert series == ["192.168.0.1,room=a,unit=c"]
    with pytest.raises(InfluxQLError):
        compile_show("SHOW TAG VALUES WITH KEY = \"unit\" WHERE value > 3", tagged)
    # parenthesized + ::tag-suffixed condition (Grafana builder output)
    chained2 = [
        r["value"]
        for r in compile_show(
            "SHOW TAG VALUES WITH KEY = \"unit\" WHERE (\"room\"::tag = 'b')",
            tagged,
        ).collect()
    ]
    assert chained2 == ["bar"]
    # != keeps series that lack the tag entirely (missing tag = '')
    half = points.withColumn(
        "tags",
        F.when(
            F.col("plc_ip") == "192.168.0.1",
            F.create_map(F.lit("room"), F.lit("a")),
        ).otherwise(F.create_map(F.lit("unit"), F.lit("c"))),
    )
    ms2 = [
        r["name"]
        for r in compile_show(
            "SHOW MEASUREMENTS WHERE \"room\" != 'a'", half
        ).collect()
    ]
    assert ms2 == ["192.168.0.2"]  # untagged-for-room series retained
    # malformed regex → typed error, not re.error
    with pytest.raises(InfluxQLError):
        compile_show("SHOW TAG VALUES WITH KEY =~ /[/", tagged)


def test_field_arithmetic_aggregate(points):
    """mean(a) / mean(b) — the Grafana efficiency-panel idiom."""
    pts = points.withColumn("other", F.col("value") + 1.0)
    out = compile_influxql(
        "SELECT mean(value) / mean(other) AS eff FROM m "
        "GROUP BY time(1h), plc_ip",
        pts,
    ).collect()
    exp = (
        pts.groupBy(F.date_trunc("hour", "ts").alias("time"), "plc_ip")
        .agg((F.avg("value") / F.avg("other")).alias("eff"))
        .collect()
    )
    assert {(r["time"], r["plc_ip"]): r["eff"] for r in out} == {
        (r["time"], r["plc_ip"]): r["eff"] for r in exp
    }


def test_field_arithmetic_raw_and_default_alias(points):
    pts = points.withColumn("other", F.col("value") * 2 + 1.0)
    out = compile_influxql("SELECT value / other FROM m LIMIT 3", pts)
    assert out.columns == ["ts", "value_other"]
    assert out.count() == 3
    out2 = compile_influxql(
        "SELECT max(value) - min(value) FROM m GROUP BY plc_ip", pts
    )
    assert sorted(out2.columns) == ["max_min", "plc_ip"]
    with pytest.raises(InfluxQLError):
        parse("SELECT derivative(mean(value), 1s) + mean(other) "
              "FROM m GROUP BY time(1h)")


def test_from_multiple_measurements(points):
    """FROM m1, m2 — one series per measurement, like FROM /regex/."""
    out = compile_influxql(
        'SELECT count(value) AS n FROM "192.168.0.1", "192.168.0.2" '
        "GROUP BY time(1h)",
        points,
    )
    assert "plc_ip" in out.columns
    got = {(r["time"], r["plc_ip"]): r["n"] for r in out.collect()}
    exp = {
        (r["time"], r["plc_ip"]): r["n"]
        for r in points.groupBy(
            F.date_trunc("hour", "ts").alias("time"), "plc_ip"
        )
        .agg(F.count("value").alias("n"))
        .collect()
    }
    assert got == exp
    only = compile_influxql(
        'SELECT count(value) AS n FROM "192.168.0.1"', points
    ).collect()
    # single-measurement FROM is untouched: no implicit filter/grouping
    assert only[0]["n"] == 600


def test_rollup_bypassed_for_new_where_shapes(points, spark, tmp_path):
    """OR groups, binops, wildcards, and multi-measurement FROM are not
    mergeable from the rollup — each must fall back to raw points and
    still produce the raw-path result."""
    from iot_system_plc_data_to_influxdb_spark.streaming.rollup import (
        backfill_downsample,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rollup_path = str(tmp_path / "rollup1m")
    assert backfill_downsample(spark, points, rollup_path, every="1 minute") > 0
    rollup = spark.read.parquet(rollup_path)

    stmts = [
        "SELECT mean(value) AS m FROM points "
        "WHERE time >= '2024-01-01 00:10:00' AND time < '2024-01-01 01:00:00' "
        "AND (\"plc_ip\" = '192.168.0.1' OR \"plc_ip\" = '192.168.0.2') "
        "GROUP BY time(5m), plc_ip",
        "SELECT max(value) - min(value) AS rng FROM points "
        "WHERE time >= '2024-01-01 00:10:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(5m)",
        'SELECT count(value) AS n FROM "192.168.0.1", "192.168.0.2" '
        "WHERE time >= '2024-01-01 00:10:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(5m)",
    ]
    for q in stmts:
        routed = compile_influxql(q, points, rollup, 60)
        assert not any("rollup1m" in f for f in routed.inputFiles()), q
        raw = compile_influxql(q, points)
        assert sorted(map(str, routed.collect())) == sorted(
            map(str, raw.collect())
        ), q

    # mean(*) expands to mean(value) BEFORE routing eligibility — a
    # pure rewrite, so it MAY serve from the rollup and must still
    # equal the raw-path result
    qstar = (
        "SELECT mean(*) FROM points "
        "WHERE time >= '2024-01-01 00:10:00' AND time < '2024-01-01 01:00:00' "
        "GROUP BY time(5m)"
    )
    routed = compile_influxql(qstar, points, rollup, 60)
    assert any("rollup1m" in f for f in routed.inputFiles())
    raw = compile_influxql(qstar, points).collect()
    got = {r["time"]: r["mean_value"] for r in routed.collect()}
    exp = {r["time"]: r["mean_value"] for r in raw}
    assert set(got) == set(exp)
    for k in got:
        assert abs(got[k] - exp[k]) < 1e-9


def test_show_cardinality_and_limit(points, spark):
    from iot_system_plc_data_to_influxdb_spark.functions.influxql import (
        compile_show,
    )

    n = compile_show("SHOW SERIES CARDINALITY", points).collect()
    assert n[0]["count"] == 2
    n2 = compile_show("SHOW MEASUREMENT EXACT CARDINALITY", points).collect()
    assert n2[0]["count"] == 2
    n3 = compile_show("SHOW FIELD KEY CARDINALITY", points).collect()
    assert n3[0]["count"] == 2  # temp, pressure
    lim = compile_show("SHOW MEASUREMENTS LIMIT 1", points).collect()
    assert [r["name"] for r in lim] == ["192.168.0.1"]
    tv = compile_show(
        'SHOW TAG VALUES CARDINALITY WITH KEY = "unit"',
        points.withColumn("tags", F.create_map(F.lit("unit"), F.lit("c"))),
    ).collect()
    assert tv[0]["count"] == 1


def test_binop_default_alias_dedup(points):
    """Two unaliased binops sharing a default alias must NOT collapse
    into one column — the second gets an InfluxDB-style _1 suffix."""
    pts = points.withColumn("other", F.col("value") * 2 + 1.0)
    out = compile_influxql(
        "SELECT max(value) - min(value), max(other) - min(other) "
        "FROM m GROUP BY plc_ip",
        pts,
    )
    assert sorted(out.columns) == ["max_min", "max_min_1", "plc_ip"]
    r = {row["plc_ip"]: row for row in out.collect()}
    for ip in ("192.168.0.1", "192.168.0.2"):
        grp = pts.filter(F.col("plc_ip") == ip)
        vmax, vmin, omax, omin = grp.agg(
            F.max("value"), F.min("value"), F.max("other"), F.min("other")
        ).first()
        assert r[ip]["max_min"] == vmax - vmin
        assert r[ip]["max_min_1"] == omax - omin


def test_binop_explicit_alias_collision_raises(points):
    with pytest.raises(InfluxQLError, match="duplicate result alias"):
        parse(
            "SELECT max(value) - min(value) AS r, "
            "max(other) - min(other) AS r FROM m"
        )


def test_raw_binop_with_group_time_raises_typed_error(points):
    pts = points.withColumn("other", F.col("value") + 1.0)
    with pytest.raises(InfluxQLError):
        compile_influxql(
            "SELECT value / other FROM m GROUP BY time(1h)", pts
        )


def test_quoted_paren_inside_where_condition(points):
    """A quoted tag value containing a paren must not desync the
    outer-paren stripper's depth count."""
    pts = points.withColumn("name", F.lit(")"))
    out = compile_influxql(
        "SELECT count(value) AS n FROM m WHERE (\"name\" = ')')", pts
    ).collect()
    assert out[0]["n"] == 600
    none = compile_influxql(
        "SELECT count(value) AS n FROM m WHERE (\"name\" = '(x')", pts
    ).collect()
    assert none[0]["n"] == 0


def test_multi_measurement_raw_select_projects_measurement(points):
    """FROM m1, m2 without aggregation: rows from different
    measurements must stay distinguishable (InfluxDB emits one series
    per measurement)."""
    out = compile_influxql(
        'SELECT value FROM "192.168.0.1", "192.168.0.2" LIMIT 10', points
    )
    assert "plc_ip" in out.columns
    assert out.count() == 10
    both = compile_influxql(
        'SELECT value FROM "192.168.0.1", "192.168.0.2"', points
    )
    assert set(r["plc_ip"] for r in both.collect()) == {
        "192.168.0.1",
        "192.168.0.2",
    }


def test_multi_measurement_raw_binop_projects_measurement(points):
    pts = points.withColumn("other", F.col("value") * 2 + 1.0)
    out = compile_influxql(
        'SELECT value / other FROM "192.168.0.1", "192.168.0.2"', pts
    )
    assert "plc_ip" in out.columns
    assert set(out.columns) == {"ts", "plc_ip", "value_other"}


def test_fill_with_tz_daily_buckets_across_dst(spark):
    """fill() + tz(): the bucket grid is uniform on the LOCAL clock, so
    across spring-forward the UTC bucket starts are 23h apart — and the
    empty buckets still materialize with fill(previous) carried over."""
    pts = spark.createDataFrame(
        [
            ("2024-03-08 15:00:00", "p1", "temp", 10.0),
            ("2024-03-12 15:00:00", "p1", "temp", 50.0),
        ],
        "ts string, plc_ip string, alias string, value double",
    ).select(F.col("ts").cast("timestamp"), "plc_ip", "alias", "value")
    out = compile_influxql(
        "SELECT mean(value) AS m FROM points "
        "WHERE time >= '2024-03-08 00:00:00' AND time < '2024-03-13 00:00:00' "
        "GROUP BY time(1d) fill(previous) tz('America/New_York')",
        pts,
    )
    rows = out.orderBy("time").collect()
    assert len(rows) == 5  # one bucket per local day, 03-08 .. 03-12
    local = [
        r["local"]
        for r in out.select(
            F.from_utc_timestamp("time", "America/New_York").alias("local")
        )
        .orderBy("local")
        .collect()
    ]
    # every bucket starts at LOCAL midnight...
    assert all(t.hour == 0 and t.minute == 0 for t in local)
    # ...so the UTC spacing shrinks to 23h across the 03-10 transition
    diffs = [
        int((b["time"] - a["time"]).total_seconds())
        for a, b in zip(rows, rows[1:])
    ]
    assert 23 * 3600 in diffs and 24 * 3600 in diffs
    # fill(previous) carried the 03-08 value through the empty days
    assert [r["m"] for r in rows] == [10.0, 10.0, 10.0, 10.0, 50.0]


def test_fill_with_tz_hourly_spring_forward_skips_nonexistent_hour(spark):
    """Hourly grid over the spring-forward morning: local 02:00 does
    not exist — the grid must not emit a duplicate/phantom UTC bucket."""
    pts = spark.createDataFrame(
        [("2024-03-10 00:30:00", "p1", "temp", 1.0)],
        "ts string, plc_ip string, alias string, value double",
    ).select(
        F.to_utc_timestamp(F.col("ts").cast("timestamp"), "America/New_York").alias("ts"),
        "plc_ip",
        "alias",
        "value",
    )
    out = compile_influxql(
        "SELECT count(value) AS n FROM points "
        "WHERE time >= '2024-03-10 00:00:00' AND time < '2024-03-10 06:00:00' "
        "GROUP BY time(1h) fill(0) tz('America/New_York')",
        pts,
    )
    rows = out.orderBy("time").collect()
    times = [r["time"] for r in rows]
    assert len(times) == len(set(times))  # no duplicate UTC buckets
    # local hours 00,01,03,04,05 — five buckets, 02:00 never existed
    assert len(rows) == 5
    assert [r["n"] for r in rows] == [1, 0, 0, 0, 0]


def test_scalar_math_chains_with_precedence(spark, points):
    """mean(v) * 9 / 5 + 32 — the Grafana unit-conversion chain — with
    standard arithmetic precedence (+ 1 * 2 adds 2, not (x+1)*2)."""
    from iot_system_plc_data_to_influxdb_spark.functions.influxql import (
        compile_statement,
    )

    base = compile_statement("SELECT mean(value) FROM points", points)
    m = base.collect()[0]["mean"]
    f = compile_statement(
        "SELECT mean(value) * 9 / 5 + 32 FROM points", points
    ).collect()[0]["mean"]
    assert abs(f - (m * 9 / 5 + 32)) < 1e-9
    p = compile_statement(
        "SELECT mean(value) + 1 * 2 FROM points", points
    ).collect()[0]["mean"]
    assert abs(p - (m + 2)) < 1e-9


def test_scalar_math_any_shape(spark, points):
    """Literal-first, parenthesized, and unary-minus arithmetic around
    one aggregate — all the ways dashboards write unit conversions."""
    from iot_system_plc_data_to_influxdb_spark.functions.influxql import (
        compile_statement,
    )

    m = compile_statement("SELECT mean(value) FROM points", points).collect()[0]["mean"]
    cases = {
        "SELECT 100 * mean(value) FROM points": 100 * m,
        "SELECT (mean(value) * 9 / 5) + 32 FROM points": m * 9 / 5 + 32,
        "SELECT -mean(value) FROM points": -m,
        "SELECT (mean(value) + 1) * 2 FROM points": (m + 1) * 2,
        "SELECT 1 - mean(value) AS inv FROM points": 1 - m,
    }
    for q, want in cases.items():
        col = "inv" if "AS inv" in q else "mean"
        got = compile_statement(q, points).collect()[0][col]
        assert abs(got - want) < 1e-9, q


def test_selector_companion_columns(spark, points):
    """SELECT top(value, N), <tag> — companions come from the selected
    rows; a companion that is already a GROUP BY tag is not duplicated;
    mixing a selector with another aggregate stays a typed error."""
    import pytest as _pytest

    from iot_system_plc_data_to_influxdb_spark.functions.influxql import (
        InfluxQLError,
        compile_statement,
    )

    rows = compile_statement(
        "SELECT top(value, 3), plc_ip FROM points", points
    ).collect()
    assert len(rows) == 3 and all(r["plc_ip"] is not None for r in rows)
    # companion values must belong to the selected rows
    raw = {
        (r["ts"], r["value"]): r["plc_ip"]
        for r in points.select("ts", "value", "plc_ip").collect()
    }
    for r in rows:
        assert raw[(r["time"], r["top"])] == r["plc_ip"]

    grouped = compile_statement(
        "SELECT top(value, 1), plc_ip FROM points GROUP BY plc_ip", points
    )
    assert grouped.columns.count("plc_ip") == 1

    with _pytest.raises(InfluxQLError):
        compile_statement("SELECT top(value, 3), mean(value) FROM points", points)


def test_compound_durations_and_time_math(spark, points):
    """1h30m == 90m everywhere durations appear; literal ± duration and
    now() ± compound duration in WHERE."""
    from iot_system_plc_data_to_influxdb_spark.functions.influxql import (
        compile_statement,
    )

    a = compile_statement(
        "SELECT mean(value) FROM points GROUP BY time(1h30m)", points
    ).collect()
    b = compile_statement(
        "SELECT mean(value) FROM points GROUP BY time(90m)", points
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b] and len(a) > 0

    lo = compile_statement(
        "SELECT value FROM points WHERE time >= '2024-01-01 00:30:00' + 30m",
        points,
    ).count()
    direct = compile_statement(
        "SELECT value FROM points WHERE time >= '2024-01-01 01:00:00'", points
    ).count()
    assert lo == direct > 0

    d = compile_statement(
        "SELECT derivative(mean(value), 1h30m) FROM points GROUP BY time(1h)",
        points,
    ).collect()
    d2 = compile_statement(
        "SELECT derivative(mean(value), 90m) FROM points GROUP BY time(1h)",
        points,
    ).collect()
    assert [tuple(r) for r in d] == [tuple(r) for r in d2] and len(d) > 0


def test_global_selector_is_take_ordered(points):
    """No-GROUP-BY top()/bottom() must compile to TakeOrderedAndProject
    (per-partition heaps), never an unpartitioned row_number window
    that funnels the whole measurement through one partition."""
    import contextlib
    import io

    df = compile_influxql("SELECT top(value, 3), plc_ip FROM points", points)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_int_literal_arithmetic_keeps_bigint(points):
    """count(v) * 2 stays an integer on the wire (InfluxDB returns
    bigint for integer aggregate arithmetic, not 20.0)."""
    out = compile_influxql(
        "SELECT count(value) * 2 AS n2 FROM points WHERE alias = 'temp'",
        points,
    )
    assert dict(out.dtypes)["n2"] == "bigint"
    [row] = out.collect()
    assert isinstance(row["n2"], int) and row["n2"] == 800


def test_bad_time_literal_raises_influxql_error(points):
    """Parser totality: a garbage time literal in time±duration math is
    an InfluxQLError, never a bare ValueError."""
    with pytest.raises(InfluxQLError):
        compile_influxql(
            "SELECT mean(value) FROM points WHERE time >= 'garbage' + 1h",
            points,
        )


def test_two_arg_math_functions(points):
    """pow/atan2/log with a numeric second argument — raw fields and
    aggregates (ulp-risky cross-libm, so checked vs Spark-native here
    rather than hash-checked vs DuckDB)."""
    import math

    out = compile_influxql(
        "SELECT pow(value, 2) AS p, atan2(value, 2) AS a, "
        "log(value, 2) AS lg FROM points "
        "WHERE value > 0 AND time < '2024-01-01 00:05:00'",
        points,
    ).collect()
    src = {
        r["ts"]: r["value"]
        for r in points.filter(
            (F.col("value") > 0) & (F.col("ts") < "2024-01-01 00:05:00")
        ).collect()
    }
    assert len(out) == len(src)
    for r in out:
        v = src[r["ts"]]
        assert r["p"] == pytest.approx(v**2)
        assert r["a"] == pytest.approx(math.atan2(v, 2))
        assert r["lg"] == pytest.approx(math.log2(v))

    agg = compile_influxql(
        "SELECT pow(max(value), 2) AS pm FROM points", points
    ).collect()
    vmax = points.agg(F.max("value")).first()[0]
    assert agg[0]["pm"] == pytest.approx(vmax**2)

    with pytest.raises(InfluxQLError):
        compile_influxql("SELECT pow(value) FROM points", points)
    with pytest.raises(InfluxQLError):
        compile_influxql("SELECT log(value, 5m) FROM points", points)


def test_slimit_without_tag_grouping(points):
    """One series when there is no GROUP BY <tag>: SLIMIT n≥1 is the
    identity, SOFFSET ≥1 pages past everything (InfluxDB accepts both
    — previously this raised)."""
    base = (
        "SELECT mean(value) FROM points "
        "WHERE time < '2024-01-01 01:00:00' GROUP BY time(10m)"
    )
    plain = compile_influxql(base, points).collect()
    slimited = compile_influxql(base + " SLIMIT 2", points).collect()
    assert slimited == plain
    assert compile_influxql(base + " SLIMIT 1 SOFFSET 1", points).count() == 0
    # raw (non-grouped) select: same single-series semantics
    raw = "SELECT value FROM points LIMIT 5"
    assert compile_influxql(raw + " SLIMIT 3", points).count() == 5
    assert compile_influxql(raw + " SOFFSET 2", points).count() == 0


def test_top_bottom_per_tag(points):
    """top(field, tag, N): the extreme point of each tag series, for
    the N most extreme tags; ties broken value-then-earliest-time."""
    out = compile_influxql(
        "SELECT top(value, alias, 2) FROM points", points
    ).collect()
    assert {r["alias"] for r in out} <= {"temp", "pressure"}
    assert len(out) == 2
    # expected: per-alias max value with earliest ts, top 2 aliases
    exp = {}
    for r in points.collect():
        cur = exp.get(r["alias"])
        key = (r["value"], -r["ts"].timestamp())
        if cur is None or key > (cur[0], -cur[1].timestamp()):
            exp[r["alias"]] = (r["value"], r["ts"])
    want = sorted(
        ((v, ts, a) for a, (v, ts) in exp.items()),
        key=lambda x: (-x[0], x[1], x[2]),
    )[:2]
    got = sorted(
        ((r["top"], r["time"], r["alias"]) for r in out),
        key=lambda x: (-x[0], x[1], x[2]),
    )
    assert got == [(v, ts, a) for v, ts, a in want]

    bot = compile_influxql(
        "SELECT bottom(value, plc_ip, 1) AS b FROM points", points
    ).collect()
    vmin = points.agg(F.min("value")).first()[0]
    assert len(bot) == 1 and bot[0]["b"] == vmin

    with pytest.raises(InfluxQLError):
        compile_influxql(
            "SELECT top(value, alias, 2) FROM points GROUP BY time(1h)",
            points,
        )
    with pytest.raises(InfluxQLError):
        compile_influxql(
            "SELECT top(value, alias, 2), mean(value) FROM points", points
        )


def test_ta_ema_matches_pandas(points):
    """Front-door EXPONENTIAL_MOVING_AVERAGE == pandas ewm(adjust=False)
    per series, bucket-for-bucket."""
    import pandas as pd

    out = compile_influxql(
        "SELECT exponential_moving_average(mean(value), 5) AS ema "
        "FROM points GROUP BY time(1m), plc_ip",
        points,
    ).toPandas()
    base = compile_influxql(
        "SELECT mean(value) AS m FROM points GROUP BY time(1m), plc_ip",
        points,
    ).toPandas()
    for plc, grp in base.groupby("plc_ip"):
        want = (
            grp.sort_values("time")["m"].ewm(alpha=2.0 / 6.0, adjust=False)
            .mean()
            .tolist()
        )
        got = (
            out[out["plc_ip"] == plc].sort_values("time")["ema"].tolist()
        )
        assert got == pytest.approx(want, abs=1e-12)


def test_ta_oscillators_reference_series(points):
    """RSI/CMO/KER/KAMA against independent reference folds on one
    series, including warm-up null placement."""
    out = (
        compile_influxql(
            "SELECT relative_strength_index(count(value), 4) AS rsi, "
            "chande_momentum_oscillator(count(value), 3) AS cmo, "
            "kaufmans_efficiency_ratio(count(value), 3) AS ker, "
            "kaufmans_adaptive_moving_average(count(value), 3) AS kama "
            "FROM points WHERE \"plc_ip\" = '192.168.0.1' "
            "GROUP BY time(5m)",
            points,
        )
        .orderBy("time")
        .collect()
    )
    counts = [
        r["n"]
        for r in compile_influxql(
            "SELECT count(value) AS n FROM points "
            "WHERE \"plc_ip\" = '192.168.0.1' GROUP BY time(5m)",
            points,
        )
        .orderBy("time")
        .collect()
    ]
    m = len(counts)
    diffs = [counts[i] - counts[i - 1] for i in range(1, m)]

    # reference RSI (Wilder, N=4)
    want_rsi = [None] * m
    ag = sum(max(d, 0) for d in diffs[:4]) / 4
    al = sum(max(-d, 0) for d in diffs[:4]) / 4
    want_rsi[4] = 100.0 if al == 0 else 100.0 - 100.0 / (1.0 + ag / al)
    for i in range(5, m):
        d = diffs[i - 1]
        ag = (ag * 3 + max(d, 0)) / 4
        al = (al * 3 + max(-d, 0)) / 4
        want_rsi[i] = 100.0 if al == 0 else 100.0 - 100.0 / (1.0 + ag / al)
    # reference CMO/KER/KAMA (N=3)
    want_cmo, want_ker, want_kama = [None] * m, [None] * m, [None] * m
    y = None
    for i in range(3, m):
        win = diffs[i - 3 : i]
        s_up = sum(max(d, 0) for d in win)
        s_dn = sum(max(-d, 0) for d in win)
        tot = s_up + s_dn
        want_cmo[i] = 0.0 if tot == 0 else 100.0 * (s_up - s_dn) / tot
        er = 0.0 if tot == 0 else abs(counts[i] - counts[i - 3]) / tot
        want_ker[i] = er
        t = er * (2.0 / 3.0 - 2.0 / 31.0) + 2.0 / 31.0
        if y is None:
            y = float(counts[2])
        y = y + t * t * (counts[i] - y)
        want_kama[i] = y

    # warm filter drops rows where nothing is defined (i < 3)
    assert len(out) == m - 3
    for j, r in enumerate(out):
        i = j + 3
        for col, want in (
            ("rsi", want_rsi[i]),
            ("cmo", want_cmo[i]),
            ("ker", want_ker[i]),
            ("kama", want_kama[i]),
        ):
            if want is None:
                assert r[col] is None, (col, i)
            else:
                assert r[col] == pytest.approx(want, abs=1e-12), (col, i)


def test_ta_parse_errors():
    with pytest.raises(InfluxQLError):
        parse("SELECT exponential_moving_average(mean(value)) FROM p "
              "GROUP BY time(1m)")  # missing period
    with pytest.raises(InfluxQLError):
        parse("SELECT relative_strength_index(mean(value), 2h) FROM p "
              "GROUP BY time(1m)")  # duration token as period


def test_ta_fractional_period_rejected():
    """Fractional N must error in-band, not silently truncate to N-1
    (exponential_moving_average(value, 2.5) used to run as period 2)."""
    with pytest.raises(InfluxQLError, match="integer"):
        parse("SELECT exponential_moving_average(mean(value), 2.5) "
              "FROM p GROUP BY time(1m)")
    with pytest.raises(InfluxQLError, match="integer"):
        parse("SELECT relative_strength_index(value, 1.5) FROM p")
    # whole-number float spellings stay accepted
    parse("SELECT exponential_moving_average(mean(value), 2.0) FROM p "
          "GROUP BY time(1m)")


def test_selector_and_predictor_fractional_n_rejected():
    """top/bottom/sample N and holt_winters N/S are whole counts —
    silently truncating 2.5 → 2 was a wrong answer; InfluxDB errors."""
    for stmt in (
        "SELECT top(value, 2.5) FROM p",
        "SELECT bottom(value, 1.5) FROM p",
        "SELECT sample(value, 3.7) FROM p",
        "SELECT holt_winters(mean(value), 2.5, 0) FROM p "
        "WHERE time > '2024-01-01' GROUP BY time(1m)",
        "SELECT holt_winters(mean(value), 2, 1.5) FROM p "
        "WHERE time > '2024-01-01' GROUP BY time(1m)",
    ):
        with pytest.raises(InfluxQLError, match="integer"):
            parse(stmt)
    # whole-number float spellings stay accepted
    parse("SELECT top(value, 2.0) FROM p")
    # percentile keeps its fractional p
    parse("SELECT percentile(value, 99.9) FROM p")


def test_ta_moving_average_fractional_window_rejected(points):
    with pytest.raises(InfluxQLError, match="integer"):
        compile_influxql(
            "SELECT moving_average(mean(value), 2.5) FROM points "
            "GROUP BY time(1m)",
            points,
        )


def test_transform_null_bucket_skips_like_influx(spark):
    """difference/derivative/moving_average/cumulative_sum/elapsed over
    a series with an all-NULL bucket (multi-field statement): InfluxDB
    feeds a transform only the field's actual points, so 'previous'
    means the previous NON-NULL point (with ITS timestamp for
    derivative/elapsed dt) and no output point exists at the null
    bucket. A row-based lag would emit NULL after every gap instead."""
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    vals = [3.0, 7.0, None, None, 4.0, 9.0]
    for m, v2 in enumerate(vals):
        rows.append((t0 + dt.timedelta(minutes=m), float(m), v2))
    df = spark.createDataFrame(
        rows, "ts timestamp, value double, value2 double"
    )
    base = (
        "SELECT {expr} AS r, mean(value) AS m FROM t GROUP BY time(1m)"
    )

    def run(expr):
        out = (
            compile_influxql(base.format(expr=expr), df)
            .orderBy("time")
            .collect()
        )
        return {r["time"].minute: r["r"] for r in out}

    # rows where no transform column is defined are dropped (engine's
    # row-keep contract), so null buckets and warm-ups vanish entirely
    # — never a poisoned NULL after the gap.
    # difference: minute 4 diffs against minute 1's value (7.0)
    assert run("difference(mean(value2))") == {1: 4.0, 4: -3.0, 5: 5.0}
    # derivative(.., 1m): dt to the previous NON-NULL bucket is 3 min
    got = run("derivative(mean(value2), 1m)")
    assert set(got) == {1, 4, 5}
    assert got[4] == pytest.approx(-1.0)  # (4-7)/3
    assert got[5] == pytest.approx(5.0)
    # moving_average(2): m4 averages (7,4) — the last two POINTS
    got = run("moving_average(mean(value2), 2)")
    assert set(got) == {1, 4, 5}
    assert got[1] == pytest.approx(5.0)
    assert got[4] == pytest.approx(5.5)
    assert got[5] == pytest.approx(6.5)
    # cumulative_sum: no output point at null buckets, sum skips them
    assert run("cumulative_sum(mean(value2))") == {
        0: 3.0, 1: 10.0, 4: 14.0, 5: 23.0
    }
    # elapsed (raw-series form — elapsed() rejects aggregates): 3
    # minutes from the minute-1 point to the next NON-NULL at minute 4
    out = (
        compile_influxql("SELECT elapsed(value2, 1m) AS r FROM t", df)
        .orderBy("ts")
        .collect()
    )
    assert {r["ts"].minute: r["r"] for r in out} == {1: 1, 4: 3, 5: 1}
    # non_negative_difference nulls the negative POINT; with a second
    # transform column defined there the ROW survives (the old
    # row-filter silently deleted the other column's point too)
    out = (
        compile_influxql(
            "SELECT non_negative_difference(mean(value2)) AS r, "
            "cumulative_sum(mean(value)) AS cs FROM t GROUP BY time(1m)",
            df,
        )
        .orderBy("time")
        .collect()
    )
    by_min = {r["time"].minute: (r["r"], r["cs"]) for r in out}
    assert set(by_min) == {0, 1, 2, 3, 4, 5}  # cs defined everywhere
    assert by_min[4] == (None, 10.0)  # -3 nulled, cumulative kept
    assert by_min[5] == (5.0, 15.0)


def test_ta_null_bucket_does_not_poison_series(spark):
    """An all-NULL bucket aggregate (multi-field statement where one
    field has no points in a bucket) must be SKIPPED by the TA fold,
    like _apply_predictor: the recursion runs over the non-null
    subsequence; the NULL bucket emits NO point (row-keep contract).
    A NaN entering the EMA recursion would permanently null every
    subsequent output."""
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for m in range(10):
        v2 = None if m in (4, 5) else float((m * 13) % 7) + 1.0
        rows.append((t0 + dt.timedelta(minutes=m), "a", float(m), v2))
    df = spark.createDataFrame(
        rows, "ts timestamp, tag1 string, value double, value2 double"
    )
    out = (
        compile_influxql(
            "SELECT exponential_moving_average(mean(value2), 3) AS ema, "
            "mean(value) AS m FROM t GROUP BY time(1m)",
            df,
        )
        .orderBy("time")
        .collect()
    )
    # the two null buckets emit no point — 8 rows, minutes 4/5 absent
    assert [r["time"].minute for r in out] == [0, 1, 2, 3, 6, 7, 8, 9]
    # reference EMA over the 8 non-null buckets, alpha = 2/(3+1)
    xs = [float((m * 13) % 7) + 1.0 for m in range(10) if m not in (4, 5)]
    want = []
    y = None
    for v in xs:
        y = v if y is None else 0.5 * v + 0.5 * y
        want.append(y)
    # post-gap values are real numbers, not poisoned NULL/NaN
    got = [r["ema"] for r in out]
    assert got == pytest.approx(want, abs=1e-12)


def test_ta_null_bucket_rsi_warmup_counts_non_null_only(spark):
    """RSI emission index N is measured on the non-null subsequence:
    with a NULL bucket inside the warm-up, the first RSI value lands
    at the (N+1)-th NON-NULL bucket, mirroring InfluxDB feeding the
    transform only the field's actual points."""
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    vals = [3.0, None, 5.0, 2.0, 7.0, 4.0, None, 6.0, 1.0, 8.0]
    for m, v2 in enumerate(vals):
        rows.append((t0 + dt.timedelta(minutes=m), float(m), v2))
    df = spark.createDataFrame(
        rows, "ts timestamp, value double, value2 double"
    )
    out = (
        compile_influxql(
            "SELECT relative_strength_index(mean(value2), 3) AS rsi, "
            "mean(value) AS m FROM t GROUP BY time(1m)",
            df,
        )
        .orderBy("time")
        .collect()
    )
    dense = [v for v in vals if v is not None]
    diffs = [dense[i] - dense[i - 1] for i in range(1, len(dense))]
    ag = sum(max(d, 0) for d in diffs[:3]) / 3
    al = sum(max(-d, 0) for d in diffs[:3]) / 3
    want = [None] * len(dense)
    want[3] = 100.0 if al == 0 else 100.0 - 100.0 / (1.0 + ag / al)
    for i in range(4, len(dense)):
        d = diffs[i - 1]
        ag = (ag * 2 + max(d, 0)) / 3
        al = (al * 2 + max(-d, 0)) / 3
        want[i] = 100.0 if al == 0 else 100.0 - 100.0 / (1.0 + ag / al)
    # the warm filter drops rows where the (only) transform column is
    # NULL, so output rows are exactly the buckets with a defined RSI:
    # the 4th-and-later non-null buckets
    non_null_pos = [i for i, v in enumerate(vals) if v is not None]
    want_rows = [
        (t0 + dt.timedelta(minutes=p), want[j])
        for j, p in enumerate(non_null_pos)
        if want[j] is not None
    ]
    assert [r["time"] for r in out] == [t for t, _ in want_rows]
    assert [r["rsi"] for r in out] == pytest.approx(
        [w for _, w in want_rows], abs=1e-12
    )


def test_raw_field_alias_and_subquery(spark):
    """SELECT value AS v (raw alias) also composes with subqueries —
    the inner alias becomes the outer statement's field name."""
    import datetime as dtm

    rows = [(dtm.datetime(2024, 1, 1, 0, m), "a", float(m)) for m in range(10)]
    df = spark.createDataFrame(rows, "ts timestamp, tag1 string, value double")
    o1 = compile_influxql("SELECT value AS v FROM m LIMIT 3", df)
    assert o1.columns == ["ts", "v"] and o1.count() == 3
    from iot_system_plc_data_to_influxdb_spark.functions.influxql import (
        compile_statement,
    )

    o2 = compile_statement(
        "SELECT count(v) AS n FROM (SELECT value AS v FROM m WHERE value > 3)",
        df,
    ).collect()
    assert o2[0]["n"] == 6


def test_explain_statement_returns_plan_rows(spark, points):
    """InfluxQL EXPLAIN: one plan line per row in a QUERY PLAN column
    (the 1.x endpoint shape); the plan shown is the compiled Spark
    plan. EXPLAIN ANALYZE executes first and returns the formatted
    post-AQE plan."""
    from iot_system_plc_data_to_influxdb_spark.api import IoTEngine

    engine = IoTEngine(spark)
    out = engine.influxql(
        "EXPLAIN SELECT mean(value) AS m FROM points "
        "WHERE time >= '2024-01-01' GROUP BY time(1h)",
        points,
    )
    assert out.columns == ["QUERY PLAN"]
    text = "\n".join(r["QUERY PLAN"] for r in out.collect())
    assert "Physical Plan" in text and "HashAggregate" in text

    out2 = engine.influxql(
        "EXPLAIN ANALYZE SELECT count(value) AS n FROM points", points
    )
    text2 = "\n".join(r["QUERY PLAN"] for r in out2.collect())
    assert "Physical Plan" in text2
    # formatted mode includes the operator detail sections
    assert "(1) Scan" in text2 or "Scan ExistingRDD" in text2
