"""InfluxDB wire-format parity (SURVEY.md A11/A12).

The reference posts point JSON bodies through the influxdb 5.2.3 client
(`create_my_json`, Linux/InfluxConnector2.py:222-240; `write_points`
:176) — measurement = plc_ip, empty tags, one field per point,
server-assigned timestamp. InfluxDB's actual wire format is line
protocol; this module renders both representations natively (pure
column expressions) so the foreachBatch sink can target a real
InfluxDB endpoint by POSTing the rendered lines — batched per
micro-batch, not the reference's one-request-per-point anti-pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _escape_measurement(c: Column) -> Column:
    # line-protocol: escape commas and spaces in measurements
    return F.regexp_replace(F.regexp_replace(c, ",", r"\\,"), " ", r"\\ ")


def _escape_key(c: Column) -> Column:
    # field keys additionally escape '='
    return F.regexp_replace(_escape_measurement(c), "=", r"\\=")


def to_line_protocol(points: DataFrame) -> DataFrame:
    """points(ts, plc_ip, alias, value) → one line-protocol string per
    point: ``<measurement> <field>=<value> <ns_timestamp>``.

    Tags are empty exactly like the reference's points (:232-234).
    """
    line = F.concat(
        _escape_measurement(F.col("plc_ip")),
        F.lit(" "),
        _escape_key(F.col("alias")),
        F.lit("="),
        F.col("value").cast("string"),
        F.lit(" "),
        (F.unix_micros(F.col("ts")) * 1000).cast("string"),
    )
    return points.select(line.alias("line"))


def to_point_json(points: DataFrame) -> DataFrame:
    """The reference's JSON body shape (create_my_json) as a JSON
    string column: {"measurement": ip, "tags": {}, "fields": {alias: v}}."""
    body = F.to_json(
        F.struct(
            F.col("plc_ip").alias("measurement"),
            F.create_map().cast("map<string,string>").alias("tags"),
            F.create_map(F.col("alias"), F.col("value")).alias("fields"),
        )
    )
    return points.select(body.alias("json"))


def post_lines_with_retry(
    url: str,
    payload: bytes,
    attempts: int = 3,
    backoff_s: float = 0.2,
) -> int:
    """POST one line-protocol payload with bounded retry + exponential
    backoff, analogous to the reference's reconnect-on-failure loop
    (Linux/InfluxConnector2.py reconnects the PLC after read errors;
    the engine applies the same bounded-retry posture to its write
    path). Transient network errors — URLError, socket read timeouts
    (TimeoutError), and other OSErrors — and 5xx responses retry; 4xx
    (malformed payload) raises immediately — retrying a bad request
    can never succeed. Returns the HTTP status.

    Idempotency note: InfluxDB line-protocol writes are upserts keyed
    by (measurement, tags, timestamp), so a retried/replayed batch —
    whether from this loop or from Spark re-running a failed
    micro-batch off the checkpoint — lands identically; at-least-once
    delivery composes to exactly-once state.
    """
    import time as _time
    import urllib.error
    import urllib.request

    last: Exception | None = None
    for attempt in range(attempts):
        try:
            req = urllib.request.Request(url, data=payload)
            with urllib.request.urlopen(req, timeout=10) as resp:
                return resp.status
        except urllib.error.HTTPError as e:
            if e.code < 500:
                raise
            last = e
        except (urllib.error.URLError, TimeoutError, OSError) as e:
            # socket read timeouts surface as bare TimeoutError (not
            # wrapped in URLError) on CPython ≥3.10; ConnectionReset
            # and friends as OSError — all transient, all retryable
            last = e
        if attempt < attempts - 1:
            _time.sleep(backoff_s * (2 ** attempt))
    raise last  # type: ignore[misc]


def write_batch_to_influx(
    batch_df: DataFrame, batch_id: int, url: str, db: str | None = None
) -> None:  # pragma: no cover - needs a live InfluxDB
    """foreachBatch hook for a real endpoint: one POST per partition
    per micro-batch (db-per-PLC routed via the measurement name).

    Collected per partition executor-side so the driver never
    materializes the batch; requires a reachable InfluxDB, so the POST
    path is exercised against a local flaky-server stand-in in
    tests (test_influx_format.py).
    """
    lines = to_line_protocol(batch_df)

    def post_partition(it):
        payload = "\n".join(r["line"] for r in it).encode()
        if payload:
            post_lines_with_retry(
                f"{url}/write" + (f"?db={db}" if db else ""), payload
            )

    lines.foreachPartition(post_partition)


# --------------------------------------------------------------------------
# Read side: line-protocol → rows. Lets the engine ingest what other
# InfluxDB writers produce (migration path), and closes the round-trip
# with to_line_protocol. Pure native expressions — regex segmentation
# on unescaped delimiters, higher-order functions for tag/field maps;
# no Python UDF in the path.
#
# Scope: `measurement[,tag=v...] field=v[,field=v...] [ns_timestamp]`
# with the \,  \=  '\ ' escape set; integer (``42i``), float, boolean,
# and double-quoted string field values (spaces/commas/`=` inside the
# quotes included — Telegraf writes these; embedded escaped quotes
# ``\"`` inside a string value are the one out-of-scope corner).
# --------------------------------------------------------------------------
# the field segment admits quoted runs so 'msg="a b",ok=1' is ONE
# segment; measurements/tags can't be quoted in the protocol
_SEG_RE = r'^((?:\\.|[^ ])+) ((?:"[^"]*"|\\.|[^ ])+)(?: (\d+))?$'

#: split on commas that sit OUTSIDE double quotes (even count of
#: quotes in the remainder) and are not escaped
_FIELD_SPLIT_RE = r'(?<!\\),(?=(?:[^"]*"[^"]*")*[^"]*$)'


def _unescape(c: Column) -> Column:
    return F.regexp_replace(c, r"\\(.)", "$1")


def _kv_entries(seg: Column) -> Column:
    """array of (key, raw_value) structs from 'k=v,k=v' with escapes.

    The value is left RAW (quotes and escapes intact) — the caller
    decides string-vs-numeric before unescaping, because unescaping a
    quoted value first would erase the marker that distinguishes
    ``msg="21.5"`` (string) from ``temp=21.5`` (float)."""
    return F.transform(
        F.split(seg, _FIELD_SPLIT_RE),
        lambda kv: F.struct(
            _unescape(F.regexp_extract(kv, r"^((?:\\.|[^=])+)=", 1)).alias("k"),
            F.regexp_extract(kv, r"^(?:\\.|[^=])+=(.*)$", 1).alias("v"),
        ),
    )


# wire-unit → microseconds multiplier; ns divides instead (a float
# 0.001 multiply would lose exactness on 1.7e18-scale ns epochs —
# decimal division keeps every digit)
_PRECISION_TO_MICROS = {
    "ns": None,
    "u": 1,
    "ms": 1_000,
    "s": 1_000_000,
    "m": 60_000_000,
    "h": 3_600_000_000,
}


def parse_line_protocol(
    lines: DataFrame, column: str = "line", precision: str = "ns"
) -> DataFrame:
    """One row per field per line: (measurement, tags, field, value_raw,
    value, ts). ``value`` is the numeric reading (ints/bools coerced;
    null for quoted string fields), ``value_raw`` preserves the wire
    text (unquoted for string fields). Lines that do not match the
    grammar yield a null measurement — filter or quarantine upstream
    (the A9 null gate applied to ingest).

    ``precision`` is the wire timestamp unit, matching InfluxDB's
    ``/write?precision=ns|u|ms|s`` (default ns)."""
    if precision not in _PRECISION_TO_MICROS:
        raise ValueError(f"unsupported precision {precision!r}")
    c = F.col(column)
    seg1 = F.regexp_extract(c, _SEG_RE, 1)
    seg2 = F.regexp_extract(c, _SEG_RE, 2)
    seg3 = F.regexp_extract(c, _SEG_RE, 3)
    mtags = F.split(seg1, r"(?<!\\),")
    parsed = lines.select(
        F.when(seg1 != "", _unescape(F.element_at(mtags, 1))).alias("measurement"),
        F.map_from_entries(
            F.transform(
                F.slice(mtags, 2, F.greatest(F.size(mtags) - 1, F.lit(0))),
                lambda kv: F.struct(
                    _unescape(F.regexp_extract(kv, r"^((?:\\.|[^=])+)=", 1)),
                    _unescape(F.regexp_extract(kv, r"^(?:\\.|[^=])+=(.*)$", 1)),
                ),
            )
        ).alias("tags"),
        F.explode(_kv_entries(seg2)).alias("f"),
        F.when(
            seg3 != "",
            F.timestamp_micros(
                (
                    seg3.try_cast("decimal(38,0)") / 1000
                    if precision == "ns"
                    else seg3.try_cast("decimal(38,0)")
                    * _PRECISION_TO_MICROS[precision]
                ).try_cast("long")
            ),
        ).alias("ts"),
    )
    raw0 = F.col("f.v")
    # a value wrapped in double quotes is a STRING field: value_raw
    # carries the unquoted text, numeric value is null (the consumer's
    # schema keeps readings numeric; string fields ride value_raw)
    is_str = raw0.rlike(r'^".*"$')
    raw = F.when(
        is_str, _unescape(F.expr("substring(f.v, 2, length(f.v)-2)"))
    ).otherwise(_unescape(raw0))
    value = (
        F.when(is_str, F.lit(None).cast("double"))
        .when(raw.rlike(r"^-?\d+i$"), F.expr("substring(f.v, 1, length(f.v)-1)").try_cast("double"))
        .when(F.lower(raw).isin("t", "true"), F.lit(1.0))
        .when(F.lower(raw).isin("f", "false"), F.lit(0.0))
        .otherwise(raw.try_cast("double"))
    )
    return parsed.select(
        "measurement",
        "tags",
        F.col("f.k").alias("field"),
        raw.alias("value_raw"),
        value.alias("value"),
        "ts",
    )


def read_line_protocol(spark, path: str) -> DataFrame:
    """Batch ingest of line-protocol files — the one-shot migration
    path (`influxd backup` export → this engine). Composes the native
    text scan with parse_line_protocol, so the whole parse stays
    JVM-side (a custom Python DataSource here would move every byte
    through Python for no semantic gain). Malformed lines are
    null-gated exactly like the streaming twin."""
    lines = spark.read.text(path).withColumnRenamed("value", "line")
    return parse_line_protocol(lines).filter(F.col("measurement").isNotNull())


def read_line_protocol_stream(
    spark, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming ingest of line-protocol files (the format `influxd
    backup`/telegraf/file-export pipelines emit): watch ``path`` for
    text files, parse each line, null-gate malformed rows. Composes
    spark.readStream.text with parse_line_protocol — the migration
    path for replaying an existing InfluxDB deployment's data through
    this engine."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    lines = reader.text(path).withColumnRenamed("value", "line")
    return parse_line_protocol(lines).filter(F.col("measurement").isNotNull())
