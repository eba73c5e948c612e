"""Config-plane operators — SURVEY.md §2 Part A (A1–A23).

The reference's config is an XML file edited by a GUI
(ConfigApp/ConfigApp.py:34-176) and parsed positionally at daemon start
(Linux/InfluxConnector2.py:244-270). Here the config is a typed
DataFrame; each CRUD op is a pure relational expression.

The fixture rows live inline (identical literals on the Spark and
DuckDB sides) so every op is oracle-checkable without external state.
A7's decode goes through golden byte vectors — the same IEEE-754/integer
algebra on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import t
from ..functions.address import address_numbers, parse_address
from ..functions.decode import s7_value
from .registry import register

# One row per <data> element (FIXTURES.md §1): all 5 decodable types,
# the untested Counter/Timer (null-gate fodder), an inactive row, DB and
# non-DB areas, addresses with 1/2/3 digit groups.
CONFIG_ROWS = [
    ("192.168.0.10", 1, "S7WLReal", "S7AreaDB", "DB10.DBD0", "boiler_temp", True, "1s"),
    ("192.168.0.10", 1, "S7WLWord", "S7AreaDB", "DB10.DBW4", "boiler_rpm", True, "1s"),
    ("192.168.0.10", 1, "S7WLBit", "S7AreaPE", "I0.1", "door_open", True, "min"),
    ("192.168.0.10", 1, "S7WLByte", "S7AreaMK", "M12", "mode_code", True, "5s"),
    ("192.168.0.10", 1, "S7WLCounter", "S7AreaCT", "C2", "cycles", True, "60s"),
    ("192.168.0.10", 1, "S7WLDWord", "S7AreaDB", "DB20.DBD8", "total_count", False, "10s"),
    ("192.168.0.11", 2, "S7WLReal", "S7AreaPA", "QD16", "valve_pos", True, "2s"),
    ("192.168.0.11", 2, "S7WLBit", "S7AreaDB", "DB5.DBX2.7", "alarm", True, "1s"),
    ("192.168.0.11", 2, "S7WLWord", "S7AreaPE", "IW6", "line_speed", True, "10s"),
    ("192.168.0.12", 1, "S7WLDWord", "S7AreaMK", "MD100", "uptime_s", True, "300s"),
    ("192.168.0.12", 1, "S7WLByte", "S7AreaPA", "QB3", "out_flags", True, "60s"),
    ("192.168.0.12", 1, "S7WLTimer", "S7AreaTM", "T7", "cycle_time", True, "60s"),
]

CONFIG_SCHEMA = (
    "plc_ip string, slot int, data_type string, data_area string, "
    "address string, alias string, active boolean, poll_interval string"
)

_CFG_VALUES = ", ".join(
    f"('{ip}', {slot}, '{dt}', '{da}', '{addr}', '{al}', {str(act).upper()}, '{iv}')"
    for ip, slot, dt, da, addr, al, act, iv in CONFIG_ROWS
)

# Shared CTE header for every config oracle.
_CFG_CTE = f"""
    WITH config(plc_ip, slot, data_type, data_area, address, alias, active,
                poll_interval) AS (VALUES {_CFG_VALUES})
"""


def config_df(spark):
    return spark.createDataFrame(CONFIG_ROWS, CONFIG_SCHEMA)


# --------------------------------------------------------------------------
# A1 + A6 — config scan with address parse
# --------------------------------------------------------------------------
@register(
    "a1_config_scan",
    oracle=_CFG_CTE
    + """
    SELECT plc_ip, slot, data_type, data_area, address, alias, active,
      poll_interval,
      array_to_string(regexp_extract_all(address, '[0-9]+'), '|')
        AS addr_nums,
      CASE WHEN data_area = 'S7AreaDB'
           THEN list_transform(regexp_extract_all(address, '[0-9]+'),
                               x -> CAST(x AS INT))[1] END AS db_number,
      CASE WHEN data_area = 'S7AreaDB'
           THEN list_transform(regexp_extract_all(address, '[0-9]+'),
                               x -> CAST(x AS INT))[2]
           ELSE list_transform(regexp_extract_all(address, '[0-9]+'),
                               x -> CAST(x AS INT))[1] END AS byte_offset,
      CASE WHEN data_area = 'S7AreaDB'
           THEN list_transform(regexp_extract_all(address, '[0-9]+'),
                               x -> CAST(x AS INT))[3]
           ELSE list_transform(regexp_extract_all(address, '[0-9]+'),
                               x -> CAST(x AS INT))[2] END AS bit_offset
    FROM config
    """,
    tags=("A1", "A6"),
)
def a1(spark, sf_dir):
    cfg = config_df(spark)
    parsed = parse_address(F.col("data_area"), F.col("address"))
    return cfg.select(
        "*",
        # '|'-joined string, not ARRAY<INT>: the driver's oracle
        # canonicalizer hashes scalar cells only (CORRECTNESS_r01
        # err: unhashable type 'list'), so array outputs serialize
        # to a canonical string on both engine and oracle sides.
        F.array_join(
            address_numbers(F.col("address")).cast("array<string>"), "|"
        ).alias("addr_nums"),
        parsed.db_number.alias("db_number"),
        parsed.byte_offset.alias("byte_offset"),
        parsed.bit_offset.alias("bit_offset"),
    )


# --------------------------------------------------------------------------
# A2 — active filter
# --------------------------------------------------------------------------
@register(
    "a2_active_filter",
    oracle=_CFG_CTE + "SELECT plc_ip, alias, data_type FROM config WHERE active",
    tags=("A2",),
)
def a2(spark, sf_dir):
    return config_df(spark).filter(F.col("active")).select("plc_ip", "alias", "data_type")


# --------------------------------------------------------------------------
# A3/A4 — group-by PLC and by (PLC, interval): the reference's process/
# thread partitioning as declarative grouping
# --------------------------------------------------------------------------
@register(
    "a3_group_by_plc",
    oracle=_CFG_CTE
    + """
    SELECT plc_ip, COUNT(*) AS n_tags,
      COUNT(*) FILTER (WHERE active) AS n_active,
      array_to_string(list_sort(list(alias)), '|') AS aliases
    FROM config GROUP BY plc_ip
    """,
    tags=("A3",),
)
def a3(spark, sf_dir):
    return (
        config_df(spark)
        .groupBy("plc_ip")
        .agg(
            F.count("*").alias("n_tags"),
            F.count_if(F.col("active")).alias("n_active"),
            # canonical string, not ARRAY (driver canonicalizer — see a1)
            F.array_join(F.sort_array(F.collect_list("alias")), "|").alias(
                "aliases"
            ),
        )
    )


@register(
    "a4_group_by_interval",
    oracle=_CFG_CTE
    + """
    SELECT plc_ip, poll_interval, COUNT(*) AS n_tags,
      array_to_string(list_sort(list(alias)), '|') AS aliases
    FROM config WHERE active GROUP BY plc_ip, poll_interval
    """,
    tags=("A4",),
)
def a4(spark, sf_dir):
    return (
        config_df(spark)
        .filter(F.col("active"))
        .groupBy("plc_ip", "poll_interval")
        .agg(
            F.count("*").alias("n_tags"),
            F.array_join(F.sort_array(F.collect_list("alias")), "|").alias(
                "aliases"
            ),
        )
    )


# --------------------------------------------------------------------------
# A7/A8/A9 — typed decode over golden byte vectors + null gate
# --------------------------------------------------------------------------
# (name, data_type, b0, b1, b2, b3, bit_off) — big-endian buffers.
DECODE_VECTORS = [
    ("real_one", "S7WLReal", 63, 128, 0, 0, None),        # 0x3F800000 = 1.0
    ("real_neg", "S7WLReal", 193, 72, 0, 0, None),        # 0xC1480000 = -12.5
    ("real_frac", "S7WLReal", 62, 32, 0, 0, None),        # 0x3E200000 = 0.15625
    ("real_zero", "S7WLReal", 0, 0, 0, 0, None),          # +0.0
    ("real_big", "S7WLReal", 76, 59, 42, 6, None),        # 0x4C3B2A06
    ("dword_max", "S7WLDWord", 255, 255, 255, 255, None), # 4294967295
    ("dword_msb", "S7WLDWord", 128, 0, 0, 0, None),       # 2147483648 (>2³¹)
    ("word_neg1", "S7WLWord", 255, 255, 0, 0, None),      # -1
    ("word_pos", "S7WLWord", 48, 57, 0, 0, None),         # 12345
    ("word_min", "S7WLWord", 128, 0, 0, 0, None),         # -32768
    ("byte_200", "S7WLByte", 200, 0, 0, 0, None),         # 200 (corrected decode)
    ("bit0_of_165", "S7WLBit", 165, 0, 0, 0, 0),          # 0b10100101 → 1
    ("bit1_of_165", "S7WLBit", 165, 0, 0, 0, 1),          # → 0
    ("bit5_of_165", "S7WLBit", 165, 0, 0, 0, 5),          # → 1
    ("bit6_of_165", "S7WLBit", 165, 0, 0, 0, 6),          # → 0
    ("counter_skip", "S7WLCounter", 0, 42, 0, 0, None),   # → NULL, dropped (A9)
    ("timer_skip", "S7WLTimer", 0, 7, 0, 0, None),        # → NULL, dropped (A9)
]

_VEC_VALUES = ", ".join(
    f"('{n}', '{dt}', {b0}, {b1}, {b2}, {b3}, "
    + ("NULL" if bit is None else str(bit))
    + ")"
    for n, dt, b0, b1, b2, b3, bit in DECODE_VECTORS
)

# The S7 type-decode dispatch as reusable SQL (expects columns
# data_type, b0..b3, bit_off in scope) — shared by _A7_ORACLE and the
# composed-pipeline oracle (plans/pipeline.py) so the decode algebra
# lives in ONE string.
DECODE_CASE_SQL = """
    CASE data_type
      WHEN 'S7WLReal' THEN (
        CASE WHEN ((b0 * 2 + b1 // 128) % 256) = 255 THEN NULL
             WHEN ((b0 * 2 + b1 // 128) % 256) = 0 THEN
               (CASE WHEN b0 >= 128 THEN -1.0 ELSE 1.0 END)
               * ((b1 % 128) * 65536 + b2 * 256 + b3) / 8388608.0
               * POW(2.0, -126)
             ELSE
               (CASE WHEN b0 >= 128 THEN -1.0 ELSE 1.0 END)
               * (1.0 + ((b1 % 128) * 65536 + b2 * 256 + b3) / 8388608.0)
               * POW(2.0, ((b0 * 2 + b1 // 128) % 256) - 127)
        END)
      WHEN 'S7WLDWord' THEN CAST(
        b0 * 16777216::BIGINT + b1 * 65536 + b2 * 256 + b3 AS DOUBLE)
      WHEN 'S7WLWord' THEN CAST(
        CASE WHEN b0 * 256 + b1 >= 32768 THEN b0 * 256 + b1 - 65536
             ELSE b0 * 256 + b1 END AS DOUBLE)
      WHEN 'S7WLByte' THEN CAST(b0 AS DOUBLE)
      WHEN 'S7WLBit' THEN CAST((b0 // CAST(POW(2, COALESCE(bit_off, 0)) AS INT)) % 2 AS DOUBLE)
      ELSE NULL
    END
"""

_A7_ORACLE = f"""
WITH vec(name, data_type, b0, b1, b2, b3, bit_off) AS (VALUES {_VEC_VALUES}),
decoded AS (
  SELECT name, data_type, {DECODE_CASE_SQL} AS value
  FROM vec
)
SELECT name, data_type, value FROM decoded WHERE value IS NOT NULL
"""


@register("a7_decode_dispatch", oracle=_A7_ORACLE, tags=("A7", "A8", "A9"))
def a7(spark, sf_dir):
    vec = spark.createDataFrame(
        DECODE_VECTORS,
        "name string, data_type string, b0 int, b1 int, b2 int, b3 int, bit_off int",
    )
    # Assemble the snap7-style big-endian BINARY buffer, then decode with
    # the engine's native (whole-stage-codegen) decoder.
    to_hex = lambda c: F.lpad(F.hex(F.col(c)), 2, "0")  # noqa: E731
    buf = F.unhex(F.concat(to_hex("b0"), to_hex("b1"), to_hex("b2"), to_hex("b3")))
    decoded = vec.select(
        "name",
        "data_type",
        s7_value(F.col("data_type"), buf, F.col("bit_off")).alias("value"),
    )
    # A9 null gate: unknown types (Counter/Timer) drop out here.
    return decoded.filter(F.col("value").isNotNull())


# --------------------------------------------------------------------------
# A11 — point construction (long-format InfluxDB point)
# --------------------------------------------------------------------------
@register(
    "a11_point_projection",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS measurement,
      event_type AS field_key, value AS field_value, ts
    FROM events WHERE event_id < 1000
    """,
    tags=("A11",),
)
def a11(spark, sf_dir):
    # create_my_json (Linux/InfluxConnector2.py:222-240): measurement =
    # plc identity, one field per point, empty tags — flattened to the
    # long/narrow layout the points table stores.
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 1000)
        .select(
            F.col("user_id").cast("string").alias("measurement"),
            F.col("event_type").alias("field_key"),
            F.col("value").alias("field_value"),
            "ts",
        )
    )


# --------------------------------------------------------------------------
# A18 — config insert (UNION ALL)
# --------------------------------------------------------------------------
_NEW_ROW = ("192.168.0.13", 1, "S7WLReal", "S7AreaDB", "DB1.DBD0", "new_sensor", True, "1s")


@register(
    "a18_config_insert",
    oracle=_CFG_CTE
    + f"""
    SELECT * FROM config
    UNION ALL
    SELECT '{_NEW_ROW[0]}', {_NEW_ROW[1]}, '{_NEW_ROW[2]}', '{_NEW_ROW[3]}',
           '{_NEW_ROW[4]}', '{_NEW_ROW[5]}', TRUE, '{_NEW_ROW[7]}'
    """,
    tags=("A18",),
)
def a18(spark, sf_dir):
    new = spark.createDataFrame([_NEW_ROW], CONFIG_SCHEMA)
    return config_df(spark).unionByName(new)


# --------------------------------------------------------------------------
# A19/A20/A21 — distinct keys / projection by key / point lookup
# --------------------------------------------------------------------------
@register(
    "a19_distinct_plcs",
    oracle=_CFG_CTE + "SELECT DISTINCT plc_ip FROM config",
    tags=("A19",),
)
def a19(spark, sf_dir):
    return config_df(spark).select("plc_ip").distinct()


@register(
    "a20_aliases_for_plc",
    oracle=_CFG_CTE + "SELECT alias FROM config WHERE plc_ip = '192.168.0.10'",
    tags=("A20",),
)
def a20(spark, sf_dir):
    return config_df(spark).filter(F.col("plc_ip") == "192.168.0.10").select("alias")


@register(
    "a21_config_lookup",
    oracle=_CFG_CTE
    + "SELECT * FROM config WHERE plc_ip = '192.168.0.11' AND alias = 'alarm'",
    tags=("A21",),
)
def a21(spark, sf_dir):
    return config_df(spark).filter(
        (F.col("plc_ip") == "192.168.0.11") & (F.col("alias") == "alarm")
    )


# --------------------------------------------------------------------------
# A22 — config delete (anti-filter / anti-join)
# --------------------------------------------------------------------------
@register(
    "a22_config_delete",
    oracle=_CFG_CTE
    + """
    SELECT * FROM config
    WHERE NOT (plc_ip = '192.168.0.10' AND alias = 'mode_code')
    """,
    tags=("A22",),
)
def a22(spark, sf_dir):
    return config_df(spark).filter(
        ~((F.col("plc_ip") == "192.168.0.10") & (F.col("alias") == "mode_code"))
    )


# --------------------------------------------------------------------------
# A23 — config update (conditional CASE projection)
# --------------------------------------------------------------------------
@register(
    "a23_config_update",
    oracle=_CFG_CTE
    + """
    SELECT plc_ip, slot, data_type, data_area, address, alias,
      CASE WHEN plc_ip = '192.168.0.12' AND alias = 'uptime_s'
           THEN FALSE ELSE active END AS active,
      CASE WHEN plc_ip = '192.168.0.12' AND alias = 'uptime_s'
           THEN '60s' ELSE poll_interval END AS poll_interval
    FROM config
    """,
    tags=("A23",),
)
def a23(spark, sf_dir):
    key = (F.col("plc_ip") == "192.168.0.12") & (F.col("alias") == "uptime_s")
    return config_df(spark).select(
        "plc_ip",
        "slot",
        "data_type",
        "data_area",
        "address",
        "alias",
        F.when(key, F.lit(False)).otherwise(F.col("active")).alias("active"),
        F.when(key, F.lit("60s")).otherwise(F.col("poll_interval")).alias("poll_interval"),
    )


# --------------------------------------------------------------------------
# A7 strict-reference mode: reproduces the reference's Byte-via-get_int
# quirk (Linux/InfluxConnector2.py:152-153 decodes a 1-byte value with
# the 2-byte signed getter) so migrated pipelines can bit-match history.
# --------------------------------------------------------------------------
_A7_STRICT_ORACLE = f"""
WITH vec(name, data_type, b0, b1, b2, b3, bit_off) AS (VALUES {_VEC_VALUES})
SELECT name, data_type,
  CAST(CASE WHEN b0 * 256 + b1 >= 32768 THEN b0 * 256 + b1 - 65536
            ELSE b0 * 256 + b1 END AS DOUBLE) AS value
FROM vec WHERE data_type = 'S7WLByte'
"""


@register("a7_decode_strict_reference", oracle=_A7_STRICT_ORACLE, tags=("A7",))
def a7_strict(spark, sf_dir):
    vec = spark.createDataFrame(
        DECODE_VECTORS,
        "name string, data_type string, b0 int, b1 int, b2 int, b3 int, bit_off int",
    ).filter(F.col("data_type") == "S7WLByte")
    to_hex = lambda c: F.lpad(F.hex(F.col(c)), 2, "0")  # noqa: E731
    buf = F.unhex(F.concat(to_hex("b0"), to_hex("b1"), to_hex("b2"), to_hex("b3")))
    return vec.select(
        "name",
        "data_type",
        s7_value(
            F.col("data_type"), buf, F.col("bit_off"), strict_reference=True
        ).alias("value"),
    )
