"""The composed end-to-end pipeline as ONE registered query.

Every stage of the reference's dataflow exists here as an individually
oracle-checked query (SURVEY.md §2 part A + B3); this module chains
them into the single relation a user would actually run first to see
the engine work end to end:

  A1/A2  config scan + active filter        (plans/config_plane.py)
  A5     acquisition — deterministic simulated byte buffers, one
         reading per active tag per minute tick (the in-CI stand-in
         for sources/plc.py's snap7 read_area loop;
         reference Linux/InfluxConnector2.py:137-176)
  A6     address parse (digit groups → bit offset)
  A7-A9  type-decode dispatch + bool projection + null gate
         (functions/decode.s7_value — Counter/Timer rows drop here)
  A11    point construction (long/narrow InfluxDB layout)
  B3     the query surface: a REAL InfluxQL statement compiled by
         functions/influxql.compile_influxql against the points
         relation — count/mean/min/max per 15-minute bucket per
         (measurement, field_key)

The DuckDB oracle replays all of it: the shared config fixture CTE
(_CFG_CTE), the same byte-synthesis algebra, the SAME decode CASE
string (config_plane.DECODE_CASE_SQL — one expression tree, no
drift), and the downsample the InfluxQL statement compiles to.

Float determinism: S7WLReal buffers are synthesized with the exponent
byte pinned to 127 (b0=63, b1>=128), so every decoded Real lies in
[1, 2) on the 2^-23 grid — all bucket sums stay exactly representable
in a double and mean() is order-independent on both engines. Integer
types are exact by construction.

Scale: the simulator leg is a config×spine explode (at 100 TB the
points table arrives from the streaming ingest instead — same schema,
same query surface); the downsample is one partial+final aggregate,
grouped on (bucket, measurement, field_key) — the B3 shape already
plan-audited.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.address import address_numbers
from ..functions.decode import s7_value
from .config_plane import _CFG_CTE, DECODE_CASE_SQL, config_df
from .registry import register

_TICKS = 60           # one hour of 1-minute readings
_EPOCH_START = 1_704_067_200  # 2024-01-01T00:00:00Z
_BUCKET_S = 900       # GROUP BY time(15m)

# byte-synthesis algebra, written once per engine with identical terms
_B0_SQL = "CASE WHEN data_type = 'S7WLReal' THEN 63 " \
          "ELSE (t * 7 + slot * 13 + length(alias) * 3) % 256 END"
_B1_SQL = "CASE WHEN data_type = 'S7WLReal' " \
          "THEN 128 + ((t * 11 + length(alias)) % 128) " \
          "ELSE (t * 11 + length(alias)) % 256 END"
_B2_SQL = "(t * 5 + slot) % 256"
_B3_SQL = "(t * 13 + 1) % 256"

_PIPELINE_ORACLE = f"""
    {_CFG_CTE},
    ticks AS (SELECT unnest(generate_series(0, {_TICKS - 1})) AS t),
    sim AS (
      SELECT c.plc_ip, c.data_type, c.alias, c.slot, t.t,
        CASE WHEN c.data_area = 'S7AreaDB'
             THEN list_transform(regexp_extract_all(c.address, '[0-9]+'),
                                 x -> CAST(x AS INT))[3]
             ELSE list_transform(regexp_extract_all(c.address, '[0-9]+'),
                                 x -> CAST(x AS INT))[2] END AS bit_off,
        {_B0_SQL} AS b0, {_B1_SQL} AS b1, {_B2_SQL} AS b2, {_B3_SQL} AS b3
      FROM config c CROSS JOIN ticks t WHERE c.active
    ),
    decoded AS (
      SELECT plc_ip, alias,
        TIMESTAMP '2024-01-01 00:00:00' + to_seconds(t * 60) AS ts,
        {DECODE_CASE_SQL} AS value
      FROM sim
    ),
    pts AS (
      SELECT plc_ip AS measurement, alias AS field_key, value, ts
      FROM decoded WHERE value IS NOT NULL
    )
    SELECT
      TIMESTAMP '1970-01-01 00:00:00' + to_seconds(
        CAST(FLOOR(epoch(ts) / {_BUCKET_S}) * {_BUCKET_S} AS BIGINT)
      ) AS time,
      measurement, field_key,
      COUNT(value) AS n_points,
      AVG(value) AS mean_value,
      MIN(value) AS min_value,
      MAX(value) AS max_value
    FROM pts GROUP BY 1, 2, 3
"""


def simulated_points(spark):
    """A1→A2→A5(sim)→A6→A7/A8/A9→A11: the deterministic points
    relation the composed pipeline downsample reads. Shared with
    examples/full_pipeline.py."""
    cfg = config_df(spark).filter(F.col("active"))
    sim = cfg.select(
        "plc_ip",
        "data_type",
        "data_area",
        "address",
        "alias",
        "slot",
        F.explode(F.sequence(F.lit(0), F.lit(_TICKS - 1))).alias("t"),
    )
    nums = address_numbers(F.col("address"))
    # F.get (0-indexed) — null past the end, where ANSI element_at
    # faults on the 1-group addresses like 'M12'
    bit_off = F.when(
        F.col("data_area") == "S7AreaDB", F.get(nums, 2)
    ).otherwise(F.get(nums, 1))
    synth = sim.select(
        "plc_ip",
        "data_type",
        "alias",
        "t",
        bit_off.alias("bit_off"),
        F.expr(_B0_SQL).alias("b0"),
        F.expr(_B1_SQL).alias("b1"),
        F.expr(_B2_SQL).alias("b2"),
        F.expr(_B3_SQL).alias("b3"),
    )
    to_hex = lambda c: F.lpad(F.hex(F.col(c)), 2, "0")  # noqa: E731
    buf = F.unhex(
        F.concat(to_hex("b0"), to_hex("b1"), to_hex("b2"), to_hex("b3"))
    )
    decoded = synth.select(
        "plc_ip",
        "alias",
        F.timestamp_seconds(
            F.lit(_EPOCH_START) + F.col("t") * 60
        ).alias("ts"),
        s7_value(
            F.col("data_type"), buf, F.coalesce(F.col("bit_off"), F.lit(0))
        ).alias("value"),
    )
    return decoded.filter(F.col("value").isNotNull()).select(
        F.col("plc_ip").alias("measurement"),
        F.col("alias").alias("field_key"),
        "value",
        "ts",
    )


@register(
    "pipeline_plc_e2e",
    oracle=_PIPELINE_ORACLE,
    tags=("A1", "A2", "A5", "A6", "A7", "A9", "A11", "B3"),
)
def pipeline_plc_e2e(spark, sf_dir):
    from ..functions.influxql import compile_influxql

    points = simulated_points(spark)
    return compile_influxql(
        "SELECT count(value) AS n_points, mean(value) AS mean_value, "
        "min(value) AS min_value, max(value) AS max_value "
        "FROM points "
        "WHERE time >= '2024-01-01T00:00:00Z' "
        "AND time < '2024-01-01T01:00:00Z' "
        "GROUP BY time(15m), measurement, field_key",
        points,
    )
