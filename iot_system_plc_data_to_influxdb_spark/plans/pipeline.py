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


# --------------------------------------------------------------------------
# The TRAINING-DATA twin of pipeline_plc_e2e: the north-star curation
# stages composed into ONE registered, hash-checked relation — the
# funnel + packing-efficiency report a data engineer reads after every
# nightly corpus build:
#
#   B21  Gopher table-A1 quality gate   (functions/text.gopher_stats —
#        the SAME expression tree as b21_gopher_rules / the streaming
#        ingest gate, so the stages cannot drift)
#   B18  exact content dedup            (md5(text), keep lowest doc_id
#        among GATED docs — gate-then-dedup order is part of the
#        contract and the oracle replays it)
#   B21  two-level sequence packing     (northstar._packed_bins — the
#        hard <=256-row bounded fold, same helper as the pack queries)
#   out  one row per lang: n_raw -> n_gated -> n_unique funnel counts,
#        n_bins, sum_tokens, and fill_bp = sum_tokens·1e4 div
#        (capacity·n_bins) — exact positive-integer division, the
#        packing-efficiency number (can exceed 10000 only via
#        single-doc-overflow bins, which next-fit permits).
#
# The value of the composition is the STAGE BOUNDARIES: each operator
# is oracle-checked in isolation, but only the chained relation proves
# the gate feeds the dedup feeds the packer with the exact column/
# filter semantics a real pipeline wires together.
#
# Scale shape: gate is map-only; dedup is one content-hash window
# (single shuffle, the dropDuplicates shape); packing adds one
# (lang, shard) exchange into bounded pandas groups; n_bins per lang
# derives from per-(lang, shard) MAX(bin_id) — bins are dense from 0
# within a stream, so no DISTINCT over bin rows is needed; the report
# joins are O(langs).
# --------------------------------------------------------------------------
def _training_oracle() -> str:
    from .northstar import (
        _PACK_CAPACITY,
        _PACK_SHARD_SPAN,
        _STOP_SQL,
        _pack_oracle_cte,
    )

    return rf"""
    WITH RECURSIVE d0 AS (
      SELECT doc_id, lang, text,
        regexp_split_to_array(trim(lower(text)), '\s+') AS w
      FROM documents
    ),
    m AS (
      SELECT doc_id, lang, text,
        CAST(len(w) AS BIGINT) AS n_words,
        CAST(list_aggregate(list_transform(w, x -> length(x)), 'sum')
          AS BIGINT) AS total_len,
        CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
          AS BIGINT) AS alpha_words,
        CAST(len(list_filter(w, x -> x IN ({_STOP_SQL})))
          AS BIGINT) AS stop_hits,
        CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
        + CAST((length(text) - length(replace(text, '...', ''))) // 3
          AS BIGINT) AS symbol_hits
      FROM d0
    ),
    gated AS (
      SELECT doc_id, lang, text, n_words FROM m
      WHERE n_words BETWEEN 50 AND 100000
        AND total_len >= 3 * n_words AND total_len <= 10 * n_words
        AND 10 * symbol_hits <= n_words
        AND 10 * alpha_words >= 8 * n_words
        AND stop_hits >= 2
    ),
    u AS (
      SELECT doc_id, lang, n_words,
        ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id)
          AS urn
      FROM gated
    ),
    d AS (
      SELECT doc_id, lang,
        doc_id // {_PACK_SHARD_SPAN} AS shard,
        n_words AS n_tokens,
        ROW_NUMBER() OVER (
          PARTITION BY lang, doc_id // {_PACK_SHARD_SPAN}
          ORDER BY doc_id) AS rn
      FROM u WHERE urn = 1
    ),
    {_pack_oracle_cte()},
    per_shard AS (
      SELECT lang, shard,
        MAX(bin_id) + 1 AS nb, SUM(n_tokens) AS st
      FROM pack GROUP BY 1, 2
    ),
    pk AS (
      SELECT lang, CAST(SUM(nb) AS BIGINT) AS n_bins,
        CAST(SUM(st) AS BIGINT) AS sum_tokens
      FROM per_shard GROUP BY 1
    ),
    raw_c AS (
      SELECT lang, COUNT(*)::BIGINT AS n_raw FROM documents GROUP BY 1
    ),
    gat_c AS (
      SELECT lang, COUNT(*)::BIGINT AS n_gated FROM gated GROUP BY 1
    ),
    uni_c AS (
      SELECT lang, COUNT(*)::BIGINT AS n_unique
      FROM u WHERE urn = 1 GROUP BY 1
    )
    SELECT r.lang, r.n_raw,
      COALESCE(g.n_gated, 0) AS n_gated,
      COALESCE(x.n_unique, 0) AS n_unique,
      COALESCE(p.n_bins, 0) AS n_bins,
      COALESCE(p.sum_tokens, 0) AS sum_tokens,
      CAST(CASE WHEN COALESCE(p.n_bins, 0) = 0 THEN 0
           ELSE p.sum_tokens * 10000
                // ({_PACK_CAPACITY} * p.n_bins) END AS BIGINT)
        AS fill_bp
    FROM raw_c r
    LEFT JOIN gat_c g USING (lang)
    LEFT JOIN uni_c x USING (lang)
    LEFT JOIN pk p USING (lang)
"""


@register(
    "pipeline_training_e2e",
    oracle=_training_oracle(),
    tags=("B21", "B18", "B19"),
)
def pipeline_training_e2e(spark, sf_dir):
    from pyspark.sql import Window

    from ..catalog import t
    from ..functions.text import gopher_stats, tokens
    from .northstar import _PACK_CAPACITY, _packed_bins

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", tokens(F.col("text")).alias("w")
    )
    raw_c = docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_raw")
    )
    g = gopher_stats(F.col("text"), F.col("w"))
    gated = docs.select(
        "doc_id", "lang", "text", g["n_words"].alias("n_words"),
        g["passes"].alias("_p"),
    ).filter(F.col("_p"))
    gat_c = gated.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_gated")
    )
    wd = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    unique = (
        gated.withColumn("urn", F.row_number().over(wd))
        .filter(F.col("urn") == 1)
        .select("doc_id", "lang", F.col("n_words").alias("n_tokens"))
    )
    uni_c = unique.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_unique")
    )
    packed = _packed_bins(unique)
    per_shard = packed.groupBy("lang", "shard").agg(
        (F.max("bin_id") + 1).alias("nb"),
        F.sum("n_tokens").alias("st"),
    )
    pk = per_shard.groupBy("lang").agg(
        F.sum("nb").cast("bigint").alias("n_bins"),
        F.sum("st").cast("bigint").alias("sum_tokens"),
    )
    fill = F.when(F.coalesce(F.col("n_bins"), F.lit(0)) == 0, F.lit(0)).otherwise(
        F.expr(f"sum_tokens * 10000 div ({_PACK_CAPACITY} * n_bins)")
    )
    return (
        raw_c.join(gat_c, "lang", "left")
        .join(uni_c, "lang", "left")
        .join(pk, "lang", "left")
        .select(
            "lang",
            "n_raw",
            F.coalesce("n_gated", F.lit(0)).cast("bigint").alias(
                "n_gated"
            ),
            F.coalesce("n_unique", F.lit(0)).cast("bigint").alias(
                "n_unique"
            ),
            F.coalesce("n_bins", F.lit(0)).cast("bigint").alias(
                "n_bins"
            ),
            F.coalesce("sum_tokens", F.lit(0)).cast("bigint").alias(
                "sum_tokens"
            ),
            fill.cast("bigint").alias("fill_bp"),
        )
    )
