"""Flagship query — the reference's reason to exist, as one pipeline.

"What is each signal doing right now and over its last window?"

The reference answers this by polling PLC tags, decoding typed buffers
(Linux/InfluxConnector2.py:141-170), caching a current value per tag
(:173) and delegating windowed aggregation to InfluxDB
(``GROUP BY time(1m)``). Here the same shape is one declarative plan
over the ``events`` table (user_id≈plc, event_type≈alias):

  time-range filter (B2) → type-decode CASE projection (A7 analog)
  → 1-minute tumbling downsample avg/min/max/count/last (B3)
  → per-signal latest bucket (A10 last-value / B11 as-of analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import events_between
from ._exact import round_ratio
from .registry import register

_ORACLE = """
WITH sig AS (
  SELECT
    event_type,
    date_trunc('minute', ts) AS bucket_start,
    ts,
    CASE
      WHEN event_type = 'error' THEN CAST(value > 100 AS INT)
      WHEN event_type = 'click' THEN CAST(FLOOR(value) AS INT)
      ELSE value
    END AS signal
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
),
bucketed AS (
  SELECT
    event_type,
    bucket_start,
    COUNT(*) AS n,
    MIN(signal) AS min_signal,
    MAX(signal) AS max_signal,
    ((2 * SUM(CAST(ROUND(signal * 100) AS BIGINT)) * 100 + COUNT(*))
     // (2 * COUNT(*))) / 10000.0 AS avg_signal,
    MAX_BY(signal, ts) AS last_signal
  FROM sig
  GROUP BY event_type, bucket_start
),
ranked AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bucket_start DESC) AS rn
  FROM bucketed
)
SELECT event_type, bucket_start, n, min_signal, max_signal, avg_signal,
       last_signal
FROM ranked
WHERE rn = 1
"""


def _signal(col_type, col_value):
    """A7 decode-dispatch analog: closed-enum CASE, no UDF.

    Mirrors the if/elif decode chain (bit → 0/1 int, word → signed int,
    real → float) as a Catalyst CASE WHEN so it stays inside
    whole-stage codegen.
    """
    return (
        F.when(col_type == "error", (col_value > 100).cast("int").cast("double"))
        .when(col_type == "click", F.floor(col_value).cast("int").cast("double"))
        .otherwise(col_value)
    )


def signal_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # range filter on the raw int64 nanos column (catalog.events_between)
    # so the bounds reach the parquet scan as PushedFilters — the
    # reference's "current window" query must prune, not full-scan.
    ev = events_between(spark, sf_dir, "2024-01-01", "2024-02-01")
    sig = ev.select(
        "event_type",
        F.window("ts", "1 minute").start.alias("bucket_start"),
        "ts",
        _signal(F.col("event_type"), F.col("value")).alias("signal"),
    )
    bucketed = sig.groupBy("event_type", "bucket_start").agg(
        F.count("*").alias("n"),
        F.min("signal").alias("min_signal"),
        F.max("signal").alias("max_signal"),
        # exact integer-cent rounding (plans/_exact.py): avg =
        # cents/(100·n); scaled·1e4 = cents·100/n
        round_ratio(
            F.sum(F.round(F.col("signal") * 100).cast("bigint")),
            100 * F.count("*"),
            4,
        ).alias("avg_signal"),
        F.max_by("signal", "ts").alias("last_signal"),
    )
    w = Window.partitionBy("event_type").orderBy(F.col("bucket_start").desc())
    return (
        bucketed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            "bucket_start",
            "n",
            "min_signal",
            "max_signal",
            "avg_signal",
            "last_signal",
        )
    )


register("flagship_signal_snapshot", oracle=_ORACLE, tags=("A7", "A10", "B2", "B3"))(
    signal_snapshot
)
