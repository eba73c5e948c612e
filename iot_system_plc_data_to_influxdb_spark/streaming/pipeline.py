"""The acquisition pipeline as streaming DataFrame transforms.

Reference dataflow (Linux/InfluxConnector2.py:124-195): poll → parse
address → decode buffer → null gate → cache current value → build
point → write. Here each step is a declarative transform shared by the
batch and streaming paths (same code runs under read and readStream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.decode import s7_value

POINT_SCHEMA = "ts timestamp, plc_ip string, alias string, value double"


def decode_readings(raw: DataFrame, *, strict_reference: bool = False) -> DataFrame:
    """raw reading (buf BINARY + declared type) → decoded point rows.

    A6 address parse happened at the source (bit_off column); this is
    A7 decode + A9 null gate + A11 point projection, all JVM-side.
    """
    decoded = raw.withColumn(
        "value",
        s7_value(
            F.col("data_type"),
            F.col("buf"),
            F.col("bit_off"),
            strict_reference=strict_reference,
        ),
    )
    return decoded.filter(F.col("value").isNotNull()).select(
        "ts", "plc_ip", "alias", "value"
    )


def downsample(
    points: DataFrame,
    window: str = "10 seconds",
    slide: str | None = None,
    watermark: str = "30 seconds",
) -> DataFrame:
    """B26: tumbling/sliding windowed aggregate with late-data watermark."""
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        points.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "plc_ip", "alias")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.avg("value").alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "plc_ip",
            "alias",
            "n",
            "min_value",
            "max_value",
            "avg_value",
        )
    )


def session_windows(
    points: DataFrame, gap: str = "30 seconds", watermark: str = "30 seconds"
) -> DataFrame:
    """B27: session windows keyed by (plc_ip, alias)."""
    return (
        points.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "plc_ip", "alias")
        .agg(F.count("*").alias("n"), F.last("value").alias("last_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "plc_ip",
            "alias",
            "n",
            "last_value",
        )
    )


def dedup_within_watermark(points: DataFrame, watermark: str = "1 minute") -> DataFrame:
    """B29 variant: streaming exact dedup bounded by the watermark."""
    return points.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["plc_ip", "alias", "ts"]
    )
