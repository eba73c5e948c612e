"""Stream–stream joins (SURVEY.md §2 B26-family hardening).

The reference correlates nothing across streams — every tag is an
independent poll loop — but its users' dashboards do ("show readings
around each alarm"). Structured Streaming expresses that as a
watermarked stream–stream interval join: both sides declare how late
they can be, the join condition bounds the time range, and Spark keeps
only the watermark-bounded state window per key instead of the whole
history — the property that makes the join runnable forever at 100 TB
(state size is O(keys × lookback), not O(stream length)).

The same plan compiles for batch DataFrames (watermarks are a no-op),
so the batch twin is hash-checked against a DuckDB oracle while the
streaming path is exercised end-to-end in tests/test_streaming_joins.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    probe: DataFrame,
    ref: DataFrame,
    key: str,
    lookback: str = "10 minutes",
    watermark: str = "1 minute",
    probe_prefix: str = "p_",
    ref_prefix: str = "r_",
) -> DataFrame:
    """Join each probe-side row to the ref-side rows of the same ``key``
    whose ``ts`` falls in ``[probe.ts − lookback, probe.ts]``.

    Both inputs need (key, ts, ...) columns. Output columns are the two
    inputs' columns prefixed with ``probe_prefix``/``ref_prefix``
    (``key`` kept once, unprefixed). Watermarks are applied only when
    the input is actually streaming.
    """
    p = probe.select(
        F.col(key),
        *[F.col(c).alias(f"{probe_prefix}{c}") for c in probe.columns if c != key],
    )
    r = ref.select(
        F.col(key).alias("_rkey"),
        *[F.col(c).alias(f"{ref_prefix}{c}") for c in ref.columns if c != key],
    )
    if probe.isStreaming:
        p = p.withWatermark(f"{probe_prefix}ts", watermark)
    if ref.isStreaming:
        r = r.withWatermark(f"{ref_prefix}ts", watermark)
    pts, rts = F.col(f"{probe_prefix}ts"), F.col(f"{ref_prefix}ts")
    cond = (
        (F.col(key) == F.col("_rkey"))
        & (rts >= pts - F.expr(f"INTERVAL {lookback}"))
        & (rts <= pts)
    )
    return p.join(r, cond, "inner").drop("_rkey")


def enrich_with_config(stream: DataFrame, config: DataFrame) -> DataFrame:
    """Stream–static join: attach config metadata to live readings.

    The reference resolves each polled value against the XML config row
    that produced it (type/alias/interval — InfluxConnector2 keeps the
    parsed config in memory next to the poll loop). Spark's equivalent
    is a stream–static broadcast join: the config dimension is a static
    DataFrame (KBs — one row per configured tag), the readings stream
    probes it per micro-batch, and inactive tags drop out via the inner
    join. No state, no watermark interaction — the static side is
    re-broadcast per batch. (Note: a parquet static side keeps its
    file listing from plan time, so config EDITS need a query restart
    — or a Delta-backed config table, whose snapshots do refresh per
    batch. The reference behaves the same way: it parses the XML once
    at process start.)

    ``stream`` needs (plc_ip, alias) columns; the enriched output adds
    the config's data_type / data_area / address / poll_interval for
    downstream per-interval routing (streaming/sinks.py).
    """
    dim = config.filter(F.col("active")).select(
        "plc_ip",
        "alias",
        "data_type",
        "data_area",
        "address",
        "poll_interval",
    )
    return stream.join(F.broadcast(dim), ["plc_ip", "alias"], "inner")
