"""Stateful current-value table (SURVEY.md A10 / B29).

The reference caches the latest decoded value per tag by mutating
``data.m_value`` in its poll loop (Linux/InfluxConnector2.py:173).
Streaming equivalent: ``applyInPandasWithState`` keyed by
(plc_ip, alias), state = (last_ts, last_value); each micro-batch emits
the updated current value per key. Batch equivalent: ``max_by``.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "plc_ip string, alias string, last_ts timestamp, last_value double"
STATE_SCHEMA = "last_ts timestamp, last_value double"


def _update(
    key: Tuple[str, str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    last_ts, last_value = state.get if state.exists else (None, None)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        idx = pdf["ts"].idxmax()
        ts, val = pdf.loc[idx, "ts"], float(pdf.loc[idx, "value"])
        if last_ts is None or ts >= last_ts:
            last_ts, last_value = ts, val
    state.update((last_ts, last_value))
    yield pd.DataFrame(
        {
            "plc_ip": [key[0]],
            "alias": [key[1]],
            "last_ts": [last_ts],
            "last_value": [last_value],
        }
    )


def current_value_stream(points: DataFrame) -> DataFrame:
    """Streaming current-value table: one updated row per key per batch."""
    return points.groupBy("plc_ip", "alias").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def current_value_batch(points: DataFrame) -> DataFrame:
    """Batch twin (used by the b29 oracle query): max_by per key."""
    return points.groupBy("plc_ip", "alias").agg(
        F.max("ts").alias("last_ts"),
        F.max_by("value", "ts").alias("last_value"),
    )


# --------------------------------------------------------------------------
# Deadman / heartbeat alerts: the monitoring loop InfluxDB users get
# from Kapacitor's deadman() — alert when a series goes SILENT. The
# reference's poll loop can only observe data that arrives; silence is
# the event-time-timeout case, which is exactly what GroupState's
# EventTimeTimeout models: every point re-arms the key's timeout at
# last_ts + interval, and when the WATERMARK passes that deadline with
# no new data the state times out and emits one alert row. State is
# one timestamp per live key; an alert clears it, so the next point
# re-arms a fresh silence episode (one alert per outage, not per
# batch). Scale: state cardinality = series cardinality, exactly like
# the A10 current-value table.
# --------------------------------------------------------------------------
DEADMAN_OUTPUT = (
    "plc_ip string, alias string, last_ts timestamp, silent_for_s double"
)
DEADMAN_STATE = "last_ts timestamp"


def deadman_alerts(
    points: DataFrame,
    *,
    interval: str = "30 seconds",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming silent-series detector.

    points (ts, plc_ip, alias, ...) → alert stream
    (plc_ip, alias, last_ts, silent_for_s), one row per key per
    silence episode, emitted when the event-time watermark passes
    last_ts + interval with no newer point for the key.

    Semantic note: GroupState timeouts fire only for keys with NO
    input rows in the micro-batch, so a key that recovers in the same
    batch that crossed its deadline never alerts — the outage healed
    before silence was observed, which is the behavior a deadman
    wants (tests/test_streaming.py::test_deadman_rearms_after_recovery
    pins both the episode split and this supersession).

    Requires a UTC session timezone (this engine's session.py pins it):
    the epoch math converts naive pandas timestamps with .timestamp(),
    which reads them as UTC — a non-UTC session would skew deadlines
    and silent_for_s by the zone offset.
    """
    try:
        n, unit = interval.split()
        mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
                "hour": 3600, "hours": 3600}[unit]
        interval_ms = int(n) * mult * 1000
    except (ValueError, KeyError):
        raise ValueError(
            f"unsupported deadman interval {interval!r} "
            "(use 'N seconds|minutes|hours')"
        )

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            (last_ts,) = state.get
            wm_s = state.getCurrentWatermarkMs() / 1000.0
            state.remove()
            yield pd.DataFrame(
                {
                    "plc_ip": [key[0]],
                    "alias": [key[1]],
                    "last_ts": [last_ts],
                    "silent_for_s": [wm_s - last_ts.timestamp()],
                }
            )
        else:
            last_ts = state.get[0] if state.exists else None
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts = pdf["ts"].max()
                if last_ts is None or ts >= last_ts:
                    last_ts = ts
            if last_ts is not None:  # all-empty chunks: nothing to arm
                state.update((last_ts,))
                # a LATE point can put last_ts + interval below the
                # current watermark; setTimeoutTimestamp rejects
                # timestamps under the watermark (PySparkValueError,
                # which would kill the whole query), so clamp — the
                # timeout then fires in the next batch unless newer
                # data re-arms it, preserving one-alert-per-episode
                deadline = int(last_ts.timestamp() * 1000) + interval_ms
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(deadline, wm + 1))
            yield pd.DataFrame(
                {
                    "plc_ip": pd.Series([], dtype="object"),
                    "alias": pd.Series([], dtype="object"),
                    "last_ts": pd.Series([], dtype="datetime64[us]"),
                    "silent_for_s": pd.Series([], dtype="float64"),
                }
            )

    return points.withWatermark("ts", watermark).groupBy(
        "plc_ip", "alias"
    ).applyInPandasWithState(
        fn,
        outputStructType=DEADMAN_OUTPUT,
        stateStructType=DEADMAN_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# --------------------------------------------------------------------------
# Spark-4 native variant: transformWithStateInPandas with a
# StatefulProcessor. Same semantics as current_value_stream, but on the
# new arbitrary-state API — typed ValueState survives across
# micro-batches and supports timers/TTL where the legacy
# applyInPandasWithState offers only GroupState. This is the forward
# path for the A10 current-value table.
# --------------------------------------------------------------------------
try:  # pragma: no cover - import guard mirrors session capabilities
    # the state-server protocol needs a working protobuf runtime; probe
    # it here so HAS_TRANSFORM_WITH_STATE is an honest capability flag
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class CurrentValueProcessor(StatefulProcessor):
        """Holds (last_ts, last_value) per (plc_ip, alias) key."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("cur", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                last_ts, last_value = self._state.get()
            else:
                last_ts, last_value = None, None
            for pdf in rows:
                if len(pdf) == 0:
                    continue
                idx = pdf["ts"].idxmax()
                ts, val = pdf.loc[idx, "ts"], float(pdf.loc[idx, "value"])
                if last_ts is None or ts >= last_ts:
                    last_ts, last_value = ts, val
            self._state.update((last_ts, last_value))
            yield pd.DataFrame(
                {
                    "plc_ip": [key[0]],
                    "alias": [key[1]],
                    "last_ts": [last_ts],
                    "last_value": [last_value],
                }
            )

        def close(self) -> None:
            pass

    HAS_TRANSFORM_WITH_STATE = True
except ImportError:  # pragma: no cover
    HAS_TRANSFORM_WITH_STATE = False


def current_value_stream_tws(points: DataFrame) -> DataFrame:
    """Streaming current-value table on the Spark-4 StatefulProcessor API."""
    if not HAS_TRANSFORM_WITH_STATE:
        raise NotImplementedError("transformWithStateInPandas needs Spark >= 4.0")
    return points.groupBy("plc_ip", "alias").transformWithStateInPandas(
        CurrentValueProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="None",
    )


THRESHOLD_OUTPUT = (
    "event_type string, alert_ts timestamp, n_points int, peak double"
)
THRESHOLD_STATE = "run_len int, alerted boolean, peak double"


def threshold_alerts(
    events: DataFrame,
    *,
    threshold: float,
    n_for: int = 3,
) -> DataFrame:
    """Streaming sustained-threshold alerting — the live twin of the
    batch b23_alert_episodes query (plans/timeseries.py): per series
    (event_type), a run of >= n_for consecutive breaching samples
    raises ONE alert at the sample that completes the run; the run —
    and the alert latch — reset on the first non-breaching sample, so
    the next episode alerts again (Kapacitor's stateChangesOnly).

    State is (run_len, alerted, peak) per key — O(series), not
    O(events) — carried by GroupState with no timeout (nothing expires:
    a silent series simply keeps its run). Samples are processed in
    (ts) order within each micro-batch; cross-batch continuation is
    exactly what the batch operator cannot do and the test pins (a run
    split 2+1 across batches still alerts on the third sample)."""

    def fn(key, pdfs, state: GroupState):
        run_len, alerted, peak = (
            state.get if state.exists else (0, False, float("-inf"))
        )
        out_ts, out_n, out_peak = [], [], []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            for _, row in pdf.sort_values("ts").iterrows():
                v = float(row["value"])
                if v > threshold:
                    run_len += 1
                    peak = max(peak, v)
                    if run_len >= n_for and not alerted:
                        alerted = True
                        out_ts.append(row["ts"])
                        out_n.append(run_len)
                        out_peak.append(peak)
                else:
                    run_len, alerted, peak = 0, False, float("-inf")
        state.update((run_len, alerted, peak))
        yield pd.DataFrame(
            {
                "event_type": pd.Series(
                    [key[0]] * len(out_ts), dtype="object"
                ),
                "alert_ts": pd.Series(out_ts, dtype="datetime64[us]"),
                "n_points": pd.Series(out_n, dtype="int32"),
                "peak": pd.Series(out_peak, dtype="float64"),
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=THRESHOLD_OUTPUT,
        stateStructType=THRESHOLD_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ATTR_OUTPUT = (
    "user_id bigint, purchase_event_id bigint, purchase_ts timestamp, "
    "view_event_id bigint, view_ts timestamp, lag_us bigint"
)
ATTR_STATE = "view_ts timestamp, view_event_id bigint"


def _attr_update(
    key,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Last-touch attribution fold: per user, carry the most recent
    'view' (ts, event_id) across micro-batches; each 'purchase' emits
    one attribution row against the view state at that point of the
    (ts, event_id)-ordered walk. On ordered input this is exactly the
    batch twin (plans/streaming_parity.b27_attribution)."""
    view_ts, view_id = state.get if state.exists else (None, None)
    out = {
        "user_id": [], "purchase_event_id": [], "purchase_ts": [],
        "view_event_id": [], "view_ts": [], "lag_us": [],
    }
    rows = pd.concat(list(pdfs), ignore_index=True)
    if len(rows):
        rows = rows.sort_values(["ts", "event_id"])
        for _, r in rows.iterrows():
            if r["event_type"] == "view":
                if view_ts is None or r["ts"] >= view_ts:
                    view_ts, view_id = r["ts"], int(r["event_id"])
            elif r["event_type"] == "purchase":
                out["user_id"].append(int(key[0]))
                out["purchase_event_id"].append(int(r["event_id"]))
                out["purchase_ts"].append(r["ts"])
                out["view_event_id"].append(view_id)
                out["view_ts"].append(view_ts)
                out["lag_us"].append(
                    None
                    if view_ts is None
                    else (r["ts"] - view_ts).value // 1000
                )
    state.update((view_ts, view_id))
    yield pd.DataFrame(out)


def attribution_stream(events: DataFrame) -> DataFrame:
    """Streaming last-touch attribution: state = last view per user,
    one output row per purchase as it arrives (append semantics)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _attr_update,
        outputStructType=ATTR_OUTPUT,
        stateStructType=ATTR_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Alert state transitions (B23e'): the streaming notification edge.
# State = (last_level, last_ts, last_event_id) per series; each batch
# walks its rows in (ts, event_id) order, fires one row per level
# CHANGE (ok→alert, alert→ok), and stays silent while the state holds
# — the exact semantics of the batch LAG query
# (plans/timeseries.b23_alert_transitions), with the lag carried
# across micro-batch boundaries by the state store. The first
# observation of a series ever sets its initial state without firing.
# Late/replayed rows (at or before the watermark position already
# consumed, i.e. (ts, event_id) <= state) are dropped deterministically
# — the scene_change_stream rule. State is O(series), like deadman.
# --------------------------------------------------------------------------
ALERT_OUTPUT = (
    "event_type string, ts timestamp, event_id bigint, value double, "
    "from_state string, to_state string"
)
ALERT_STATE = "last_level int, last_ts timestamp, last_event_id bigint"

ALERT_THRESHOLD = 80.0


def _alert_update(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    last_level, last_ts, last_id = (
        state.get if state.exists else (None, None, None)
    )
    out = {
        "event_type": [], "ts": [], "event_id": [], "value": [],
        "from_state": [], "to_state": [],
    }
    rows = pd.concat(list(pdfs), ignore_index=True)
    if len(rows):
        rows = rows.sort_values(["ts", "event_id"])
        for _, r in rows.iterrows():
            ts, eid = r["ts"], int(r["event_id"])
            if last_ts is not None and (
                ts < last_ts or (ts == last_ts and eid <= last_id)
            ):
                continue  # replay / out-of-order: already consumed
            level = 1 if float(r["value"]) > ALERT_THRESHOLD else 0
            if last_level is not None and level != last_level:
                out["event_type"].append(key[0])
                out["ts"].append(ts)
                out["event_id"].append(eid)
                out["value"].append(float(r["value"]))
                out["from_state"].append(
                    "alert" if last_level == 1 else "ok"
                )
                out["to_state"].append("alert" if level == 1 else "ok")
            last_level, last_ts, last_id = level, ts, eid
    state.update((last_level, last_ts, last_id))
    yield pd.DataFrame(out)


def alert_transition_stream(events: DataFrame) -> DataFrame:
    """Streaming ok↔alert edge detector: one row per state change,
    silence while the state holds (append semantics)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _alert_update,
        outputStructType=ALERT_OUTPUT,
        stateStructType=ALERT_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
