"""Streaming link-graph extraction (B19h × B26/B29).

The batch handoff extraction (plans/northstar._handoff_pairs) is a
LAG over (event_type, hour-bucket) — not directly streamable, because
window functions need the whole partition. This module is its
streaming twin in the engine's established stateful-twin pattern
(alert_transition_stream, scene_change_stream): state per activity
bucket carries the chain head across micro-batch boundaries, so an
edge whose two endpoints arrive in DIFFERENT batches still fires
exactly once, and replayed/late rows (at or before the retained
(ts, event_id) high-water mark) are dropped deterministically.

Scale: state is one (last_ts, last_event_id, last_user) row per
ACTIVE (event_type, hour) bucket — O(active buckets), never O(events).
The bucket key is event-time, so a production run adds an event-time
timeout to retire closed hours (the deadman pattern); the fixed-corpus
tests keep NoTimeout for determinism, like the other twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EDGE_OUTPUT = (
    "event_type string, hr bigint, src bigint, dst bigint, "
    "ts timestamp, event_id bigint"
)
EDGE_STATE = "last_ts timestamp, last_event_id bigint, last_user bigint"


def handoff_edge_stream(events: DataFrame) -> DataFrame:
    """events (ts, event_id, user_id, event_type) → directed handoff
    edges (event_type, hr, src, dst, ts, event_id): src = the
    bucket's previous DISTINCT user, dst = the acting user — the same
    pairs the batch LAG emits (consecutive same-user rows emit nothing
    but still advance the chain, exactly like LAG)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        event_type, hr = key
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if state.exists:
            last_ts, last_eid, last_user = state.get
            last_ts = pd.Timestamp(last_ts)
        else:
            last_ts, last_eid, last_user = None, None, None
        out = {
            "event_type": [], "hr": [], "src": [], "dst": [],
            "ts": [], "event_id": [],
        }
        for _, r in rows.iterrows():
            ts, eid, user = r["ts"], int(r["event_id"]), int(r["user_id"])
            if last_ts is not None and (ts, eid) <= (last_ts, last_eid):
                continue  # replay/late vs the high-water mark: drop
            if last_user is not None and last_user != user:
                out["event_type"].append(event_type)
                out["hr"].append(int(hr))
                out["src"].append(last_user)
                out["dst"].append(user)
                out["ts"].append(ts)
                out["event_id"].append(eid)
            last_ts, last_eid, last_user = ts, eid, user
        if last_ts is not None:
            state.update((last_ts.to_pydatetime(), last_eid, last_user))
        yield pd.DataFrame(out)

    keyed = events.select(
        "ts",
        "event_id",
        "user_id",
        "event_type",
        F.floor(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / 3600
        ).cast("bigint").alias("hr"),
    )
    return keyed.groupBy("event_type", "hr").applyInPandasWithState(
        update,
        outputStructType=EDGE_OUTPUT,
        stateStructType=EDGE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
