"""Batch-checkable twins of the streaming operators (SURVEY.md §2
B26–B30) plus the UDF-surface cross-checks.

The real streaming paths (watermarks, applyInPandasWithState, the
plc_sim source) run in tests/test_streaming.py; these queries pin the
*semantics* of each windowing/state operator against the DuckDB oracle
on the events table, so the correctness gate covers them too.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import events_between, t
from .config_plane import DECODE_VECTORS, _A7_ORACLE
from .registry import register


# --------------------------------------------------------------------------
# B26 — sliding-window aggregate (width 10 min, slide 5 min): every row
# lands in exactly two windows; oracle enumerates both starts per row.
# --------------------------------------------------------------------------
@register(
    "b26_sliding_window",
    oracle="""
    WITH g AS (SELECT unnest([0, 300]) AS shift),
    assigned AS (
      SELECT event_type,
        TIMESTAMP '1970-01-01 00:00:00' + to_seconds(
          CAST(FLOOR(FLOOR(epoch(ts)) / 300) * 300 - shift AS BIGINT)
        ) AS win_start,
        value
      FROM events CROSS JOIN g
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-03'
    )
    SELECT event_type, win_start,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM assigned
    GROUP BY event_type, win_start
    """,
    tags=("B26",),
)
def b26(spark, sf_dir):
    # raw-nanos range filter → parquet PushedFilters (catalog.events_between)
    ev = events_between(spark, sf_dir, "2024-01-01", "2024-01-03")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").start.alias("win_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .select("event_type", "win_start", "n", "sum_value")
    )


# --------------------------------------------------------------------------
# B27 — session windows (30-minute gap) per user; oracle via the
# lag-gap cumulative-sum trick (SURVEY.md §7 risk register)
# --------------------------------------------------------------------------
@register(
    "b27_session_window",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
        CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE OR
                  LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WHERE user_id < 20
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts,
        SUM(new_session) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id,
      MIN(ts) AS session_start,
      MAX(ts) + INTERVAL 30 MINUTE AS session_end,
      COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
    tags=("B27",),
)
def b27(spark, sf_dir):
    # session_window end = last event + gap, matching the oracle's
    # MAX(ts) + 30min. The native operator also works under readStream
    # with a watermark (tests/test_streaming.py).
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# B29 — stateful current-value table (A10): batch twin of
# streaming/state.current_value_stream
# --------------------------------------------------------------------------
@register(
    "b29_current_value",
    oracle="""
    SELECT user_id, event_type,
      MAX(ts) AS last_ts,
      MAX_BY(value, ts) AS last_value
    FROM events GROUP BY user_id, event_type
    """,
    tags=("B29", "A10"),
)
def b29(spark, sf_dir):
    from ..streaming.state import current_value_batch

    ev = t(spark, sf_dir, "events").select(
        F.col("user_id").alias("plc_ip"), F.col("event_type").alias("alias"),
        "ts", "value",
    )
    return current_value_batch(ev).select(
        F.col("plc_ip").alias("user_id"),
        F.col("alias").alias("event_type"),
        "last_ts",
        "last_value",
    )


# --------------------------------------------------------------------------
# B28 — watermark semantics: late-arrival accounting. The real
# withWatermark drop runs in tests/test_streaming.py; this batch twin
# computes, per 5-min bucket, how many rows a 1-minute watermark would
# have dropped — i.e. rows whose ts is behind the running max ts (in
# arrival order = event_id) minus the watermark.
#
# Scale shape: a global running max is NOT one big Window.orderBy
# (which moves the whole table to a single partition — WindowExec
# warns, and at 100 TB it is a driver-killer). Two-pass instead:
# (1) range-bucket event_id into P contiguous slices and take the
#     running max WITHIN each slice (Window partitioned by slice —
#     fully parallel);
# (2) per-slice maxima (P scalar rows) come back to the driver, a
#     prefix max over them is computed in plain Python, and the P
#     (slice, prefix_max) pairs are broadcast back.
# running_max(row) = greatest(within-slice cummax, prefix max of all
# earlier slices). Only P scalars ever hit the driver.
# --------------------------------------------------------------------------
_B28_ORACLE = """
    WITH flagged AS (
      SELECT ts,
        CAST(ts < MAX(ts) OVER (ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             - INTERVAL 1 MINUTE AS INT) AS late
      FROM events
    )
    SELECT
      TIMESTAMP '1970-01-01 00:00:00' + to_seconds(
        CAST(FLOOR(FLOOR(epoch(ts)) / 300) * 300 AS BIGINT)
      ) AS bucket_start,
      COUNT(*) AS n,
      CAST(SUM(late) AS BIGINT) AS n_late
    FROM flagged GROUP BY bucket_start
"""


@register("b28_watermark_accounting", oracle=_B28_ORACLE, tags=("B28",))
def b28(spark, sf_dir):
    from pyspark.sql import Window

    P = 32
    ev = t(spark, sf_dir, "events").select("event_id", "ts")
    lo, hi = ev.agg(F.min("event_id"), F.max("event_id")).first()
    span = max(1, int(hi) - int(lo) + 1)
    bucketed = ev.withColumn(
        "_slice",
        F.least(
            F.lit(P - 1),
            ((F.col("event_id") - F.lit(int(lo))) * P / F.lit(span)).cast("int"),
        ),
    )
    # pass 1: within-slice running max, excluding the current row
    win = (
        Window.partitionBy("_slice")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # pass 2: P scalar slice-maxima → driver prefix max → broadcast
    slice_max = {
        r["_slice"]: r["m"]
        for r in bucketed.groupBy("_slice").agg(F.max("ts").alias("m")).collect()
    }
    prefix, best = [], None
    for s in range(P):
        prefix.append((s, best))
        if s in slice_max and (best is None or slice_max[s] > best):
            best = slice_max[s]
    pre = F.broadcast(
        spark.createDataFrame(prefix, "_slice int, _pre timestamp")
    )
    flagged = (
        bucketed.join(pre, "_slice", "left")
        .withColumn("_run_max", F.greatest(F.max("ts").over(win), F.col("_pre")))
        .withColumn(
            "late",
            (F.col("ts") < F.col("_run_max") - F.expr("INTERVAL 1 MINUTE")).cast(
                "int"
            ),
        )
    )
    return flagged.groupBy(
        F.window("ts", "5 minutes").start.alias("bucket_start")
    ).agg(
        F.count("*").alias("n"),
        F.sum("late").alias("n_late"),
    )


# --------------------------------------------------------------------------
# B30 — UDTF surface: Python table function via LATERAL, oracle-checked
# against a pure-SQL tokenizer
# --------------------------------------------------------------------------
@register(
    "b30_udtf_tokenize",
    oracle=r"""
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE doc_id < 20
    ),
    p AS (
      SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i FROM d
    )
    SELECT doc_id, w[i] AS token, i - 1 AS pos FROM p
    """,
    tags=("B30",),
)
def b30_udtf(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, pos int")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate((text or "").split()):
                yield tok, i

    spark.udtf.register("tokenize_udtf", Tokenize)
    t(spark, sf_dir, "documents").createOrReplaceTempView("b30_documents")
    return spark.sql(
        """
        SELECT doc_id, tk.token, tk.pos
        FROM b30_documents, LATERAL tokenize_udtf(text) tk
        WHERE doc_id < 20
        """
    )


# --------------------------------------------------------------------------
# B30 — UDF surface: Arrow-batched pandas-UDF decode cross-checked
# against the same oracle as the native CASE decode (a7)
# --------------------------------------------------------------------------
@register("b30_udf_decode", oracle=_A7_ORACLE, tags=("B30",))
def b30(spark, sf_dir):
    from ..functions.decode import s7_value_pandas

    vec = spark.createDataFrame(
        DECODE_VECTORS,
        "name string, data_type string, b0 int, b1 int, b2 int, b3 int, bit_off int",
    )
    to_hex = lambda c: F.lpad(F.hex(F.col(c)), 2, "0")  # noqa: E731
    buf = F.unhex(F.concat(to_hex("b0"), to_hex("b1"), to_hex("b2"), to_hex("b3")))
    decoded = vec.select(
        "name",
        "data_type",
        s7_value_pandas(F.col("data_type"), buf, F.col("bit_off")).alias("value"),
    )
    return decoded.filter(F.col("value").isNotNull())


# --------------------------------------------------------------------------
# B26b — stream-stream interval join (streaming/joins.py), batch twin:
# each click joined to the same user's errors in the preceding 10
# minutes. The streaming path (watermarked, state bounded by the
# lookback) runs the SAME plan in tests/test_streaming_joins.py; here
# the batch compilation is hash-checked against the oracle.
# --------------------------------------------------------------------------
@register(
    "b26_stream_stream_join",
    oracle="""
    SELECT c.user_id,
      c.event_id AS click_id, c.ts AS click_ts,
      e.event_id AS error_id, e.ts AS error_ts, e.value AS error_value
    FROM events c JOIN events e
      ON e.user_id = c.user_id
     AND e.ts >= c.ts - INTERVAL 10 MINUTE AND e.ts <= c.ts
    WHERE c.event_type = 'click' AND e.event_type = 'error'
    """,
    tags=("B26", "B10"),
)
def b26_stream_stream_join(spark, sf_dir):
    from ..streaming.joins import interval_join

    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id", "value"
    )
    return interval_join(clicks, errors, "user_id", lookback="10 minutes").select(
        "user_id",
        F.col("p_event_id").alias("click_id"),
        F.col("p_ts").alias("click_ts"),
        F.col("r_event_id").alias("error_id"),
        F.col("r_ts").alias("error_ts"),
        F.col("r_value").alias("error_value"),
    )


# --------------------------------------------------------------------------
# B26c/B23 — deadman (silent-series) detection, batch twin of
# streaming/state.deadman_alerts: keys whose latest event trails the
# corpus frontier by more than the interval. The streaming path emits
# the alert when the WATERMARK passes last_ts + interval
# (EventTimeTimeout, tests/test_streaming.py::
# test_deadman_alerts_on_silent_series); this batch twin pins the
# same predicate shape against the oracle. Scale: per-key MAX is a
# map-side partial aggregate; the frontier is one broadcast scalar —
# no second full-table pass.
# --------------------------------------------------------------------------
@register(
    "b23_deadman_silent_series",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS m FROM events),
    last AS (SELECT user_id, MAX(ts) AS last_ts FROM events GROUP BY user_id)
    SELECT user_id, last_ts,
      CAST(FLOOR(epoch(m)) - FLOOR(epoch(last_ts)) AS BIGINT) AS silent_s
    FROM last CROSS JOIN mx
    WHERE last_ts < m - INTERVAL 1 DAY
    """,
    tags=("B23", "B26"),
)
def b23_deadman_silent_series(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    frontier = ev.agg(F.max("ts").alias("m"))
    last = ev.groupBy("user_id").agg(F.max("ts").alias("last_ts"))
    return (
        last.crossJoin(F.broadcast(frontier))
        .filter(F.col("last_ts") < F.col("m") - F.expr("INTERVAL 1 DAY"))
        .select(
            "user_id",
            "last_ts",
            # Floor-per-endpoint on BOTH engines: Spark unix_timestamp
            # truncates each timestamp to whole seconds exactly like the
            # oracle's FLOOR(epoch(..)) per endpoint, so silent_s stays
            # hash-equal even on sub-second fixtures (pinned by
            # tests/test_streaming.py::test_deadman_silent_s_subsecond).
            (F.unix_timestamp("m") - F.unix_timestamp("last_ts")).alias(
                "silent_s"
            ),
        )
    )


# --------------------------------------------------------------------------
# B27f — funnel-stage analysis (the ordered-sequence companion to
# session windows): per user, the earliest view, the first click
# STRICTLY AFTER that view, and the first purchase strictly after that
# click — the classic conversion funnel where ordering matters (a
# purchase before the click does not count). Three small keyed
# aggregates chained by broadcast-friendly equi-joins on user_id; no
# window over the full event stream, no global sort.
# --------------------------------------------------------------------------
_B27_FUNNEL_ORACLE = """
    WITH u1 AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    u2 AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN u1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > u1.t_view
      GROUP BY e.user_id
    ),
    u3 AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN u2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > u2.t_click
      GROUP BY e.user_id
    )
    SELECT u1.user_id, u1.t_view, u2.t_click, u3.t_purchase,
      CAST(CASE WHEN u3.user_id IS NOT NULL THEN 3
                WHEN u2.user_id IS NOT NULL THEN 2
                ELSE 1 END AS INT) AS stage
    FROM u1
    LEFT JOIN u2 ON u2.user_id = u1.user_id
    LEFT JOIN u3 ON u3.user_id = u1.user_id
"""


@register("b27_funnel_stages", oracle=_B27_FUNNEL_ORACLE, tags=("B27",))
def b27_funnel_stages(spark, sf_dir):
    from ..catalog import events_between

    ev = events_between(spark, sf_dir).select("user_id", "event_type", "ts")
    u1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    u2 = (
        ev.filter(F.col("event_type") == "click")
        .join(u1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    u3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(u2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        u1.join(u2, "user_id", "left")
        .join(u3, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.when(F.col("t_purchase").isNotNull(), 3)
            .when(F.col("t_click").isNotNull(), 2)
            .otherwise(1)
            .cast("int")
            .alias("stage"),
        )
    )


# --------------------------------------------------------------------------
# B27r — retention cohorts (the aggregate companion of the funnel):
# users cohorted by their first 'signup' week, activity bucketed by
# whole weeks since the cohort week, retention = active / cohort size
# in exact fixed-point. date_trunc('week') is Monday-start in both
# engines; the week offset is pure integer day arithmetic. Shape: one
# tiny cohort aggregate, one fact-side distinct over (cohort, k,
# user), one small join — nothing wider than the user dimension.
# --------------------------------------------------------------------------
_B27_RETENTION_ORACLE = """
    WITH c AS (
      SELECT user_id,
        date_trunc('week', MIN(ts)) AS cw
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    sizes AS (SELECT cw, COUNT(*) AS n_cohort FROM c GROUP BY cw),
    act AS (
      SELECT DISTINCT c.cw, c.user_id,
        CAST(date_diff('day', c.cw, date_trunc('week', e.ts)) // 7
          AS INT) AS week_k
      FROM events e JOIN c USING (user_id)
      WHERE date_trunc('week', e.ts) >= c.cw
    ),
    r AS (
      SELECT cw, week_k, COUNT(*) AS n_active FROM act GROUP BY cw, week_k
    )
    SELECT CAST(r.cw AS TIMESTAMP) AS cohort_week, r.week_k,
      CAST(r.n_active AS BIGINT) AS n_active,
      CAST(s.n_cohort AS BIGINT) AS n_cohort,
      ((2 * r.n_active * 10000 + s.n_cohort) // (2 * s.n_cohort))
        / 10000.0 AS retention
    FROM r JOIN sizes s USING (cw)
"""


@register("b27_retention_cohorts", oracle=_B27_RETENTION_ORACLE, tags=("B27",))
def b27_retention_cohorts(spark, sf_dir):
    from ..catalog import events_between
    from ._exact import round_ratio

    ev = events_between(spark, sf_dir).select("user_id", "event_type", "ts")
    c = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cw"))
    )
    sizes = c.groupBy("cw").agg(F.count("*").alias("n_cohort"))
    act = (
        ev.join(c, "user_id")
        .withColumn("aw", F.date_trunc("week", F.col("ts")))
        .filter(F.col("aw") >= F.col("cw"))
        .select(
            "cw",
            "user_id",
            F.floor(
                F.datediff(F.col("aw"), F.col("cw")) / 7
            ).cast("int").alias("week_k"),
        )
        .distinct()
    )
    r = act.groupBy("cw", "week_k").agg(F.count("*").alias("n_active"))
    return r.join(sizes, "cw").select(
        F.col("cw").alias("cohort_week"),
        "week_k",
        F.col("n_active").cast("bigint").alias("n_active"),
        F.col("n_cohort").cast("bigint").alias("n_cohort"),
        round_ratio(F.col("n_active"), F.col("n_cohort"), 4).alias(
            "retention"
        ),
    )


# --------------------------------------------------------------------------
# B27t — first-order Markov transition matrix over per-user event
# sequences (the "what do users do next" companion of the funnel):
# each user's events ordered by (ts, event_id) yield (from, to)
# bigrams via lag; counts roll up globally and the conditional
# probability P(to | from) is a rounded ratio of exact integers.
# Shape at 100 TB: ONE keyed shuffle on user_id for the per-user
# ordering window (users are numerous => no skew), then a tiny
# (|types|^2)-row aggregate with map-side partials. No driver
# collection, no global window.
# --------------------------------------------------------------------------
_B27_TRANSITIONS_ORACLE = """
    WITH s AS (
      SELECT user_id, event_type, ts, event_id,
        LAG(event_type) OVER (
          PARTITION BY user_id ORDER BY ts, event_id) AS from_event
      FROM events
    ),
    pairs AS (
      SELECT from_event, event_type AS to_event, COUNT(*) AS n
      FROM s WHERE from_event IS NOT NULL
      GROUP BY from_event, event_type
    ),
    tot AS (
      SELECT from_event, SUM(n) AS n_from FROM pairs GROUP BY from_event
    )
    SELECT p.from_event, p.to_event,
      CAST(p.n AS BIGINT) AS n_transitions,
      CAST(t.n_from AS BIGINT) AS n_from,
      ((2 * p.n * 10000 + t.n_from) // (2 * t.n_from)) / 10000.0 AS p
    FROM pairs p JOIN tot t USING (from_event)
"""


@register(
    "b27_event_transitions", oracle=_B27_TRANSITIONS_ORACLE, tags=("B27",)
)
def b27_event_transitions(spark, sf_dir):
    from pyspark.sql import Window

    from ._exact import round_ratio

    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        F.lag("event_type").over(w).alias("from_event"),
    )
    pairs = (
        s.filter(F.col("from_event").isNotNull())
        .groupBy("from_event", F.col("event_type").alias("to_event"))
        .agg(F.count("*").alias("n"))
    )
    # row totals as an unordered window over the |types|^2-row
    # aggregate (a groupBy+join re-executes the whole upstream window
    # subtree — two full scans; this is one scan, one fact shuffle)
    wn = Window.partitionBy("from_event")
    return pairs.withColumn("n_from", F.sum("n").over(wn)).select(
        "from_event",
        "to_event",
        F.col("n").cast("bigint").alias("n_transitions"),
        F.col("n_from").cast("bigint").alias("n_from"),
        round_ratio(F.col("n"), F.col("n_from"), 4).alias("p"),
    )


# --------------------------------------------------------------------------
# B27sq — SEQUENTIAL 3-GRAM PATTERN MINING (user-support semantics):
# the sequence-mining step past b27_event_transitions' Markov bigrams
# — count each consecutive 3-event pattern by how many DISTINCT USERS
# exhibit it (classic sequential-pattern support, not raw occurrence:
# one bot looping a path a thousand times is ONE supporter), keep
# patterns with support >= 3 users, and report support alongside raw
# occurrences. The "what 3-step journeys actually recur across the
# user base" question a funnel designer asks before hand-building
# funnels. Two LAG taps on one per-user ordered window (same single
# exchange as the bigram query), then one pattern aggregate with
# count + count_distinct — exact integers throughout.
# --------------------------------------------------------------------------
_B27_SEQ3_ORACLE = """
    WITH s AS (
      SELECT user_id, event_type AS e3,
        LAG(event_type, 1) OVER w AS e2,
        LAG(event_type, 2) OVER w AS e1
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (
      SELECT e1, e2, e3,
        COUNT(*) AS n_occurrences,
        COUNT(DISTINCT user_id) AS support_users
      FROM s WHERE e1 IS NOT NULL
      GROUP BY 1, 2, 3
    )
    SELECT e1, e2, e3,
      CAST(n_occurrences AS BIGINT) AS n_occurrences,
      CAST(support_users AS BIGINT) AS support_users
    FROM g WHERE support_users >= 3
"""


@register("b27_sequence_trigrams", oracle=_B27_SEQ3_ORACLE, tags=("B27",))
def b27_sequence_trigrams(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        F.col("event_type").alias("e3"),
        F.lag("event_type", 1).over(w).alias("e2"),
        F.lag("event_type", 2).over(w).alias("e1"),
    )
    return (
        s.filter(F.col("e1").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.count_distinct("user_id").cast("bigint").alias(
                "support_users"
            ),
        )
        .filter(F.col("support_users") >= 3)
    )


# --------------------------------------------------------------------------
# B27p — sessionized top-paths: the navigation-analysis companion of
# the session window (b27_session_window) and the transition matrix
# (b27_event_transitions) — sessions cut at 30-min inactivity gaps,
# each session reduced to its first three events as an ordered path
# string, paths counted corpus-wide with an exact share. Gap tests run
# on integer MICROSECONDS (unix_micros/epoch_us — engines agree; a
# seconds-floor would misclassify sub-second gaps, the deadman
# lesson). Path assembly sorts (ts, event_id, type) STRUCTS inside the
# group — the unique event_id makes collect order irrelevant. Shape at
# 100 TB: one user_id-keyed window pass (sessionize + rank), one
# (user, session) aggregate, then a path aggregate whose output is
# bounded by |types|^3 — the totals join broadcasts one row.
# --------------------------------------------------------------------------
_B27_PATHS_ORACLE = """
    WITH s AS (
      SELECT user_id, event_type, ts, event_id,
        CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
             OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_type, ts, event_id,
        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM s
    ),
    rk AS (
      SELECT user_id, sid, event_type, ts, event_id,
        ROW_NUMBER() OVER (PARTITION BY user_id, sid
          ORDER BY ts, event_id) AS rn
      FROM sess
    ),
    paths AS (
      SELECT user_id, sid,
        string_agg(event_type, '->' ORDER BY ts, event_id) AS path
      FROM rk WHERE rn <= 3 GROUP BY user_id, sid
    ),
    pc AS (SELECT path, COUNT(*) AS n FROM paths GROUP BY path),
    tot AS (SELECT SUM(n) AS n_total FROM pc)
    SELECT pc.path, CAST(pc.n AS BIGINT) AS n_sessions,
      CAST(t.n_total AS BIGINT) AS n_total,
      ((2 * pc.n * 10000 + t.n_total) // (2 * t.n_total)) / 10000.0
        AS share
    FROM pc, tot t
"""


@register("b27_top_paths", oracle=_B27_PATHS_ORACLE, tags=("B27",))
def b27_top_paths(spark, sf_dir):
    from pyspark.sql import Window

    from ._exact import round_ratio

    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    s = ev.withColumn(
        "new_s",
        F.when(gap > 1_800_000_000, 1)
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0),
    )
    sess = s.withColumn("sid", F.sum("new_s").over(wc))
    wr = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    rk = sess.withColumn("rn", F.row_number().over(wr))
    paths = (
        rk.filter(F.col("rn") <= 3)
        .groupBy("user_id", "sid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda x: x["event_type"],
                ),
                "->",
            ).alias("path")
        )
    )
    pc = paths.groupBy("path").agg(F.count("*").alias("n"))
    tot = pc.agg(F.sum("n").alias("n_total"))
    return pc.join(F.broadcast(tot)).select(
        "path",
        F.col("n").cast("bigint").alias("n_sessions"),
        F.col("n_total").cast("bigint").alias("n_total"),
        round_ratio(F.col("n"), F.col("n_total"), 4).alias("share"),
    )


# --------------------------------------------------------------------------
# B27m — RFM segmentation (recency / frequency / monetary), the
# classic user-value rollup: per user, days since last purchase
# (integer day math vs the corpus max day — no wall clock, so the
# query replays bit-for-bit), purchase count, and cents total; each
# dimension scored 1-5 by exact rank quintiles. NTILE(5) itself is
# engine-ambiguous on ties, so the score is floor((rank-1)*5/n)+1
# over a (metric, user_id)-ordered ROW_NUMBER — a unique tie-break
# making the quintile assignment deterministic everywhere (the same
# idiom as the LM-fit exact-NTILE). Shape at 100 TB: one user-keyed
# aggregate (map-side partials), then three rank windows over the
# USER table — orders of magnitude smaller than events.
# --------------------------------------------------------------------------
_B27_RFM_ORACLE = """
    WITH p AS (
      SELECT user_id,
        MAX(CAST(date_trunc('day', ts) AS DATE)) AS last_day,
        CAST(COUNT(*) AS BIGINT) AS f,
        CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS m_cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    horizon AS (SELECT MAX(last_day) AS h FROM p),
    base AS (
      SELECT p.user_id,
        CAST(date_diff('day', p.last_day, horizon.h) AS BIGINT) AS r_days,
        p.f, p.m_cents,
        COUNT(*) OVER () AS n,
        ROW_NUMBER() OVER (ORDER BY date_diff('day', p.last_day, horizon.h) DESC,
                           p.user_id) AS rr,
        ROW_NUMBER() OVER (ORDER BY p.f, p.user_id) AS rf,
        ROW_NUMBER() OVER (ORDER BY p.m_cents, p.user_id) AS rm
      FROM p, horizon
    )
    SELECT user_id, r_days, f,
      CAST(m_cents AS DOUBLE) / 100 AS monetary,
      CAST((rr - 1) * 5 // n + 1 AS INT) AS r_score,
      CAST((rf - 1) * 5 // n + 1 AS INT) AS f_score,
      CAST((rm - 1) * 5 // n + 1 AS INT) AS m_score
    FROM base
"""


@register("b27_rfm_segments", oracle=_B27_RFM_ORACLE, tags=("B27",))
def b27_rfm_segments(spark, sf_dir):
    from pyspark.sql import Window

    p = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.to_date(F.date_trunc("day", "ts"))).alias("last_day"),
            F.count("*").cast("bigint").alias("f"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("m_cents"),
        )
    )
    horizon = p.agg(F.max("last_day").alias("h"))
    base = p.join(F.broadcast(horizon)).withColumn(
        "r_days", F.datediff(F.col("h"), F.col("last_day")).cast("bigint")
    )
    # the user table is the window input — small; single-partition
    # global ranks are fine here and exactly mirror the oracle. At
    # true scale, swap for the histogram-cutpoint exact-NTILE helper.
    wn = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rr = Window.orderBy(F.col("r_days").desc(), "user_id")
    rf = Window.orderBy("f", "user_id")
    rm = Window.orderBy("m_cents", "user_id")
    scored = base.select(
        "user_id",
        "r_days",
        "f",
        "m_cents",
        F.count("*").over(wn).alias("n"),
        F.row_number().over(rr).alias("rr"),
        F.row_number().over(rf).alias("rf"),
        F.row_number().over(rm).alias("rm"),
    )
    sc = lambda c: (  # noqa: E731
        ((F.col(c) - 1) * 5 - F.pmod((F.col(c) - 1) * 5, F.col("n")))
        / F.col("n")
        + 1
    ).cast("int")
    return scored.select(
        "user_id",
        "r_days",
        "f",
        (F.col("m_cents").cast("double") / 100).alias("monetary"),
        sc("rr").alias("r_score"),
        sc("rf").alias("f_score"),
        sc("rm").alias("m_score"),
    )


# --------------------------------------------------------------------------
# B27a — last-touch attribution: every purchase attributed to the SAME
# user's most recent preceding 'view' (the marketing-analytics asof
# join, expressed as conditional last(ignorenulls) over the per-user
# event stream — one keyed window pass, no self-join, the same
# de-recursion idiom as gap-fill). Purchases with no preceding view
# stay unattributed (NULL columns kept, like a left asof join); the
# attribution lag is exact integer microseconds.
# --------------------------------------------------------------------------
_B27_ATTRIBUTION_ORACLE = """
    WITH s AS (
      SELECT user_id, event_type, ts, event_id, value,
        LAST(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
          OVER w AS view_event_id,
        LAST(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
          OVER w AS view_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id AS purchase_event_id, ts AS purchase_ts,
      CAST(ROUND(value * 100) AS BIGINT) AS amount_cents,
      view_event_id, view_ts,
      CAST(CASE WHEN view_ts IS NOT NULL
        THEN epoch_us(ts) - epoch_us(view_ts) END AS BIGINT)
        AS lag_us
    FROM s WHERE event_type = 'purchase'
"""


@register(
    "b27_attribution", oracle=_B27_ATTRIBUTION_ORACLE, tags=("B27", "B11")
)
def b27_attribution(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_view = F.col("event_type") == "view"
    s = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        "value",
        F.last(F.when(is_view, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("view_event_id"),
        F.last(F.when(is_view, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("view_ts"),
    )
    return s.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("purchase_ts"),
        F.round(F.col("value") * 100).cast("bigint").alias("amount_cents"),
        "view_event_id",
        "view_ts",
        F.when(
            F.col("view_ts").isNotNull(),
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("view_ts")),
        )
        .cast("bigint")
        .alias("lag_us"),
    )


# --------------------------------------------------------------------------
# B27l — cohort LTV curve (the revenue companion of the retention
# matrix): users cohorted by signup week, purchase revenue bucketed by
# whole weeks since the cohort week, CUMULATIVE revenue per cohort
# user at each offset — the lifetime-value curve growth teams read.
# Revenue sums in exact integer cents, the running sum per cohort over
# a tiny (cohorts x offsets) table, per-user LTV as a rounded ratio.
# --------------------------------------------------------------------------
_B27_LTV_ORACLE = """
    WITH c AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cw
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    sizes AS (SELECT cw, COUNT(*) AS n_cohort FROM c GROUP BY cw),
    rev AS (
      SELECT c.cw,
        CAST(date_diff('day', c.cw, date_trunc('week', e.ts)) // 7
          AS INT) AS week_k,
        CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT)
          AS cents
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase'
        AND date_trunc('week', e.ts) >= c.cw
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT cw, week_k,
        CAST(SUM(cents) OVER (PARTITION BY cw ORDER BY week_k
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_cents
      FROM rev
    )
    SELECT CAST(m.cw AS TIMESTAMP) AS cohort_week, m.week_k,
      CAST(s.n_cohort AS BIGINT) AS n_cohort,
      CAST(m.cum_cents AS DOUBLE) / 100 AS cum_revenue,
      ((2 * m.cum_cents * 10000 + 100 * s.n_cohort)
        // (2 * 100 * s.n_cohort)) / 10000.0 AS ltv_per_user
    FROM cum m JOIN sizes s USING (cw)
"""


@register("b27_ltv_curve", oracle=_B27_LTV_ORACLE, tags=("B27",))
def b27_ltv_curve(spark, sf_dir):
    from pyspark.sql import Window

    from ._exact import round_ratio

    ev = t(spark, sf_dir, "events")
    c = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cw"))
    )
    sizes = c.groupBy("cw").agg(F.count("*").alias("n_cohort"))
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .withColumn("aw", F.date_trunc("week", "ts"))
        .filter(F.col("aw") >= F.col("cw"))
        .groupBy(
            "cw",
            F.floor(F.datediff(F.col("aw"), F.col("cw")) / 7)
            .cast("int")
            .alias("week_k"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    wc = (
        Window.partitionBy("cw")
        .orderBy("week_k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rev.select(
        "cw",
        "week_k",
        F.sum("cents").over(wc).cast("bigint").alias("cum_cents"),
    )
    return cum.join(F.broadcast(sizes), "cw").select(
        F.col("cw").alias("cohort_week"),
        "week_k",
        F.col("n_cohort").cast("bigint").alias("n_cohort"),
        (F.col("cum_cents").cast("double") / 100).alias("cum_revenue"),
        round_ratio(
            F.col("cum_cents"), 100 * F.col("n_cohort"), 4
        ).alias("ltv_per_user"),
    )


# --------------------------------------------------------------------------
# B19h × B29 — STREAMING HANDOFF-EXTRACTION PARITY AS A QUERY (round-10
# verdict #6): replay the events table through the stateful streaming
# extractor (streaming/graph.handoff_edge_stream) in THREE time-ordered
# micro-batches (availableNow, maxFilesPerTrigger=1) and assert, per
# (event_type, hour) bucket, that the streamed edge set is IDENTICAL to
# the batch LAG extraction — n_stream, n_batch and the 6-column-match
# count n_match as one relation. The oracle computes the batch LAG
# counts alone and claims all three columns equal it, so ANY stream
# divergence (edge lost at a micro-batch boundary, replay not dropped,
# mis-bucketed row) breaks the value hash. This keeps the streaming
# extraction honest under real micro-batch boundaries on every sweep,
# not just in the hand-crafted pytest scenario
# (tests/test_streaming.py::test_streaming_handoff_edges_match_batch_lag).
#
# Scale notes: the three-way slice is ts-range (time-monotone per
# bucket, so the stream's per-bucket high-water mark never mistakes a
# later slice for a replay); the only driver actions are the 1-row
# min/max bounds probe and the eager materialization of the final
# per-bucket count relation (O(types × hours)); edges land as parquet
# via foreachBatch, never collected.
# --------------------------------------------------------------------------
_B19_STREAM_PARITY_ORACLE = """
    WITH seq AS (
      SELECT event_type,
        date_diff('hour', TIMESTAMP '1970-01-01 00:00:00',
                  date_trunc('hour', ts)) AS hr,
        user_id,
        LAG(user_id) OVER (
          PARTITION BY event_type,
            date_diff('hour', TIMESTAMP '1970-01-01 00:00:00',
                      date_trunc('hour', ts))
          ORDER BY ts, event_id) AS prev
      FROM events
    ),
    b AS (
      SELECT event_type, hr, COUNT(*)::BIGINT AS n
      FROM seq WHERE prev IS NOT NULL AND prev <> user_id
      GROUP BY 1, 2
    )
    SELECT event_type, CAST(hr AS BIGINT) AS hr,
      n AS n_stream, n AS n_batch, n AS n_match
    FROM b
"""


@register(
    "b19_handoff_stream_parity",
    oracle=_B19_STREAM_PARITY_ORACLE,
    tags=("B19", "B29", "B26"),
)
def b19_handoff_stream_parity(spark, sf_dir):
    import glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window

    from ..streaming.graph import handoff_edge_stream

    ev = t(spark, sf_dir, "events").select(
        "ts", "event_id", "user_id", "event_type"
    )
    bounds = ev.agg(
        F.min(F.unix_timestamp("ts")).alias("lo"),
        F.max(F.unix_timestamp("ts")).alias("hi"),
    ).collect()[0]
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    span = max(1, (hi - lo + 1 + 2) // 3)
    slice_col = F.least(
        F.lit(2), F.floor((F.unix_timestamp("ts") - lo) / span)
    ).cast("int")

    tmp = tempfile.mkdtemp(prefix="handoff_parity_")
    try:
        src_dir = os.path.join(tmp, "in")
        os.makedirs(src_dir)
        sliced = ev.withColumn("sl", slice_col)
        for i in range(3):
            stage = os.path.join(tmp, f"stage{i}")
            sliced.filter(F.col("sl") == i).drop("sl").coalesce(
                1
            ).write.parquet(stage)
            parts = glob.glob(os.path.join(stage, "part-*.parquet"))
            if parts:
                dst = os.path.join(src_dir, f"{i:04d}.parquet")
                shutil.copy(parts[0], dst)
                # monotone mtimes: the file source lists by
                # (modification time, path) — pin both orderings
                os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
        out_dir = os.path.join(tmp, "edges")
        ckpt = os.path.join(tmp, "ckpt")
        stream = (
            spark.readStream.schema(
                "ts timestamp, event_id bigint, user_id bigint, "
                "event_type string"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        q = (
            handoff_edge_stream(stream)
            .writeStream.outputMode("append")
            .foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out_dir)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        streamed = spark.read.parquet(out_dir).select(
            "event_type", "hr", "src", "dst", "ts", "event_id"
        )
        w = Window.partitionBy("event_type", "hr").orderBy(
            "ts", "event_id"
        )
        batch = (
            ev.withColumn(
                "hr",
                F.floor(
                    F.unix_timestamp(F.date_trunc("hour", F.col("ts")))
                    / 3600
                ).cast("bigint"),
            )
            .select(
                "event_type",
                "hr",
                "ts",
                "event_id",
                F.lag("user_id").over(w).alias("src"),
                F.col("user_id").alias("dst"),
            )
            .filter(
                F.col("src").isNotNull() & (F.col("src") != F.col("dst"))
            )
        )
        keys = ["event_type", "hr", "src", "dst", "ts", "event_id"]
        j = streamed.withColumn("in_s", F.lit(1)).join(
            batch.withColumn("in_b", F.lit(1)), keys, "full"
        )
        rel = (
            j.groupBy("event_type", "hr")
            .agg(
                F.sum(F.coalesce("in_s", F.lit(0)))
                .cast("bigint").alias("n_stream"),
                F.sum(F.coalesce("in_b", F.lit(0)))
                .cast("bigint").alias("n_batch"),
                F.sum(
                    F.coalesce("in_s", F.lit(0))
                    * F.coalesce("in_b", F.lit(0))
                )
                .cast("bigint").alias("n_match"),
            )
            # eager: the relation must survive the temp-dir cleanup
            .localCheckpoint()
        )
        return rel
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
