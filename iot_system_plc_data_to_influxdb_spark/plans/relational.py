"""Batch relational surface — SURVEY.md §2 Part B rows B1–B17.

Every query here is pure DataFrame API (JVM-side, whole-stage codegen;
zero Python UDFs) with an ANSI-SQL oracle twin for DuckDB.

Determinism: measures go through DECIMAL casts (order-independent exact
sums); emitted doubles are rounded one digit past their exact decimal
precision; every ranking carries a unique tie-break.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import events_between, t
from ._exact import round_ratio
from .registry import register


# --------------------------------------------------------------------------
# B1 — parquet scan + projection + filter (pushdown)
# --------------------------------------------------------------------------
@register(
    "b1_scan_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
    tags=("B1",),
)
def b1(spark, sf_dir):
    # Filter + projection land in the parquet scan (PushedFilters /
    # ReadSchema) — verified in tests/test_plans_physical.py.
    return (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
    )


# --------------------------------------------------------------------------
# B2 — time-range filter (InfluxQL `WHERE time > …` core)
# --------------------------------------------------------------------------
@register(
    "b2_time_range",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-12'
    """,
    tags=("B2",),
)
def b2(spark, sf_dir):
    # Bounds applied on the raw int64 nanos ts (catalog.events_between)
    # → parquet PushedFilters + row-group pruning; the whole point of a
    # time-range operator at 100 TB.
    return events_between(spark, sf_dir, "2024-01-10", "2024-01-12").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


# --------------------------------------------------------------------------
# B4 — hash aggregate (TPC-H Q1 shape; partial+final agg from Catalyst)
# --------------------------------------------------------------------------
@register(
    "b4_hash_aggregate",
    oracle="""
    SELECT
      l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(3,2)))
               * (1 + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
      ((2 * SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) * 100 + COUNT(*))
       // (2 * COUNT(*))) / 10000.0 AS avg_qty,
      ((2 * SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) * 100 + COUNT(*))
       // (2 * COUNT(*))) / 10000.0 AS avg_disc,
      COUNT(*) AS count_order,
      COUNT(DISTINCT l_partkey) AS distinct_parts
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("B4",),
)
def b4(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    qty = F.col("l_quantity").cast("decimal(12,2)")
    ep = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(3,2)")
    tax = F.col("l_tax").cast("decimal(3,2)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(ep).cast("double").alias("sum_base_price"),
        F.sum(ep * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
        F.sum(ep * (F.lit(1) - disc) * (F.lit(1) + tax)).cast("double").alias("sum_charge"),
        round_ratio(
            F.sum(F.round(F.col("l_quantity") * 100).cast("bigint")),
            100 * F.count("*"),
            4,
        ).alias("avg_qty"),
        round_ratio(
            F.sum(F.round(F.col("l_discount") * 100).cast("bigint")),
            100 * F.count("*"),
            4,
        ).alias("avg_disc"),
        F.count("*").alias("count_order"),
        F.countDistinct("l_partkey").alias("distinct_parts"),
    )


# --------------------------------------------------------------------------
# B5 — distinct counting: exact (oracle-checked) + approx (rows-only)
# --------------------------------------------------------------------------
@register(
    "b5_distinct_exact",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
    FROM events GROUP BY event_type
    """,
    tags=("B5",),
)
def b5_exact(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )


@register("b5_approx_distinct", oracle=None, tags=("B5",))
def b5_approx(spark, sf_dir):
    # HyperLogLog++ sketch — the 100 TB path where exact COUNT(DISTINCT)
    # would shuffle every key. rsd 1% ≈ few KB of sketch per group.
    # Rows-only: Spark's HLL++ register layout is engine-internal, so
    # no second engine reproduces the estimate — the deterministic
    # sketch below (b5_hll_deterministic) is the hash-checkable HLL.
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"))
    )


# Register construction + estimate live ONCE in functions/hll.py —
# shared with the streaming CQ leg (streaming/rollup.
# hll_register_stream), the same drift-proofing functions/qsketch.py
# got in round 9: one expression tree, batch and stream cannot
# diverge.
from ..functions.hll import hll_bucket_rho as _hll_bucket_rho  # noqa: E402
from ..functions.hll import hll_estimate as _hll_estimate  # noqa: E402


# --------------------------------------------------------------------------
# B5b — deterministic HyperLogLog, hash-checked: the sketch itself is
# pinned to public md5, so BOTH engines build bit-identical registers
# and the harmonic-mean estimate is an exact-integer computation that
# hashes equal. Register j of 256 = first byte of md5(key); rank =
# leading-zero count of the next 52 bits + 1 (all-zero → 53, the
# "ran off the hash" register value). The per-register MAX is the HLL
# merge operator — at 100 TB each executor folds its partition into
# 256 registers map-side (partial_max), the shuffle moves ≤256 rows
# per task, and sketches from different days/tables merge with the
# same MAX. The estimate avoids float summation entirely:
# sum_j 2^-rho_j is accumulated as SUM(1L << (53 - rho)) — exact
# int64 (≤ 2^61) — so the only double op is one final division of
# identical exact integers: bit-equal across engines, no rounding
# tie risk (registry determinism rules). Raw estimate only — the
# small-range linear-counting branch needs ln(), whose last-ulp
# behavior is libm-specific; at the tested cardinalities (≥1473 >
# 2.5·m = 640) InfluxDB-style correction never engages (documented).
# --------------------------------------------------------------------------
@register(
    "b5_hll_deterministic",
    oracle="""
    WITH h AS (
      SELECT md5(CAST(l_orderkey AS VARCHAR)) AS hx FROM lineitem
    ),
    p1 AS (
      SELECT
        (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) AS bucket,
        length(regexp_extract(substr(hx, 3, 13), '^(0*)', 1)) AS z,
        substr(hx, 3, 13) AS rest
      FROM h
    ),
    p2 AS (SELECT bucket, z, substr(rest, z + 1, 1) AS c FROM p1),
    rho AS (
      SELECT bucket,
        CASE WHEN z = 13 THEN 53
             ELSE 4 * z + (CASE WHEN c = '1' THEN 3
                                WHEN c IN ('2', '3') THEN 2
                                WHEN c IN ('4', '5', '6', '7') THEN 1
                                ELSE 0 END) + 1
        END AS rho
      FROM p2
    ),
    regs AS (SELECT bucket, MAX(rho) AS r FROM rho GROUP BY bucket),
    tot AS (
      SELECT CAST(SUM(1::BIGINT << (53 - r)) AS BIGINT)
           + (256 - CAST(COUNT(*) AS BIGINT)) * 9007199254740992 AS total
      FROM regs
    )
    SELECT 256 AS m,
      0.7213 / (1 + 1.079 / 256) * 65536 * 9007199254740992
        / CAST(total AS DOUBLE) AS n_est
    FROM tot
    """,
    tags=("B5",),
)
def b5_hll_deterministic(spark, sf_dir):
    regs = (
        _hll_bucket_rho(t(spark, sf_dir, "lineitem"), "l_orderkey")
        .groupBy("bucket")
        .agg(F.max("rho").alias("r"))
    )
    return _hll_estimate(regs)


# --------------------------------------------------------------------------
# B5d — windowed HLL register rollup + range merge: the mergeable-
# sketch claim as a CHECKED query, not prose. Per-DAY register tables
# (what a CQ would materialize: 256 small rows per day, distinct-count
# state that never stores keys) are merged over a 10-day range with
# the register MAX — the HLL merge operator — and the merged estimate
# is the range's distinct count. tests/test_operators.py additionally
# asserts the merged estimate EQUALS the direct one-pass sketch over
# the same range (merge loses nothing — the property that lets 100 TB
# deployments answer distinct-over-any-range from per-partition
# sketches without touching raw data twice).
# --------------------------------------------------------------------------
@register(
    "b5_hll_windowed_merge",
    oracle="""
    WITH h AS (
      SELECT CAST(ts AS DATE) AS day,
             md5(CAST(event_id AS VARCHAR)) AS hx
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-15'
    ),
    p1 AS (
      SELECT day,
        (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) AS bucket,
        length(regexp_extract(substr(hx, 3, 13), '^(0*)', 1)) AS z,
        substr(hx, 3, 13) AS rest
      FROM h
    ),
    p2 AS (SELECT day, bucket, z, substr(rest, z + 1, 1) AS c FROM p1),
    rho AS (
      SELECT day, bucket,
        CASE WHEN z = 13 THEN 53
             ELSE 4 * z + (CASE WHEN c = '1' THEN 3
                                WHEN c IN ('2', '3') THEN 2
                                WHEN c IN ('4', '5', '6', '7') THEN 1
                                ELSE 0 END) + 1
        END AS rho
      FROM p2
    ),
    daily AS (SELECT day, bucket, MAX(rho) AS r FROM rho GROUP BY day, bucket),
    regs AS (SELECT bucket, MAX(r) AS r FROM daily GROUP BY bucket),
    tot AS (
      SELECT CAST(SUM(1::BIGINT << (53 - r)) AS BIGINT)
           + (256 - CAST(COUNT(*) AS BIGINT)) * 9007199254740992 AS total
      FROM regs
    )
    SELECT 256 AS m,
      0.7213 / (1 + 1.079 / 256) * 65536 * 9007199254740992
        / CAST(total AS DOUBLE) AS n_est
    FROM tot
    """,
    tags=("B5", "B26"),
)
def b5_hll_windowed_merge(spark, sf_dir):
    ev = events_between(spark, sf_dir, "2024-01-05", "2024-01-15").select(
        F.to_date("ts").alias("day"), "event_id"
    )
    daily = (
        _hll_bucket_rho(ev, "event_id", "day")
        .groupBy("day", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    merged = daily.groupBy("bucket").agg(F.max("r").alias("r"))
    return _hll_estimate(merged)


# The d=4 x 256 bucket mapping lives ONCE in functions/cms.py —
# shared with the streaming CQ leg (streaming/rollup.cms_cell_stream),
# same drift-proofing as functions/hll.py and functions/qsketch.py
# (tests reimplement it independently as the checking oracle).
from ..functions.cms import cms_buckets_col as _cms_buckets_col  # noqa: E402


# --------------------------------------------------------------------------
# B5c — Count-Min heavy hitters, the frequency-sketch sibling of the
# deterministic HLL above and equally hash-checked: d=4 hash rows ×
# w=256 buckets, bucket_i(x) = first byte of md5(i|x). Cell counts are
# exact integer sums and the point estimate is MIN over the 4 cells —
# no floats anywhere, so both engines produce identical estimates (the
# CMS overestimate guarantee est ≥ exact is asserted in pytest). At
# 100 TB: the sketch is 1,024 cells built with map-side partial
# counts (shuffle bounded by 1,024 × tasks, like the HLL registers);
# cell-wise SUM is the merge operator across days/partitions; the
# top-k read is a TakeOrderedAndProject over per-key minima, never a
# global sort.
# --------------------------------------------------------------------------
@register(
    "b5_cms_heavy_hitters",
    oracle="""
    WITH k AS (SELECT CAST(user_id AS VARCHAR) AS u FROM events),
    pairs AS (
      SELECT u, i,
        (strpos('0123456789abcdef',
                substr(md5(CAST(i AS VARCHAR) || '|' || u), 1, 1)) - 1) * 16
        + (strpos('0123456789abcdef',
                  substr(md5(CAST(i AS VARCHAR) || '|' || u), 2, 1)) - 1) AS b
      FROM k CROSS JOIN (VALUES (0), (1), (2), (3)) t(i)
    ),
    cells AS (
      SELECT i, b, CAST(COUNT(*) AS BIGINT) AS c FROM pairs GROUP BY i, b
    ),
    cand AS (SELECT DISTINCT u, i, b FROM pairs),
    est AS (
      SELECT u, CAST(MIN(c) AS BIGINT) AS est
      FROM cand JOIN cells USING (i, b) GROUP BY u
    ),
    exact AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS exact_n FROM k GROUP BY u)
    SELECT u AS user_id, est, exact_n
    FROM est JOIN exact USING (u)
    ORDER BY est DESC, u LIMIT 10
    """,
    tags=("B5", "B13"),
)
def b5_cms_heavy_hitters(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("u")
    )
    pairs = ev.select("u", _cms_buckets_col().alias("e")).select(
        "u", "e.i", "e.b"
    )
    cells = pairs.groupBy("i", "b").agg(F.count("*").alias("c"))
    # two table scans total (cells + exact), like any sketch-vs-truth
    # comparison: the exact per-key counts double as the candidate-key
    # list (no pairs.distinct() — that formulation measured 154 KB of
    # avoidable shuffle), candidates re-derive their 4 buckets map-side
    # and look them up in ONE broadcast join against the ≤1,024-row
    # sketch; the MIN re-group moves 4 rows per candidate key. (A
    # 4-chained-broadcast variant was measured SLOWER and would scan
    # the table 5× at scale — each broadcast materializes its subtree.)
    exact = ev.groupBy("u").agg(F.count("*").alias("exact_n"))
    cand = exact.select(
        "u", "exact_n", _cms_buckets_col().alias("e")
    ).select("u", "exact_n", "e.i", "e.b")
    est = (
        cand.join(F.broadcast(cells), ["i", "b"])
        .groupBy("u", "exact_n")
        .agg(F.min("c").alias("est"))
    )
    return (
        est.select(F.col("u").alias("user_id"), "est", "exact_n")
        .orderBy(F.col("est").desc(), "user_id")
        .limit(10)
    )


# --------------------------------------------------------------------------
# B5e — windowed CMS cell rollup + range merge, the frequency-sketch
# twin of b5_hll_windowed_merge: per-DAY cell tables (what a CQ
# materializes — ≤1,024 exact-integer rows per day, frequency state
# that never stores keys) are merged over a 10-day range with cell
# SUM — the CMS merge operator — and the merged sketch answers the
# range's heavy hitters. pytest asserts the merged estimates EQUAL
# the direct one-pass sketch over the same rows (SUM is lossless).
# --------------------------------------------------------------------------
@register(
    "b5_cms_windowed_merge",
    oracle="""
    WITH k AS (
      SELECT CAST(ts AS DATE) AS day, CAST(user_id AS VARCHAR) AS u
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-15'
    ),
    pairs AS (
      SELECT day, u, i,
        (strpos('0123456789abcdef',
                substr(md5(CAST(i AS VARCHAR) || '|' || u), 1, 1)) - 1) * 16
        + (strpos('0123456789abcdef',
                  substr(md5(CAST(i AS VARCHAR) || '|' || u), 2, 1)) - 1) AS b
      FROM k CROSS JOIN (VALUES (0), (1), (2), (3)) t(i)
    ),
    daily AS (
      SELECT day, i, b, CAST(COUNT(*) AS BIGINT) AS c
      FROM pairs GROUP BY day, i, b
    ),
    cells AS (SELECT i, b, CAST(SUM(c) AS BIGINT) AS c FROM daily GROUP BY i, b),
    cand AS (SELECT DISTINCT u, i, b FROM pairs),
    exact AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS exact_n FROM k GROUP BY u),
    est AS (
      SELECT u, CAST(MIN(c) AS BIGINT) AS est
      FROM cand JOIN cells USING (i, b) GROUP BY u
    )
    SELECT u AS user_id, est, exact_n
    FROM est JOIN exact USING (u)
    ORDER BY est DESC, u LIMIT 10
    """,
    tags=("B5", "B26", "B13"),
)
def b5_cms_windowed_merge(spark, sf_dir):
    ev = events_between(spark, sf_dir, "2024-01-05", "2024-01-15").select(
        F.to_date("ts").alias("day"),
        F.col("user_id").cast("string").alias("u"),
    )
    pairs = ev.select("day", _cms_buckets_col().alias("e")).select(
        "day", "e.i", "e.b"
    )
    daily = pairs.groupBy("day", "i", "b").agg(F.count("*").alias("c"))
    cells = daily.groupBy("i", "b").agg(F.sum("c").alias("c"))
    exact = ev.groupBy("u").agg(F.count("*").alias("exact_n"))
    cand = exact.select(
        "u", "exact_n", _cms_buckets_col().alias("e")
    ).select("u", "exact_n", "e.i", "e.b")
    est = (
        cand.join(F.broadcast(cells), ["i", "b"])
        .groupBy("u", "exact_n")
        .agg(F.min("c").alias("est"))
    )
    return (
        est.select(F.col("u").alias("user_id"), "est", "exact_n")
        .orderBy(F.col("est").desc(), "user_id")
        .limit(10)
    )


# --------------------------------------------------------------------------
# B5f — deterministic BLOOM FILTER, completing the mergeable-sketch
# trio (HLL = MAX-merge, CMS = SUM-merge, Bloom = OR-merge). m = 4096
# bits as 128 x 32-bit words in BIGINTs (bit 31 max — no signed-shift
# edge in either engine), k = 3 positions from non-overlapping 3-hex-
# char slices of md5(key) — the same engine-pinned hashing recipe as
# the HLL/CMS, so DuckDB rebuilds the identical sketch bit-for-bit.
# The query is the classic 100 TB USE of a Bloom filter: build over
# the fact side's key set (512-byte aggregate — the bit_or partial
# combines map-side), broadcast it, and pre-screen a probe table
# before any join; the exact semi-join runs alongside so the output
# exhibits the contract (bloom_hit >= has_orders: no false negatives,
# measured-FP false positives). tests/test_operators.py bounds the FP
# rate and proves OR-merge losslessness.
# --------------------------------------------------------------------------
_BLOOM_M, _BLOOM_WORD, _BLOOM_K = 4096, 32, 3


def _bloom_pos_sql(col: str, j: int) -> str:
    """DuckDB: position j = int of md5 hex chars [1+3j, 3+3j] (12 bits
    < m = 4096)."""
    nib = (
        "(strpos('0123456789abcdef', "
        f"substr(md5(CAST({col} AS VARCHAR)), {{c}}, 1)) - 1)"
    )
    return (
        f"({nib.format(c=1 + 3 * j)} * 256 "
        f"+ {nib.format(c=2 + 3 * j)} * 16 "
        f"+ {nib.format(c=3 + 3 * j)})"
    )


def _bloom_pos_col(col) -> "F.Column":
    """Spark: the k positions as an array column (same md5 slices)."""
    hx = F.md5(F.col(col).cast("string"))
    return F.array(
        *[
            F.conv(F.substring(hx, 1 + 3 * j, 3), 16, 10).cast("int")
            for j in range(_BLOOM_K)
        ]
    )


_B5_BLOOM_ORACLE = (
    """
    WITH pos AS (
    """
    + " UNION ALL ".join(
        f"SELECT {_bloom_pos_sql('o_custkey', j)} AS pos FROM orders"
        for j in range(_BLOOM_K)
    )
    + """
    ),
    words AS (
      SELECT pos // 32 AS word,
             bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS w
      FROM pos GROUP BY 1
    ),
    cpos AS (
    """
    + " UNION ALL ".join(
        f"SELECT c_custkey, {_bloom_pos_sql('c_custkey', j)} AS pos "
        "FROM customer"
        for j in range(_BLOOM_K)
    )
    + """
    ),
    probe AS (
      SELECT c_custkey,
        MIN(CASE WHEN (w >> CAST(pos % 32 AS INT)) & 1 = 1
                 THEN 1 ELSE 0 END) AS bloom_hit
      FROM cpos LEFT JOIN words ON words.word = cpos.pos // 32
      GROUP BY c_custkey
    )
    SELECT p.c_custkey,
      CAST(p.bloom_hit AS INT) AS bloom_hit,
      CAST(CASE WHEN o.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS INT)
        AS has_orders
    FROM probe p
    LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
      ON o.o_custkey = p.c_custkey
    """
)


@register("b5_bloom_membership", oracle=_B5_BLOOM_ORACLE, tags=("B5",))
def b5_bloom_membership(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    build = (
        orders.select(F.explode(_bloom_pos_col("o_custkey")).alias("pos"))
        .select(
            (F.col("pos") / _BLOOM_WORD).cast("int").alias("word"),
            F.expr(f"shiftleft(1L, pos % {_BLOOM_WORD})").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("w"))
    )
    # Probe stays MAP-ONLY: no explode + re-group on the probe key
    # (that would shuffle the big table by its own key just to AND the
    # bits back together). Instead, one broadcast join per hash
    # function against the 128-row word table — k tiny hash joins, the
    # probe never moves.
    probe = cust.select(
        "c_custkey", _bloom_pos_col("c_custkey").alias("ps")
    )
    hits = []
    for j in range(_BLOOM_K):
        bj = F.broadcast(
            build.select(
                F.col("word").alias(f"word{j}"), F.col("w").alias(f"w{j}")
            )
        )
        probe = probe.join(
            bj,
            (F.col("ps")[j] / _BLOOM_WORD).cast("int") == F.col(f"word{j}"),
            "left",
        )
        hits.append(
            F.when(
                F.expr(
                    f"shiftright(w{j}, ps[{j}] % {_BLOOM_WORD}) & 1"
                )
                == 1,
                1,
            ).otherwise(0)
        )
    probe = probe.select(
        "c_custkey", F.least(*hits).alias("bloom_hit")
    )
    seen = orders.select("o_custkey").distinct()
    return probe.join(
        seen, probe.c_custkey == seen.o_custkey, "left"
    ).select(
        "c_custkey",
        F.col("bloom_hit").cast("int").alias("bloom_hit"),
        F.when(F.col("o_custkey").isNotNull(), 1)
        .otherwise(0)
        .cast("int")
        .alias("has_orders"),
    )


# --------------------------------------------------------------------------
# B6 — rollup / cube / grouping sets
# --------------------------------------------------------------------------
@register(
    "b6_rollup",
    oracle="""
    SELECT n_name, o_orderpriority,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP(n_name, o_orderpriority)
    """,
    tags=("B6",),
)
def b6(spark, sf_dir):
    joined = (
        t(spark, sf_dir, "orders")
        .join(
            F.broadcast(t(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    return joined.rollup("n_name", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double").alias("total_price"),
    )


@register(
    "b6_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
      COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    tags=("B6",),
)
def b6_gsets(spark, sf_dir):
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("b6_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
          COUNT(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM b6_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "b6_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
      COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    tags=("B6",),
)
def b6_cube(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
        )
    )


# --------------------------------------------------------------------------
# B7 — star-schema broadcast join (customer ⋈ nation ⋈ region)
# --------------------------------------------------------------------------
@register(
    "b7_broadcast_star_join",
    oracle="""
    SELECT r_name, n_name,
      COUNT(*) AS n_customers,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    tags=("B7",),
)
def b7(spark, sf_dir):
    # Dims are broadcast — no shuffle on the fact side; at 100 TB this is
    # the only sane plan for a star join (nation/region are KBs).
    return (
        t(spark, sf_dir, "customer")
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double").alias("total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# B8 — fact ⋈ fact shuffle join (orders ⋈ lineitem)
# --------------------------------------------------------------------------
@register(
    "b8_shuffle_join",
    oracle="""
    SELECT o_orderkey, o_orderdate,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_orderdate
    """,
    tags=("B8",),
)
def b8(spark, sf_dir):
    # Both sides large → sort-merge/shuffle-hash on the join key; the
    # groupBy reuses the same hash partitioning (one shuffle, not two).
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(3,2)")
    )
    return (
        t(spark, sf_dir, "orders")
        .join(t(spark, sf_dir, "lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def _bucketed_table(spark, sf_dir: str, base: str, key, n_buckets: int = 8):
    """Materialize (once per sf_dir) a bucketed+sorted copy of a fact
    table — the write-time co-partitioning SCALE.md names as the 100 TB
    elimination of the b8 shuffle. Idempotent: reuses the warehouse
    table when it already exists in this catalog."""
    import os
    import re
    import shutil
    from urllib.parse import urlparse

    keys = [key] if isinstance(key, str) else list(key)
    tag = re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.strip("/").split("sf")[-1])
    name = f"{base}_bkt_{tag}"
    if not spark.catalog.tableExists(name):
        # the in-memory catalog forgets tables between sessions but the
        # warehouse directory survives — clear an orphaned location so
        # saveAsTable can (re)create the table with bucketing metadata
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        loc = os.path.join(wh, name.lower())
        if wh and os.path.exists(loc):
            shutil.rmtree(loc)
        (
            t(spark, sf_dir, base)
            .write.mode("overwrite")
            .bucketBy(n_buckets, keys[0], *keys[1:])
            .sortBy(keys[0], *keys[1:])
            .saveAsTable(name)
        )
    return spark.table(name)


@register(
    "b8_points_bucketed",
    oracle="""
    WITH stats AS (
      SELECT user_id, event_type, MAX(value) AS peak,
        COUNT(*) AS n_readings
      FROM events GROUP BY user_id, event_type
    )
    SELECT e.user_id AS plc_ip, e.event_type AS alias, e.ts,
      e.value, s.n_readings
    FROM events e JOIN stats s
      ON s.user_id = e.user_id AND s.event_type = e.event_type
    WHERE e.value >= s.peak
    """,
    tags=("B8", "A11"),
)
def b8_points_bucketed(spark, sf_dir):
    """The acquisition→query loop over the bucketed points layout:
    the points table (events standing in as the long/narrow signal
    table, (user_id, event_type) ≡ (plc_ip, alias)) is stored
    bucketed+sorted on the signal key — the layout
    streaming.sinks.start_bucketed_signal_table materializes straight
    off the stream. Per-signal stats are aggregated WITHOUT an
    exchange (the groupBy reuses the bucket partitioning) and joined
    back point-to-stats with zero shuffle on either side (merge hint,
    bucketed-bucketed). Each signal's peak readings come out; the only
    float op is an equality comparison, so the oracle is exact.
    Plan-guarded exchange-free in tests/test_plans_physical.py."""
    pts = _bucketed_table(
        spark, sf_dir, "events", ["user_id", "event_type"]
    ).select("user_id", "event_type", "ts", "value")
    stats = pts.groupBy("user_id", "event_type").agg(
        F.max("value").alias("peak"),
        F.count("*").alias("n_readings"),
    )
    return (
        pts.hint("merge")
        .join(stats, ["user_id", "event_type"])
        # >= not ==: against a MAX they select the same rows, but an
        # equality would be promoted by Catalyst into a THIRD equi-join
        # key, and a 3-key join can't reuse the 2-key bucketing —
        # exchanges reappear on both sides. The inequality stays a
        # post-join predicate.
        .filter(F.col("value") >= F.col("peak"))
        .select(
            F.col("user_id").alias("plc_ip"),
            F.col("event_type").alias("alias"),
            "ts",
            "value",
            "n_readings",
        )
    )


@register(
    "b8_bucketed",
    oracle="""
    SELECT o_orderkey, o_orderdate,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_orderdate
    """,
    tags=("B8",),
)
def b8_bucketed(spark, sf_dir):
    """b8_shuffle_join over write-time-bucketed fact tables: both sides
    bucketed+sorted on the join key, so the sort-merge join (forced via
    a plan-local merge hint, no session conf) and the downstream
    aggregate reuse the storage partitioning — ZERO Exchange in the
    plan (guarded in tests/test_plans_physical.py). This is the shape
    the nightly 100 TB pipeline uses: pay the partitioning once at
    write time, never at query time."""
    o = _bucketed_table(spark, sf_dir, "orders", "o_orderkey")
    li = _bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(3,2)")
    )
    return (
        o.hint("merge")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# B9 — outer / semi / anti joins
# --------------------------------------------------------------------------
@register(
    "b9_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '2000-01-01'
    )
    """,
    tags=("B9", "A22"),
)
def b9_anti(spark, sf_dir):
    """Churned customers: no order since 2000-01-01. The date predicate
    keeps the canonical result non-empty at sf0.01 (the unfiltered
    anti-join is vacuously empty there — every customer has an order),
    and it pushes down to the orders scan so the anti-join's build side
    shrinks before the shuffle."""
    recent = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        t(spark, sf_dir, "customer")
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "b9_semi_join",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    """,
    tags=("B9",),
)
def b9_semi(spark, sf_dir):
    urgent = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        t(spark, sf_dir, "customer")
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
    )


@register(
    "b9_outer_join",
    oracle="""
    SELECT c_custkey,
      COUNT(o_orderkey) AS n_orders,
      CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 0) AS DOUBLE) AS total_spent
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
    tags=("B9",),
)
def b9_outer(spark, sf_dir):
    return (
        t(spark, sf_dir, "customer")
        .join(t(spark, sf_dir, "orders"), F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(F.col("o_totalprice").cast("decimal(14,2)")), F.lit(0))
            .cast("double")
            .alias("total_spent"),
        )
    )


# --------------------------------------------------------------------------
# B10 — range / interval theta join (point-in-interval)
# --------------------------------------------------------------------------
_WINDOWS = [
    ("w_jan_wk1", "2024-01-01 00:00:00", "2024-01-08 00:00:00"),
    ("w_jan_wk2", "2024-01-08 00:00:00", "2024-01-15 00:00:00"),
    ("w_mid_48h", "2024-01-14 12:00:00", "2024-01-16 12:00:00"),
    ("w_jan_d20", "2024-01-20 00:00:00", "2024-01-21 00:00:00"),
    ("w_jan_gap", "2024-01-22 06:30:00", "2024-01-23 18:45:00"),
    ("w_last_wk", "2024-01-24 00:00:00", "2024-01-31 00:00:00"),
]

_B10_VALUES = ", ".join(
    f"('{n}', TIMESTAMP '{s}', TIMESTAMP '{e}')" for n, s, e in _WINDOWS
)


@register(
    "b10_range_join",
    oracle=f"""
    WITH win(win_name, win_start, win_end) AS (VALUES {_B10_VALUES})
    SELECT win_name, COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM win JOIN events ON ts >= win_start AND ts < win_end
    GROUP BY win_name
    """,
    tags=("B10",),
)
def b10(spark, sf_dir):
    # Tiny interval dim broadcast against the big fact → the non-equi
    # predicate evaluates inside a BroadcastNestedLoopJoin, which is the
    # scalable plan (no shuffle of the fact table). The fact scan is
    # additionally pre-filtered to the dim's bounding range
    # [min(start), max(end)) — those bounds reach the parquet reader as
    # PushedFilters (events_between), so at 100 TB sparse windows read
    # only their row groups instead of the whole history before the NL
    # predicate runs.
    win = spark.createDataFrame(
        [(n, s, e) for n, s, e in _WINDOWS],
        "win_name string, win_start string, win_end string",
    ).select(
        "win_name",
        F.col("win_start").cast("timestamp").alias("win_start"),
        F.col("win_end").cast("timestamp").alias("win_end"),
    )
    lo = min(s for _, s, _ in _WINDOWS)
    hi = max(e for _, _, e in _WINDOWS)
    ev = events_between(spark, sf_dir, lo, hi)
    return (
        ev.join(
            F.broadcast(win),
            (F.col("ts") >= F.col("win_start")) & (F.col("ts") < F.col("win_end")),
        )
        .groupBy("win_name")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
    )


@register(
    "b10_range_join_pruned",
    oracle=f"""
    WITH win(win_name, win_start, win_end) AS (VALUES {_B10_VALUES})
    SELECT win_name, COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM win JOIN events ON ts >= win_start AND ts < win_end
    GROUP BY win_name
    """,
    tags=("B10",),
)
def b10_pruned(spark, sf_dir):
    """Interval-join compilation for a SMALL, STATIC interval dim: emit
    one pushed range scan per window and union them — no join operator
    at all. Each branch's ts bounds reach the parquet reader
    (events_between), so windows covering 0.1% of the history read
    0.1% of the row groups; overlapping windows double-count exactly
    like the join (an event in k windows appears in k branches). This
    is the plan to pick when the dim fits in the driver (dozens of
    alert/maintenance/audit windows); b10_range_join stays the general
    shape for dims too large to unroll."""
    parts = []
    for name, s, e in _WINDOWS:
        parts.append(
            events_between(spark, sf_dir, s, e).select(
                F.lit(name).alias("win_name"), "value"
            )
        )
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionAll(p)
    return unioned.groupBy("win_name").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
    )


# --------------------------------------------------------------------------
# B13 — sort / limit / top-K per group
# --------------------------------------------------------------------------
@register(
    "b13_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        ROW_NUMBER() OVER (
          PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        ) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    tags=("B13",),
)
def b13(spark, sf_dir):
    from pyspark.sql import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    )
    return (
        t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@register(
    "b13_global_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    tags=("B13",),
)
def b13_global(spark, sf_dir):
    # orderBy+limit compiles to TakeOrderedAndProject — per-partition
    # top-100 then a tiny driver-side merge; no full sort at scale.
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# B14 — set operations
# --------------------------------------------------------------------------
@register(
    "b14_set_ops",
    oracle="""
    WITH economy AS (SELECT DISTINCT p_brand FROM part WHERE p_type = 'ECONOMY'),
         big AS (SELECT DISTINCT p_brand FROM part WHERE p_size > 25)
    SELECT 'both' AS which, p_brand FROM (SELECT p_brand FROM economy INTERSECT SELECT p_brand FROM big)
    UNION ALL
    SELECT 'only_economy' AS which, p_brand FROM (SELECT p_brand FROM economy EXCEPT SELECT p_brand FROM big)
    """,
    tags=("B14",),
)
def b14(spark, sf_dir):
    part = t(spark, sf_dir, "part")
    economy = part.filter(F.col("p_type") == "ECONOMY").select("p_brand").distinct()
    big = part.filter(F.col("p_size") > 25).select("p_brand").distinct()
    both = economy.intersect(big).select(F.lit("both").alias("which"), "p_brand")
    only = economy.exceptAll(big).select(F.lit("only_economy").alias("which"), "p_brand")
    return both.unionByName(only)


# --------------------------------------------------------------------------
# B16 — scalar function library
# --------------------------------------------------------------------------
@register(
    "b16_string_funcs",
    oracle="""
    SELECT p_partkey,
      UPPER(p_name) AS name_upper,
      SUBSTRING(p_name, 1, 5) AS name_first5,
      LENGTH(p_name) AS name_len,
      CAST(REGEXP_EXTRACT(p_brand, '[0-9]+') AS INT) AS brand_num,
      ARRAY_TO_STRING(STR_SPLIT(p_name, ' '), '|') AS name_words,
      CONCAT(p_brand, ':', p_type) AS brand_type,
      (p_name LIKE 'small%') AS is_small
    FROM part
    """,
    tags=("B16", "A6"),
)
def b16_string(spark, sf_dir):
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_first5"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).cast("int").alias("brand_num"),
        # canonical '|'-joined string, not ARRAY — the driver's oracle
        # canonicalizer hashes scalar cells only (CORRECTNESS_r01)
        F.array_join(F.split("p_name", " "), "|").alias("name_words"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.col("p_name").like("small%").alias("is_small"),
    )


@register(
    "b16_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
      YEAR(o_orderdate) AS y,
      MONTH(o_orderdate) AS m,
      QUARTER(o_orderdate) AS q,
      CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
      DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
      CAST(EPOCH(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders
    """,
    tags=("B16",),
)
def b16_datetime(spark, sf_dir):
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.quarter("o_orderdate").alias("q"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@register(
    "b16_math_conditional_funcs",
    oracle="""
    SELECT p_partkey,
      ROUND(p_retailprice, 1) AS price_r1,
      ABS(p_size - 25) AS size_dist,
      ROUND(LN(p_retailprice), 6) AS ln_price,
      ROUND(SQRT(p_size), 6) AS sqrt_size,
      POW(p_size, 2) AS size_sq,
      p_partkey % 7 AS key_mod,
      CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'mid' ELSE 'large' END AS size_class,
      COALESCE(NULLIF(p_type, 'ECONOMY'), 'STANDARD') AS type_or_std
    FROM part
    """,
    tags=("B16",),
)
def b16_math(spark, sf_dir):
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        F.round("p_retailprice", 1).alias("price_r1"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.round(F.log(F.col("p_retailprice")), 6).alias("ln_price"),
        F.round(F.sqrt(F.col("p_size")), 6).alias("sqrt_size"),
        F.pow(F.col("p_size"), 2).alias("size_sq"),
        (F.col("p_partkey") % 7).alias("key_mod"),
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 30, "mid")
        .otherwise("large")
        .alias("size_class"),
        F.coalesce(F.nullif(F.col("p_type"), F.lit("ECONOMY")), F.lit("STANDARD")).alias(
            "type_or_std"
        ),
    )


# --------------------------------------------------------------------------
# B17 — array / map / JSON functions
# --------------------------------------------------------------------------
@register(
    "b17_json_funcs",
    oracle="""
    SELECT event_id,
      CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS k,
      ARRAY_TO_STRING(CAST(JSON_KEYS(props) AS VARCHAR[]), '|') AS prop_keys
    FROM events
    WHERE event_id < 2000
    """,
    tags=("B17",),
)
def b17_json(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
            # see b16_string_funcs: arrays serialize to canonical strings
            F.array_join(F.json_object_keys("props"), "|").alias("prop_keys"),
        )
    )


@register(
    "b17_array_funcs",
    oracle="""
    SELECT vec_id, pos,
      ROUND(CAST(embedding[pos] AS DOUBLE), 6) AS component,
      LEN(embedding) AS dim
    FROM embeddings, (VALUES (1), (2), (3)) p(pos)
    WHERE vec_id < 100
    """,
    tags=("B17", "B22"),
)
def b17_array(spark, sf_dir):
    return (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 100)
        .select(
            "vec_id",
            F.posexplode(F.slice("embedding", 1, 3)).alias("pos0", "component_raw"),
            F.size("embedding").alias("dim"),
        )
        .select(
            "vec_id",
            (F.col("pos0") + 1).alias("pos"),
            F.round(F.col("component_raw").cast("double"), 6).alias("component"),
            "dim",
        )
    )


# --------------------------------------------------------------------------
# B7/B8 capstone — TPC-H Q5-shaped "local supplier volume": the classic
# mixed-strategy join tree. lineitem⋈orders and lineitem⋈supplier are
# fact-side shuffle joins; customer arrives pre-filtered through
# broadcast nation/region dims; the customer-nation = supplier-nation
# equality closes the star. Exercises the `supplier` table and join
# reordering under AQE. At 100 TB: dims broadcast (KBs), the two fact
# shuffles hash on l_orderkey / l_suppkey, and the final agg is 5 rows.
# --------------------------------------------------------------------------
@register(
    "b8_local_supplier_volume",
    oracle="""
    SELECT n_name,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    tags=("B7", "B8"),
)
def b8_q5(spark, sf_dir):
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(3,2)")
    )
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        t(spark, sf_dir, "customer")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            t(spark, sf_dir, "lineitem"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            t(spark, sf_dir, "supplier"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# B5g — K-Minimum-Values distinct sketch (the third mergeable sketch
# next to HLL and CMS, and the one that also supports set
# INTERSECTION estimates via the inclusion-exclusion of merged kth
# values — why real pipelines carry KMV alongside HLL). State = the
# k = 256 smallest md5 values over DISTINCT keys; estimate =
# (k-1) * 2^48 / kth_value(first 12 hex digits). Merge = union +
# re-top-k, and the merge is LOSSLESS by construction: the global k
# smallest of a union of per-partition k-smallest lists IS the global
# k smallest (tests/test_operators.py pins merged == direct).
# Deterministic end-to-end: md5 hex compares identically as a string
# in both engines, the 48-bit kth value is exact int64, and the
# estimate is ONE division of two identically-rounded doubles.
# Shape at 100 TB: per-partition top-k heads (TakeOrdered — no global
# sort), k·partitions rows to the final merge, independent of input
# rows: the mergeable-sketch scale contract again.
# --------------------------------------------------------------------------
_B5_KMV_ORACLE = """
    WITH h AS (
      SELECT DISTINCT md5(CAST(l_orderkey AS VARCHAR)) AS hx FROM lineitem
    ),
    topk AS (SELECT hx FROM h ORDER BY hx LIMIT 256),
    agg AS (
      SELECT MAX(hx) AS kth, CAST(COUNT(*) AS BIGINT) AS k_used FROM topk
    ),
    u AS (
      SELECT k_used, kth,
        CAST(
          (strpos('0123456789abcdef', substr(kth, 1, 1)) - 1) * 17592186044416
        + (strpos('0123456789abcdef', substr(kth, 2, 1)) - 1) * 1099511627776
        + (strpos('0123456789abcdef', substr(kth, 3, 1)) - 1) * 68719476736
        + (strpos('0123456789abcdef', substr(kth, 4, 1)) - 1) * 4294967296
        + (strpos('0123456789abcdef', substr(kth, 5, 1)) - 1) * 268435456
        + (strpos('0123456789abcdef', substr(kth, 6, 1)) - 1) * 16777216
        + (strpos('0123456789abcdef', substr(kth, 7, 1)) - 1) * 1048576
        + (strpos('0123456789abcdef', substr(kth, 8, 1)) - 1) * 65536
        + (strpos('0123456789abcdef', substr(kth, 9, 1)) - 1) * 4096
        + (strpos('0123456789abcdef', substr(kth, 10, 1)) - 1) * 256
        + (strpos('0123456789abcdef', substr(kth, 11, 1)) - 1) * 16
        + (strpos('0123456789abcdef', substr(kth, 12, 1)) - 1) * 1
        AS BIGINT) AS kth_u
      FROM agg
    )
    SELECT CAST(256 AS BIGINT) AS k, k_used, kth_u,
      CASE WHEN k_used < 256 THEN CAST(k_used AS DOUBLE)
           ELSE CAST(71776119061217280 AS DOUBLE) / CAST(kth_u AS DOUBLE)
      END AS n_est
    FROM u
"""


@register("b5_kmv_distinct", oracle=_B5_KMV_ORACLE, tags=("B5",))
def b5_kmv_distinct(spark, sf_dir):
    h = (
        t(spark, sf_dir, "lineitem")
        .select(F.md5(F.col("l_orderkey").cast("string")).alias("hx"))
        .distinct()
    )
    topk = h.orderBy("hx").limit(256)
    agg = topk.agg(
        F.max("hx").alias("kth"),
        F.count("*").cast("bigint").alias("k_used"),
    )
    u = agg.select(
        "k_used",
        F.conv(F.substring("kth", 1, 12), 16, 10).cast("bigint").alias(
            "kth_u"
        ),
    )
    return u.select(
        F.lit(256).cast("bigint").alias("k"),
        "k_used",
        "kth_u",
        F.when(
            F.col("k_used") < 256, F.col("k_used").cast("double")
        ).otherwise(
            F.lit(71776119061217280).cast("double")
            / F.col("kth_u").cast("double")
        ).alias("n_est"),
    )


# --------------------------------------------------------------------------
# B19f — blocked fuzzy (edit-distance) matching: the entity-resolution
# staple — dirty probe strings matched to a reference table by
# Levenshtein distance, with a BLOCKING key so the candidate set is a
# bucket, never the cross product (the same never-all-pairs rule as
# the LSH dedup family). Probes are built from the reference itself by
# a deterministic last-two-character swap (identical string algebra in
# both engines), blocks share the 4-digit suffix prefix, the match is
# the (distance, key) argmin, and Levenshtein is the standard DP both
# engines implement identically over ASCII — exact integers
# throughout. At 100 TB the block key bounds the join exactly like a
# band key: cost = sum of block_size x probes_in_block, not N x M.
# --------------------------------------------------------------------------
_B19_FUZZY_ORACLE = """
    WITH probes AS (
      SELECT c_custkey AS probe_key,
        substr(c_name, 1, length(c_name) - 2)
          || substr(c_name, length(c_name), 1)
          || substr(c_name, length(c_name) - 1, 1) AS probe_name,
        substr(c_name, 10, 4) AS blk
      FROM customer WHERE c_custkey % 700 = 3
    ),
    cand AS (
      SELECT p.probe_key, p.probe_name,
        c.c_custkey AS match_key, c.c_name AS match_name,
        CAST(levenshtein(p.probe_name, c.c_name) AS BIGINT) AS dist
      FROM probes p JOIN customer c ON substr(c.c_name, 10, 4) = p.blk
      WHERE levenshtein(p.probe_name, c.c_name) <= 3
    ),
    best AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY probe_key ORDER BY dist, match_key) AS rk
      FROM cand
    )
    SELECT probe_key, probe_name, match_key, match_name, dist
    FROM best WHERE rk = 1
"""


@register("b19_fuzzy_match", oracle=_B19_FUZZY_ORACLE, tags=("B19", "B16"))
def b19_fuzzy_match(spark, sf_dir):
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    swapped = F.concat(
        F.expr("substr(c_name, 1, length(c_name) - 2)"),
        F.expr("substr(c_name, length(c_name), 1)"),
        F.expr("substr(c_name, length(c_name) - 1, 1)"),
    )
    probes = cust.filter(F.col("c_custkey") % 700 == 3).select(
        F.col("c_custkey").alias("probe_key"),
        swapped.alias("probe_name"),
        F.substring("c_name", 10, 4).alias("blk"),
    )
    from pyspark.sql import Window

    cand = (
        F.broadcast(probes)
        .join(
            cust.withColumn("blk", F.substring("c_name", 10, 4)), "blk"
        )
        .withColumn(
            "dist",
            F.levenshtein(F.col("probe_name"), F.col("c_name")).cast(
                "bigint"
            ),
        )
        .filter(F.col("dist") <= 3)
    )
    wr = Window.partitionBy("probe_key").orderBy("dist", "c_custkey")
    return (
        cand.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            "probe_key",
            "probe_name",
            F.col("c_custkey").alias("match_key"),
            F.col("c_name").alias("match_name"),
            "dist",
        )
    )


# --------------------------------------------------------------------------
# B5q — mergeable QUANTILE sketch (log2-octave buckets with 4 linear
# sub-buckets — the DDSketch shape with EXACT integer bucketing, so it
# hash-checks): completes the sketch family (HLL distinct, CMS
# frequency, Bloom membership, KMV distinct) with the percentile
# member. Bucket of cents >= 1: e = floor(log2) derived from the
# BINARY-STRING LENGTH (length(bin(x)) - 1 — exact in both engines,
# unlike float log2 at boundaries), sub = the next two bits
# ((x >> (e-2)) & 3), lower bound lb = (4+sub)·2^(e-2) (= sub for
# e < 2). Relative bucket width ≤ 1/(4+sub) ≤ 25% — the standard
# relative-error quantile-sketch guarantee. A quantile is answered by
# the smallest bucket whose cumulative count reaches ceil(q·n): one
# MIN(CASE...) aggregation over the sketch rows, everything int64.
#
# Scale: the sketch is a keyed aggregate bounded by
# series × ~4·log2(max_cents) rows (≤ ~60/series at any corpus size);
# merge = bucket-count SUM, proven lossless by the windowed-merge twin
# below — per-partition sketches answer any-range percentiles without
# touching raw data twice, the same operational story as b5_hll.
# --------------------------------------------------------------------------
_B5_QSKETCH_CTE = """
    c AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE ROUND(value * 100) >= 1 {extra_where}
    ),
    b AS (
      SELECT event_type,
        length(bin(cents)) - 1 AS e,
        (cents >> greatest(length(bin(cents)) - 3, 0)) & 3 AS sub
      FROM c
    ),
    sk AS (
      SELECT event_type, e, sub, COUNT(*) AS cnt FROM b GROUP BY 1, 2, 3
    ),
    cum AS (
      SELECT event_type, e, sub, cnt,
        CASE WHEN e >= 2 THEN (4 + sub) << (e - 2) ELSE sub END AS lb,
        SUM(cnt) OVER (PARTITION BY event_type ORDER BY e, sub) AS cum_n,
        SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM sk
    )
    SELECT event_type,
      CAST(MAX(n) AS BIGINT) AS n,
      CAST(COUNT(*) AS BIGINT) AS n_buckets,
      CAST(MIN(CASE WHEN cum_n >= CEIL(0.50 * n) THEN lb END) AS BIGINT)
        AS p50_cents,
      CAST(MIN(CASE WHEN cum_n >= CEIL(0.90 * n) THEN lb END) AS BIGINT)
        AS p90_cents,
      CAST(MIN(CASE WHEN cum_n >= CEIL(0.99 * n) THEN lb END) AS BIGINT)
        AS p99_cents
    FROM cum GROUP BY event_type
"""

_B5_QSKETCH_ORACLE = "WITH " + _B5_QSKETCH_CTE.format(extra_where="")

_B5_QSKETCH_MERGE_ORACLE = """
    WITH c0 AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
        CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
      WHERE ROUND(value * 100) >= 1
        AND ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-15'
    ),
    daily AS (
      SELECT event_type, day, e, sub, COUNT(*) AS cnt FROM (
        SELECT event_type, day,
          length(bin(cents)) - 1 AS e,
          (cents >> greatest(length(bin(cents)) - 3, 0)) & 3 AS sub
        FROM c0
      ) GROUP BY 1, 2, 3, 4
    ),
    sk AS (
      SELECT event_type, e, sub, SUM(cnt) AS cnt
      FROM daily GROUP BY 1, 2, 3
    ),
    cum AS (
      SELECT event_type, e, sub, cnt,
        CASE WHEN e >= 2 THEN (4 + sub) << (e - 2) ELSE sub END AS lb,
        SUM(cnt) OVER (PARTITION BY event_type ORDER BY e, sub) AS cum_n,
        SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM sk
    )
    SELECT event_type,
      CAST(MAX(n) AS BIGINT) AS n,
      CAST(COUNT(*) AS BIGINT) AS n_buckets,
      CAST(MIN(CASE WHEN cum_n >= CEIL(0.50 * n) THEN lb END) AS BIGINT)
        AS p50_cents,
      CAST(MIN(CASE WHEN cum_n >= CEIL(0.90 * n) THEN lb END) AS BIGINT)
        AS p90_cents,
      CAST(MIN(CASE WHEN cum_n >= CEIL(0.99 * n) THEN lb END) AS BIGINT)
        AS p99_cents
    FROM cum GROUP BY event_type
"""


def _qsketch_buckets(df):
    """(event_type, cents>=1) → exact log2-octave bucket columns.
    The bucket expressions are shared with the streaming CQ leg via
    functions/qsketch.py — batch and stream cannot drift."""
    from ..functions.qsketch import qsketch_octave, qsketch_sub

    return df.select(
        "event_type",
        *_extra_qsketch_cols(df),
        qsketch_octave().alias("e"),
        qsketch_sub().alias("sub"),
    )


def _extra_qsketch_cols(df):
    return [c for c in ("day",) if c in df.columns]


def _qsketch_quantiles(sk):
    """Sketch rows (event_type, e, sub, cnt) → per-series quantiles."""
    from ..functions.qsketch import qsketch_lower_bound

    lb = qsketch_lower_bound()
    wo = (
        Window.partitionBy("event_type")
        .orderBy("e", "sub")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy("event_type")
    cum = sk.select(
        "event_type",
        "cnt",
        lb.alias("lb"),
        F.sum("cnt").over(wo).alias("cum_n"),
        F.sum("cnt").over(wp).alias("n"),
    )

    def pick(pct, name):
        # rank = ceil(pct% of n) in EXACT integer arithmetic:
        # (pct*n + 99) div 100 == ceil(pct*n/100) for positive n —
        # matches the oracle's DECIMAL CEIL(0.xx * n) at any n, where
        # a DOUBLE product would round off past ~2^53 (ADVICE r8).
        rank = F.expr(f"({pct} * n + 99) div 100")
        return (
            F.min(F.when(F.col("cum_n") >= rank, F.col("lb")))
            .cast("bigint")
            .alias(name)
        )

    return cum.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("n_buckets"),
        pick(50, "p50_cents"),
        pick(90, "p90_cents"),
        pick(99, "p99_cents"),
    )


@register(
    "b5_quantile_sketch", oracle=_B5_QSKETCH_ORACLE, tags=("B5", "B23")
)
def b5_quantile_sketch(spark, sf_dir):
    c = (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .filter(F.col("cents") >= 1)
    )
    sk = _qsketch_buckets(c).groupBy("event_type", "e", "sub").agg(
        F.count("*").alias("cnt")
    )
    return _qsketch_quantiles(sk)


@register(
    "b5_quantile_windowed_merge",
    oracle=_B5_QSKETCH_MERGE_ORACLE,
    tags=("B5", "B23"),
)
def b5_quantile_windowed_merge(spark, sf_dir):
    """Per-DAY sketch tables (what a CQ materializes) merged over a
    10-day range with bucket-count SUM — the sketch's merge operator —
    then the same quantile extraction. tests/test_operators.py asserts
    the merged answer EQUALS the direct one-pass sketch over the same
    range: merge loses nothing, so any-range percentiles come from
    per-partition sketches without a second raw scan."""
    ev = events_between(spark, sf_dir, "2024-01-05", "2024-01-15").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    ).filter(F.col("cents") >= 1)
    daily = _qsketch_buckets(ev).groupBy(
        "event_type", "day", "e", "sub"
    ).agg(F.count("*").alias("cnt"))
    merged = daily.groupBy("event_type", "e", "sub").agg(
        F.sum("cnt").alias("cnt")
    )
    return _qsketch_quantiles(merged)
