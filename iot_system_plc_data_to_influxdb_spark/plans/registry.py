"""Registry binding each declared query to its DuckDB oracle SQL.

A query is a callable ``(spark, sf_dir) -> DataFrame``. The oracle is
an ANSI-SQL string DuckDB runs over the same parquet tables (the driver
pre-registers views named region nation customer supplier part orders
lineitem events documents embeddings). Column names must match the
Spark result exactly — the comparator sorts columns by name before
hashing values.

Determinism rules every registered query follows:
- money/measure aggregates go through DECIMAL casts so sums are exact
  and order-independent (float sums are neither);
- a rounded RATIO of exact integers never touches ROUND-on-double —
  it rounds half-up in integer space via plans/_exact.py (engines
  disagree on tie-adjacent doubles; quotients of integers can land
  exactly on ties);
- iterative folds (EWMA, Holt, RSI) apply the identical IEEE-754
  expression tree as their recursive-CTE oracles and emit raw doubles
  (identical doubles hash identically — rounding them would only
  reintroduce tie risk);
- rankings always carry a unique tie-break column.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Declared:
    name: str
    fn: QueryFn
    oracle: Optional[str]
    tags: tuple = field(default_factory=tuple)


_REGISTRY: dict[str, Declared] = {}

# The driver's correctness gate samples the FIRST 50 names of
# ``sorted(queries())``. With 117 registered queries that window
# silently dropped whole operator families (the b2–b9 relational core
# went two rounds driver-unchecked). Fix: ``queries()`` exposes exactly
# one curated canonical query per SURVEY §2 operator family (≤50 names,
# so the sample window covers ALL of them), and the 60+ dialect
# variants / replay twins / salted twins stay in the full registry,
# swept by ``tools/check_oracle.py --all`` and pytest
# (tests/test_registry.py).
CANONICAL: frozenset = frozenset(
    {
        # Part A — reference-implemented operators (config plane + decode)
        "a1_config_scan",          # A1 XML config scan
        "a2_active_filter",        # A2
        "a3_group_by_plc",         # A3
        "a4_group_by_interval",    # A4
        "a7_decode_dispatch",      # A6+A7+A8+A9 (parse/decode/bool/null-gate)
        "a11_point_projection",    # A11 point construction
        "a18_config_insert",       # A18
        "a19_distinct_plcs",       # A19
        "a20_aliases_for_plc",     # A20
        "a21_config_lookup",       # A21
        "a22_config_delete",       # A22
        "a23_config_update",       # A23
        # Part B — relational core
        "b1_scan_pushdown",
        "b2_time_range",
        "b3_downsample",
        "b3_influxql_compiled",    # the InfluxQL compiler is first-class
        "b4_hash_aggregate",
        "b5_hll_deterministic",    # md5-pinned HLL: sketch itself hash-checked
        "b5_distinct_exact",       # exact twin for B5 (approx_count_distinct
                                   # variant stays registered, rows-only)
        "b6_grouping_sets",
        "b7_broadcast_star_join",
        "b8_local_supplier_volume",
        "b9_outer_join",
        "b9_semi_join",
        "b9_anti_join",
        "b10_range_join",
        # time-series
        "b11_asof_join",
        "b11_gapfill_linear",
        "b12_window_funcs",
        "b13_topk_per_group",
        "b14_set_ops",
        "b15_pivot",
        "b16_string_funcs",
        "b17_array_funcs",
        # training-data pipeline
        "b18_dedup_exact",
        "b19_minhash_lsh_neardup",
        "b19_neardup_clusters",
        "b20_knn_bruteforce",
        "b21_curation_pipeline",
        "b21_decontaminate",
        "b22_image_decode",  # REAL BMP/PPM byte-level decode, hash-checked
        # analytics / forecast / retention
        "b23_anomaly_zscore",
        "b24_holt_forecast",
        "b25_retention_ageoff",
        # streaming parity
        "b26_sliding_window",
        "b27_session_window",
        "b28_watermark_accounting",  # hash-checked (two-pass running max)
        "b29_current_value",
        "b30_udf_decode",
        # flagship
        "flagship_signal_snapshot",
    }
)


def register(name: str, oracle: Optional[str] = None, tags: tuple = ()):
    """Decorator: declare a query, optionally with its oracle SQL.

    ``oracle=None`` marks a genuinely non-SQL-expressible op — the
    driver then records a weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str, **kw) -> DataFrame:
            # DuckDB treats timestamps as naive; pin Spark to UTC so
            # string→timestamp literals and date_trunc/window bucketing
            # agree with the oracle regardless of the host timezone.
            # Extra kwargs (tuning knobs like max_buckets/k) pass
            # through for tests; the driver only uses (spark, sf_dir).
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir, **kw)

        _REGISTRY[name] = Declared(name, wrapped, oracle, tags)
        return wrapped

    return deco


def queries() -> dict[str, QueryFn]:
    """Driver-facing canonical set: one query per §2 operator family.

    Guaranteed ≤50 names so the driver's alphabetical 50-sample covers
    every family. Variants live in :func:`all_queries`.
    """
    missing = CANONICAL - set(_REGISTRY)
    if missing:
        raise RuntimeError(f"canonical queries not registered: {sorted(missing)}")
    if len(CANONICAL) > 50:
        raise RuntimeError(f"canonical set has {len(CANONICAL)} names (>50)")
    return {n: _REGISTRY[n].fn for n in sorted(CANONICAL)}


def oracles() -> dict[str, str]:
    qs = queries()
    return {n: _REGISTRY[n].oracle for n in qs if _REGISTRY[n].oracle}


def all_queries() -> dict[str, QueryFn]:
    """Full registry (canonical + variants) for the secondary sweep."""
    return {n: d.fn for n, d in sorted(_REGISTRY.items())}


def all_oracles() -> dict[str, str]:
    return {n: d.oracle for n, d in sorted(_REGISTRY.items()) if d.oracle}


def get(name: str) -> Declared:
    return _REGISTRY[name]
