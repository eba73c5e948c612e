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


def register(name: str, oracle: Optional[str] = None, tags: tuple = ()):
    """Decorator: declare a query, optionally with its oracle SQL.

    ``oracle=None`` marks a genuinely non-SQL-expressible op — the
    driver then records a weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # DuckDB treats timestamps as naive; pin Spark to UTC so
            # string→timestamp literals and date_trunc/window bucketing
            # agree with the oracle regardless of the host timezone.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        _REGISTRY[name] = Declared(name, wrapped, oracle, tags)
        return wrapped

    return deco


def queries() -> dict[str, QueryFn]:
    return {n: d.fn for n, d in sorted(_REGISTRY.items())}


def oracles() -> dict[str, str]:
    return {n: d.oracle for n, d in sorted(_REGISTRY.items()) if d.oracle}


def get(name: str) -> Declared:
    return _REGISTRY[name]
