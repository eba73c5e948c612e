"""Declared query set (SURVEY.md §2) + DuckDB oracle SQL.

Importing this package populates the registry; ``__spark_entry__.py``
re-exports ``queries()`` / ``oracle_sql()`` from here.
"""

from __future__ import annotations

from . import (  # noqa: F401  (import for registration side effects)
    config_plane,
    flagship,
    northstar,
    pipeline,
    relational,
    streaming_parity,
    timeseries,
)
from .registry import (  # noqa: F401
    CANONICAL,
    all_oracles,
    all_queries,
    oracles,
    queries,
)
