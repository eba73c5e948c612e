"""Runnable product/ops-analytics demo: the event-analytics suite end
to end, on the engine's own operators.

    python examples/analytics_demo.py

Walks the questions an ops or growth team asks of an event stream:

1. engagement — DAU/WAU/stickiness and the signup-cohort retention
   matrix with its revenue twin (the LTV curve),
2. behavior — the view→click→purchase funnel, first-3-event session
   paths, the Markov transition matrix, and last-touch attribution,
3. users — RFM (recency/frequency/monetary) segmentation with exact
   rank quintiles,
4. series health — MAD and Hampel outlier gates, CUSUM drift, the
   mean-shift changepoint with per-segment trends, ACF seasonality
   probe, and the retrospective gap report,
5. sketches — the mergeable distinct trio (HLL registers, KMV
   top-k, bloom membership) answering distinct-over-any-range
   without re-reading raw data.

Every step is a registered query with a DuckDB oracle; this script
just chains them the way an analyst would.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from iot_system_plc_data_to_influxdb_spark import plans  # noqa: E402
from iot_system_plc_data_to_influxdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def show(title: str, name: str, spark, n: int = 5) -> None:
    print(f"\n=== {title} ({name}) ===")
    plans.all_queries()[name](spark, SF_DIR).show(n, truncate=False)


def main() -> int:
    spark = get_spark("analytics-demo")

    # 1. engagement
    show("Rolling active users", "b27_rolling_active_users", spark)
    show("Retention cohorts", "b27_retention_cohorts", spark)
    show("Cohort LTV curve", "b27_ltv_curve", spark)

    # 2. behavior
    show("Conversion funnel", "b27_funnel_stages", spark)
    show("Top session paths", "b27_top_paths", spark)
    show("Event transition matrix", "b27_event_transitions", spark)
    show("Last-touch attribution", "b27_attribution", spark)

    # 3. users
    show("RFM segments", "b27_rfm_segments", spark)

    # 4. series health
    show("MAD outlier gate", "b23_mad_outliers", spark)
    show("Hampel filter hits", "b23_hampel", spark)
    show("CUSUM drift", "b23_cusum_drift", spark, 3)
    show("Mean-shift changepoint", "b23_changepoint", spark)
    show("Segmented trend", "b24_segmented_trend", spark, 10)
    show("Autocorrelation (lags 1-3)", "b23_acf", spark, 9)
    show("Gap report", "b23_gap_report", spark, 3)

    show("Alert transitions (ok↔alert edges)", "b23_alert_transitions",
         spark, 5)

    # 5. sketches
    show("HLL distinct estimate", "b5_hll_deterministic", spark, 1)
    show("KMV distinct estimate", "b5_kmv_distinct", spark, 1)
    show("Quantile sketch p50/p90/p99", "b5_quantile_sketch", spark, 5)

    print("\nall analytics stages ran; every query above is oracle-checked")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
