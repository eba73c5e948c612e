"""Attribute bench-suite inflation for one query: run it (a) first in
a fresh session, then (b) after a prefix of the bench suite, logging
every individual run. Usage:
    python tools/ab_bench_order.py b3_influxql_derivative [n_prefix]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    target = sys.argv[1]
    n_prefix = int(sys.argv[2]) if len(sys.argv) > 2 else None

    import bench
    from iot_system_plc_data_to_influxdb_spark import plans
    from iot_system_plc_data_to_influxdb_spark.session import get_spark

    spark = get_spark("ab-order")
    qs = plans.all_queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def run_once(name):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def measure(name, tag):
        spark.catalog.clearCache()
        warm = run_once(name)
        runs = [run_once(name) for _ in range(5)]
        print(
            f"{tag} {name}: warm={warm:.2f} "
            f"runs={[round(r, 2) for r in runs]}"
        )

    # (a) fresh session, first thing measured
    measure(target, "FRESH")

    # (b) after the bench prefix (same protocol: clearCache + warm + runs)
    prefix = bench.BENCH_QUERIES[: n_prefix] if n_prefix else [
        q for q in bench.BENCH_QUERIES
    ]
    for name in prefix:
        if name == target:
            break
        spark.catalog.clearCache()
        run_once(name)
        run_once(name)
    measure(target, "AFTER-PREFIX")


if __name__ == "__main__":
    main()
