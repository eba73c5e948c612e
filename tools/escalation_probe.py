"""Root-cause probe for the within-suite run escalation (round-8
verdict "What's wrong #3"): b19_span_dedup's own 5-run loop escalated
3.06 → 22.5 s, b21_boilerplate_hashed 1.07 → 11.2 s, b19_pagerank
0.77 → 4.5 s, b18_kcenter_coreset 1.25 → 2.7 s — min-of-N hides it,
and spark.catalog.clearCache() runs only BETWEEN queries.

Hypotheses instrumented per run:
  H1 JVM heap garbage accumulation → escalating GC time (bench.py runs
     gc.collect + System.gc only between QUERIES, never between a
     query's own repeats, so py4j-held DataFrame refs from runs 1..k-1
     pin JVM objects during run k and GC churns).
  H2 shuffle-file buildup on disk (ContextCleaner only removes shuffle
     files after a JVM GC collects the RDD — same root as H1).
  H3 cached-RDD accumulation (plan-matched caches SHOULD be reused;
     if the count grows per run, CacheManager is not matching).

Usage: python tools/escalation_probe.py [--mitigated] [--queries a,b]
  default mode reproduces bench.py's loop exactly (no between-run
  cleanup); --mitigated runs gc.collect()+System.gc() between repeats
  (outside the timed window), the candidate bench.py fix.

Writes one JSON line per query with per-run wall / gc_ms / heap_mb /
cached_rdds / shuffle_mb arrays.
"""

from __future__ import annotations

import gc
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFFENDERS = [
    "b19_span_dedup",
    "b21_boilerplate_hashed",
    "b19_pagerank",
    "b18_kcenter_coreset",
]


def _shuffle_bytes() -> int:
    total = 0
    for d in glob.glob("/tmp/blockmgr-*"):
        for root, _, files in os.walk(d):
            for fn in files:
                try:
                    total += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    pass
    return total


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mitigated = "--mitigated" in sys.argv
    names = OFFENDERS
    if "--queries" in sys.argv:
        names = sys.argv[sys.argv.index("--queries") + 1].split(",")

    from iot_system_plc_data_to_influxdb_spark import plans
    from iot_system_plc_data_to_influxdb_spark.session import get_spark

    spark = get_spark("escalation-probe")
    qs = plans.all_queries()
    jvm = spark.sparkContext._jvm
    sc = spark.sparkContext._jsc.sc()

    def gc_ms() -> int:
        beans = jvm.java.lang.management.ManagementFactory \
            .getGarbageCollectorMXBeans()
        return sum(b.getCollectionTime() for b in beans)

    def heap_mb() -> int:
        rt = jvm.java.lang.Runtime.getRuntime()
        return int((rt.totalMemory() - rt.freeMemory()) / (1 << 20))

    def cached_rdds() -> int:
        return len(sc.getRDDStorageInfo())

    for name in names:
        fn = qs[name]
        spark.catalog.clearCache()
        gc.collect()
        jvm.System.gc()

        def run_once() -> float:
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        walls, gcs, heaps, caches, shuffles = [], [], [], [], []
        run_once()  # warm-up, exactly like bench.py
        for _ in range(5):
            if mitigated:
                gc.collect()
                jvm.System.gc()
            g0 = gc_ms()
            w = run_once()
            walls.append(round(w, 2))
            gcs.append(gc_ms() - g0)
            heaps.append(heap_mb())
            caches.append(cached_rdds())
            shuffles.append(round(_shuffle_bytes() / (1 << 20)))
        print(json.dumps({
            "query": name,
            "mitigated": mitigated,
            "wall_s": walls,
            "gc_ms_delta": gcs,
            "heap_mb_after": heaps,
            "cached_rdds_after": caches,
            "shuffle_mb_after": shuffles,
        }))
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
