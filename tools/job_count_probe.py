"""Count the Spark JOBS a registered query submits (round-13 evidence).

The round-12 verdict's #1 item asks for job-count evidence on the
recall harnesses ("Done = job count in the Spark UI (or a counted
sched dump) drops >= 3"). This probe runs one query end-to-end through
the noop sink and reports how many jobs the DAGScheduler allocated for
the whole run (its nextJobId counter — the same ids the Spark UI
shows): eager materializations (localCheckpoint, collect, Observation
fills, broadcast-subquery jobs) and the final noop write all count.

Usage: python tools/job_count_probe.py <query> [<query> ...]
Prints one line per query: JOB_COUNT {"query": ..., "jobs": N,
"wall_s": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iot_system_plc_data_to_influxdb_spark import plans  # noqa: E402
from iot_system_plc_data_to_influxdb_spark.session import get_spark  # noqa: E402


def _jobs_so_far(spark) -> int:
    nid = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    return nid if isinstance(nid, int) else nid.get()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("job-count-probe")
    qs = plans.all_queries()
    for name in sys.argv[1:]:
        fn = qs[name]
        # warm-up run so codegen/compile jobs don't inflate the count
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        before = _jobs_so_far(spark)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        after = _jobs_so_far(spark)
        print("JOB_COUNT " + json.dumps({
            "query": name,
            "jobs": after - before,
            "wall_s": round(wall, 3),
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
