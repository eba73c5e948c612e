"""Streaming endurance soak → STRESS.md (round-10 verdict #6).

The long-job analog of the round-9 bench GC finding: run the FULL CQ
set concurrently for ~10 minutes of micro-batches and prove the
engine's steady state is actually steady — driver/JVM memory flat,
state-store rows bounded by key cardinality, batch ids advancing in
every query to the end.

Queries under soak (one rate source each, 2,000 rows/s, 5 s triggers):
  rollup    — start_continuous_downsample: windowed min/max/sum/n CQ
              appending parquet via foreachBatch (the real sink path)
  qsketch   — quantile_sketch_stream (percentile CQ)        → noop
  hll       — hll_register_stream (distinct CQ)             → noop
  cms       — cms_cell_stream (frequency CQ)                → noop
  curval    — current_value_stream (applyInPandasWithState,
              A10 last-value upsert)            → foreachBatch count

Memory is sampled every 10 s AFTER a gc.collect() + System.gc() pair
(the round-9 between-repeats discipline — we measure RETAINED memory,
not uncollected garbage): Python driver RSS, JVM RSS, JVM used heap,
plus per-query max batchId and summed state-store numRowsTotal.

Writes/replaces the '## Streaming endurance soak' section of STRESS.md
(placed below the stress_probe MANUAL marker so full-table rewrites
never clobber it). Duration override: SOAK_S env (default 600).

Usage: python tools/endurance_probe.py
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

STRESS_MD = "/root/repo/STRESS.md"
SECTION = "## Streaming endurance soak"
SOAK_S = int(os.environ.get("SOAK_S", "600"))
SAMPLE_EVERY_S = 10
RATE = 2000          # rows/s per source
N_PLC, N_ALIAS = 10, 50   # 500 point keys
N_TYPES, N_USERS = 5, 500


def _rss_mb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for ln in f:
                if ln.startswith("VmRSS:"):
                    return int(ln.split()[1]) / 1024.0
    except OSError:
        pass
    return float("nan")


def _points(spark):
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", RATE)
        .load()
    )
    v = F.col("value")
    return rate.select(
        F.col("timestamp").alias("ts"),
        F.concat(F.lit("plc"), (v % N_PLC).cast("string")).alias("plc_ip"),
        F.concat(
            F.lit("tag"), ((v / N_PLC).cast("bigint") % N_ALIAS).cast("string")
        ).alias("alias"),
        (v % 1000).cast("double").alias("value"),
    )


def _events(spark):
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", RATE)
        .load()
    )
    v = F.col("value")
    return rate.select(
        F.col("timestamp").alias("ts"),
        F.concat(F.lit("et"), (v % N_TYPES).cast("string")).alias(
            "event_type"
        ),
        (v % N_USERS).alias("user_id"),
        ((v % 997) + 1).cast("double").alias("value"),
    )


def main() -> int:
    from iot_system_plc_data_to_influxdb_spark.session import get_spark

    spark = get_spark("endurance-probe")  # Spark-4 classic needs an
    # active context before any F.col() — import the CQ modules after
    from iot_system_plc_data_to_influxdb_spark.streaming.rollup import (
        cms_cell_stream,
        hll_register_stream,
        quantile_sketch_stream,
        start_continuous_downsample,
    )
    from iot_system_plc_data_to_influxdb_spark.streaming.state import (
        current_value_stream,
    )
    tmp = tempfile.mkdtemp(prefix="endurance_")
    queries = {}

    queries["rollup"] = start_continuous_downsample(
        _points(spark),
        table_path=os.path.join(tmp, "rollup_table"),
        checkpoint_dir=os.path.join(tmp, "ck_rollup"),
        every="1 minute",
        watermark="2 minutes",
        trigger_interval="5 seconds",
    )

    def _noop(df, name):
        return (
            df.writeStream.outputMode("append")
            .format("noop")
            .option("checkpointLocation", os.path.join(tmp, f"ck_{name}"))
            .trigger(processingTime="5 seconds")
            .start()
        )

    queries["qsketch"] = _noop(quantile_sketch_stream(_events(spark)), "qs")
    queries["hll"] = _noop(hll_register_stream(_events(spark)), "hll")
    queries["cms"] = _noop(cms_cell_stream(_events(spark)), "cms")
    queries["curval"] = (
        current_value_stream(_points(spark))
        .writeStream.outputMode("update")
        .option("checkpointLocation", os.path.join(tmp, "ck_cv"))
        .foreachBatch(lambda df, _bid: df.count())
        .trigger(processingTime="5 seconds")
        .start()
    )

    jvm = spark.sparkContext._jvm
    jvm_pid = int(jvm.java.lang.ProcessHandle.current().pid())
    py_pid = os.getpid()
    samples = []
    t0 = time.time()
    print(f"soaking {len(queries)} CQs for {SOAK_S}s ...", flush=True)
    while time.time() - t0 < SOAK_S:
        time.sleep(SAMPLE_EVERY_S)
        # the round-9 discipline: collect BOTH runtimes, then measure
        gc.collect()
        jvm.System.gc()
        rt = jvm.java.lang.Runtime.getRuntime()
        heap_mb = (rt.totalMemory() - rt.freeMemory()) / (1024.0 * 1024.0)
        row = {
            "t_s": round(time.time() - t0, 1),
            "py_rss_mb": round(_rss_mb(py_pid), 1),
            "jvm_rss_mb": round(_rss_mb(jvm_pid), 1),
            "jvm_heap_mb": round(heap_mb, 1),
        }
        for name, q in queries.items():
            p = q.lastProgress
            if p is None:
                row[f"{name}_batch"] = -1
                row[f"{name}_state_rows"] = -1
                continue
            row[f"{name}_batch"] = p["batchId"]
            row[f"{name}_state_rows"] = sum(
                op.get("numRowsTotal", 0)
                for op in p.get("stateOperators", [])
            )
        samples.append(row)
        print(json.dumps(row), flush=True)
        for name, q in queries.items():
            if q.exception() is not None:
                raise RuntimeError(f"{name} died: {q.exception()}")

    for q in queries.values():
        q.stop()
    shutil.rmtree(tmp, ignore_errors=True)

    # summarize: first sample after warmup (minute 2), mid, last
    def _pick(frac):
        return samples[min(len(samples) - 1, int(len(samples) * frac))]

    marks = [_pick(0.2), _pick(0.5), samples[-1]]
    warm = [s for s in samples if s["t_s"] >= SOAK_S * 0.2]
    # FLOOR-based drift: instantaneous heap/RSS oscillate with the GC
    # cycle (a sample can race a micro-batch's fresh allocations), so
    # the honest leak signal is the MINIMUM over a window — the
    # retained floor — early vs late.
    third = max(1, len(warm) // 3)
    heap_first = min(s["jvm_heap_mb"] for s in warm[:third])
    heap_last = min(s["jvm_heap_mb"] for s in warm[-third:])
    rss_first = min(s["jvm_rss_mb"] for s in warm[:third])
    rss_last = min(s["jvm_rss_mb"] for s in warm[-third:])
    state_cols = [k for k in samples[-1] if k.endswith("_state_rows")]
    state_peak = {c: max(s.get(c, 0) for s in samples) for c in state_cols}

    lines = [
        SECTION,
        "",
        f"tools/endurance_probe.py — {len(queries)} concurrent CQs "
        f"(rollup foreachBatch→parquet, quantile/HLL/CMS sketch CQs, "
        f"applyInPandasWithState current-value), rate sources at "
        f"{RATE} rows/s each, 5 s triggers, {SOAK_S} s soak, memory "
        "sampled every "
        f"{SAMPLE_EVERY_S} s after gc.collect()+System.gc() (the "
        "round-9 between-repeats discipline — retained memory, not "
        "garbage).",
        "",
        "| t (s) | py RSS MB | jvm RSS MB | jvm heap MB | "
        "rollup batch/state | qsketch | hll | cms | curval |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for s in marks:
        cells = " | ".join(
            f"{s[n + '_batch']}/{s[n + '_state_rows']}"
            for n in ("rollup", "qsketch", "hll", "cms", "curval")
        )
        lines.append(
            f"| {s['t_s']} | {s['py_rss_mb']} | {s['jvm_rss_mb']} | "
            f"{s['jvm_heap_mb']} | {cells} |"
        )
    lines += [
        "",
        f"Post-warmup (t≥{int(SOAK_S * 0.2)} s) retained-FLOOR drift "
        "(min over the first vs last third — instantaneous readings "
        "race the GC cycle and fresh micro-batch allocations): jvm "
        f"heap {heap_first:.0f}→{heap_last:.0f} MB "
        f"({(heap_last - heap_first):+.0f}), jvm RSS "
        f"{rss_first:.0f}→{rss_last:.0f} MB "
        f"({(rss_last - rss_first):+.0f}). Peak state rows: "
        + ", ".join(
            f"{c.removesuffix('_state_rows')}={v}"
            for c, v in sorted(state_peak.items())
        )
        + " — each bounded by (open windows × key cardinality), "
        "never by event volume.",
        "",
    ]

    text = open(STRESS_MD).read()
    if SECTION in text:
        start = text.index(SECTION)
        nxt = text.find("\n## ", start + len(SECTION))
        end = len(text) if nxt == -1 else nxt + 1
        text = text[:start] + "\n".join(lines) + text[end:]
    else:
        text = text.rstrip() + "\n\n" + "\n".join(lines)
    open(STRESS_MD, "w").write(text)
    print("wrote STRESS.md section:", SECTION)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
