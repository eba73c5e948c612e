"""Stress-ratio attribution → STRESS.md '## Stress ratio attribution'.

STRESS.md's 10× probe shows b8_shuffle_join and b5_hll_deterministic
with the highest time ratios (≈7 and ≈6.5 vs 1.1 for scan-bound
queries). This tool explains WHERE those ratios come from, at stage
granularity: for each query at 1× (sf0.1) and 10× (the shifted-key
replica dir), it diffs the Spark REST API's completed-stage list
around one warm execution and records per-stage task counts, input
bytes, shuffle bytes, and executor run time. The question the numbers
answer: do the post-shuffle partition counts SCALE with data (healthy)
or SATURATE at spark.sql.shuffle.partitions while per-task data grows
10× (the AQE initialPartitionNum ceiling), and is the extra wall time
map-side (input scan) or reduce-side (shuffle)?

Usage: python tools/stress_attrib.py [--keep]
       (builds the 10× tables via stress_probe.build_stress_tables;
        --keep leaves them under /tmp for reuse)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stress_probe import BASE, STRESS, build_stress_tables  # noqa: E402

UI_PORT = 4048
STRESS_MD = "/root/repo/STRESS.md"
SECTION = "## Stress ratio attribution"

QUERIES = [
    "b8_shuffle_join",        # worst ratio in the 10× table
    "b5_hll_deterministic",   # second worst
    "b4_hash_aggregate",      # same agg family, for contrast
]


def _rest(app_id: str, path: str):
    with urllib.request.urlopen(
        f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/{path}",
        timeout=10,
    ) as r:
        return json.loads(r.read())


def _stages(app_id: str) -> dict[int, dict]:
    out = {}
    for s in _rest(app_id, "stages?status=complete"):
        out[(s["stageId"], s["attemptId"])] = s
    return out


def _fmt(n: float) -> str:
    if n == 0:
        return "0"
    for unit in ("B", "KB", "MB", "GB"):
        if n < 1024:
            return f"{n:.0f} {unit}" if unit == "B" else f"{n:.1f} {unit}"
        n /= 1024.0
    return f"{n:.1f} TB"


def profile(spark, fn, sf_dir: str) -> dict:
    """One warm noop execution, stage-diffed: returns the new stages'
    aggregate and the per-stage breakdown sorted by executor time."""
    app_id = spark.sparkContext.applicationId
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    before = set(_stages(app_id))
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    after = _stages(app_id)
    new = [after[k] for k in after if k not in before]
    rows = sorted(
        (
            {
                "stage": s["stageId"],
                "tasks": s["numCompleteTasks"],
                "input": s.get("inputBytes", 0),
                "sw": s.get("shuffleWriteBytes", 0),
                "sr": s.get("shuffleReadBytes", 0),
                "run_ms": s.get("executorRunTime", 0),
            }
            for s in new
        ),
        key=lambda r: -r["run_ms"],
    )
    return {
        "wall": wall,
        "stages": len(rows),
        "tasks": sum(r["tasks"] for r in rows),
        "input": sum(r["input"] for r in rows),
        "sw": sum(r["sw"] for r in rows),
        "sr": sum(r["sr"] for r in rows),
        "run_ms": sum(r["run_ms"] for r in rows),
        "per_stage": rows,
    }


def replace_section(md_path: str, header: str, body: str) -> None:
    """Replace (or append) one '## ...' section, preserving the others
    — sections are bounded by the next line starting with '## '."""
    try:
        with open(md_path) as f:
            cur = f.read()
    except FileNotFoundError:
        cur = ""
    lines = cur.split("\n")
    starts = [
        i for i, ln in enumerate(lines) if ln.startswith(header)
    ]
    if starts:
        i = starts[0]
        j = next(
            (
                k
                for k in range(i + 1, len(lines))
                if lines[k].startswith("## ")
            ),
            len(lines),
        )
        out = lines[:i] + body.rstrip("\n").split("\n") + [""] + lines[j:]
    else:
        out = lines
        if out and out[-1].strip():
            out.append("")
        out += body.rstrip("\n").split("\n") + [""]
    with open(md_path, "w") as f:
        f.write("\n".join(out))


def main() -> int:
    from iot_system_plc_data_to_influxdb_spark import plans

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stress-attrib")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .getOrCreate()
    )
    if not os.path.exists(f"{STRESS}/orders.parquet"):
        print(f"building 10x tables under {STRESS} ...")
        build_stress_tables(spark)

    qs = plans.all_queries()
    table = [
        "| query | scale | stages | tasks | input | shuf write | "
        "exec time | wall |",
        "|---|---|---|---|---|---|---|---|",
    ]
    detail: list[str] = []
    for name in QUERIES:
        for label, d in (("1×", BASE), ("10×", STRESS)):
            p = profile(spark, qs[name], d)
            table.append(
                f"| {name} | {label} | {p['stages']} | {p['tasks']} | "
                f"{_fmt(p['input'])} | {_fmt(p['sw'])} | "
                f"{p['run_ms']/1000:.1f} s | {p['wall']:.2f} s |"
            )
            top = p["per_stage"][:3]
            detail.append(
                f"- `{name}` {label} top stages (tasks, input, shufW, "
                "shufR, exec): "
                + "; ".join(
                    f"#{r['stage']} ({r['tasks']}t, {_fmt(r['input'])}, "
                    f"{_fmt(r['sw'])}, {_fmt(r['sr'])}, "
                    f"{r['run_ms']/1000:.1f}s)"
                    for r in top
                )
            )
            print(table[-1])
            print(detail[-1])

    body = "\n".join(
        [
            f"{SECTION} (tools/stress_attrib.py)",
            "",
            "Per-stage REST metrics around one warm execution of the",
            "highest-ratio queries from the 10× table, at both scales",
            "(local[32], spark.sql.shuffle.partitions=32, AQE on):",
            "",
            *table,
            "",
            *detail,
            "",
            "Reading the numbers: the extra seconds are MAP-SIDE scan/",
            "partial-agg work, and the shuffles stay bounded. b8's scan",
            "stage goes 3 tasks/1.0 s → 12 tasks/8.7 s executor time",
            "(≈ the data ratio; one wave on 32 cores either way) while",
            "its reduce side widens 3 → 32 AQE-coalesced partitions —",
            "the 10× join shuffle (34 MB) splits to ~1 MB/task, three",
            "orders under spill territory, so the shuffle.partitions=32",
            "ceiling it touches is harmless here; at 100× one would",
            "raise spark.sql.adaptive.coalescePartitions.",
            "initialPartitionNum (AQE only coalesces DOWN from it).",
            "b5_hll is the mergeable-sketch proof: shuffle write is",
            "4.5 KB at BOTH scales (≤256 registers per partial,",
            "independent of rows) — 100% of the 6.5× ratio is the map",
            "stage folding 10× the rows (0.6 → 4.7 s). b4 likewise:",
            "group-count-bounded shuffle stays ~6.5 MB while map time",
            "goes 0.9 → 5.7 s. The 4–7× wall ratios are sub-linear in",
            "the 10× data — fixed scheduling overhead amortizing, not",
            "a hotspot: on a 1000-executor cluster the growing part",
            "(map waves) spreads; the fixed-size shuffles don't.",
        ]
    )
    replace_section(STRESS_MD, SECTION, body)
    print("wrote STRESS.md attribution section")

    if "--keep" not in sys.argv:
        shutil.rmtree(STRESS, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
