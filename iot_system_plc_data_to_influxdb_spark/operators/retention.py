"""Retention policy as physical partition management (SURVEY.md B25).

The reference gets retention from InfluxDB ("It also has retention
policy", README.md:3). On a date-partitioned parquet points table the
same policy is partition arithmetic:

- query-time age-off: a partition-pruned filter (b25 query) — old data
  is never read;
- storage age-off: drop partition directories older than the cutoff —
  O(#partitions) metadata work, no data scan, which is the only
  retention that matters at 100 TB.
"""

from __future__ import annotations

import datetime as _dt
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_points_partitioned(points: DataFrame, path: str) -> None:
    """points(ts, plc_ip, alias, value) → parquet partitioned by
    (plc_ip, date) — the db-per-PLC layout plus retention axis."""
    (
        points.withColumn("date", F.date_format("ts", "yyyy-MM-dd"))
        .write.mode("append")
        .partitionBy("plc_ip", "date")
        .parquet(path)
    )


#: test-scale stand-in for SCALE.md's 1024 — the layout is identical,
#: only the modulus differs
N_PLC_BUCKETS = 64


def plc_bucket(plc_ip_col, n_buckets: int = N_PLC_BUCKETS):
    """SCALE.md's coarsened partition key: hash(plc_ip) % n_buckets.

    Raw (plc_ip, date) partitioning explodes into ~10M directories at
    10k PLCs × 1000 days; bucketing the PLC axis bounds the partition
    count at n_buckets × days while keeping both pruning axes — a
    single-PLC query prunes to its bucket, a time-range query to its
    dates. xxhash64 is Spark-native (evaluated JVM-side, codegen'd)."""
    return F.pmod(F.xxhash64(plc_ip_col), F.lit(n_buckets))


def write_points_bucketed(
    points: DataFrame, path: str, n_buckets: int = N_PLC_BUCKETS
) -> None:
    """The 100 TB points layout: parquet partitioned by
    (plc_bucket, date), rows sorted by (plc_ip, ts) inside each file
    so a single PLC's points are contiguous (row-group stat pruning
    inside the bucket) and time-ordered for range scans."""
    (
        points.withColumn("plc_bucket", plc_bucket(F.col("plc_ip"), n_buckets))
        .withColumn("date", F.date_format("ts", "yyyy-MM-dd"))
        .repartition("plc_bucket", "date")
        .sortWithinPartitions("plc_ip", "ts")
        .write.mode("append")
        .partitionBy("plc_bucket", "date")
        .parquet(path)
    )


def read_points_for_plc(
    spark,
    path: str,
    plc_ip: str,
    date_lo: str | None = None,
    date_hi: str | None = None,
    n_buckets: int = N_PLC_BUCKETS,
) -> DataFrame:
    """Single-PLC (optionally time-ranged) read over the bucketed
    layout, shaped so BOTH pruning axes stay partition filters:
    plc_bucket == hash(plc_ip) % n (computed once, driver-side, with
    the same JVM xxhash64 the writer used) and the date bounds as
    lexicographic string comparisons on the partition column. The
    residual plc_ip equality prunes row groups via the write-time sort;
    it and any ts bounds push down into the parquet scan."""
    b = int(
        spark.range(1)
        .select(plc_bucket(F.lit(plc_ip), n_buckets).alias("b"))
        .first()["b"]
    )
    df = spark.read.parquet(path).filter(
        (F.col("plc_bucket") == b) & (F.col("plc_ip") == plc_ip)
    )
    if date_lo is not None:
        df = df.filter(F.col("date") >= date_lo)
    if date_hi is not None:
        df = df.filter(F.col("date") <= date_hi)
    return df


def expired_partitions(path: str, cutoff: _dt.date) -> list[str]:
    out = []
    for plc_dir in sorted(os.listdir(path)):
        if not plc_dir.startswith("plc_ip="):
            continue
        full = os.path.join(path, plc_dir)
        for date_dir in sorted(os.listdir(full)):
            if not date_dir.startswith("date="):
                continue
            d = _dt.date.fromisoformat(date_dir.split("=", 1)[1])
            if d < cutoff:
                out.append(os.path.join(full, date_dir))
    return out


def drop_expired(path: str, cutoff: _dt.date) -> int:
    """Remove partitions strictly older than cutoff; returns the count.

    Local-FS implementation; on object storage this is the same listing
    plus bulk delete (or `ALTER TABLE DROP PARTITION` with a metastore
    / `DELETE WHERE` on Delta — still metadata-only).
    """
    dropped = expired_partitions(path, cutoff)
    for p in dropped:
        shutil.rmtree(p)
    return len(dropped)


def write_training_shards(
    docs: "DataFrame", packed: "DataFrame", path: str
) -> None:
    """Materialize sequence-packed documents as training shards laid
    out ``lang=<l>/bin_id=<b>/`` (plans/northstar.b21_sequence_pack
    produces ``packed``). A trainer pulling one shard reads ONE
    partition directory — partition pruning, no corpus scan — and a
    whole-lang epoch reads only that lang's subtree. Same layout idea
    as the (plc_ip, date) points archive above.

    ``packed`` bins are shard-local (two-level packing, bounded pandas
    groups); the partition key folds (shard, bin_id) into one globally
    unique bin label — collision-free because a shard of width S holds
    <= S docs and therefore < S local bins."""
    from pyspark.sql import functions as F

    cols = set(packed.columns)
    if "shard" in cols:
        # lazy import: operators must not import plans at module load
        from ..plans.northstar import _PACK_SHARD_SPAN

        gbin = (
            F.col("shard") * _PACK_SHARD_SPAN + F.col("bin_id")
        ).alias("bin_id")
        pk = packed.select("doc_id", "lang", gbin)
    else:
        pk = packed.select("doc_id", "lang", "bin_id")
    (
        docs.select("doc_id", "text")
        .join(pk, "doc_id")
        .repartition("lang", "bin_id")
        .sortWithinPartitions("bin_id", "doc_id")
        .write.mode("overwrite")
        .partitionBy("lang", "bin_id")
        .parquet(path)
    )


def partition_file_counts(path: str) -> dict[str, int]:
    """partition-dir (relative) → parquet file count, for any 2-level
    hive layout written by the functions above."""
    out: dict[str, int] = {}
    for lvl1 in sorted(os.listdir(path)):
        full1 = os.path.join(path, lvl1)
        if "=" not in lvl1 or not os.path.isdir(full1):
            continue
        for lvl2 in sorted(os.listdir(full1)):
            full2 = os.path.join(full1, lvl2)
            if "=" not in lvl2 or not os.path.isdir(full2):
                continue
            n = sum(1 for f in os.listdir(full2) if f.endswith(".parquet"))
            out[f"{lvl1}/{lvl2}"] = n
    return out


def compact_partition(
    spark,
    path: str,
    partition_rel: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> tuple[int, int]:
    """Rewrite ONE partition directory's many small files into
    ⌈bytes/target⌉ files. Returns (files_before, files_after).

    Streaming sinks write a file per micro-batch per partition — after
    a day a (plc_bucket, date) directory holds thousands of KB-sized
    files and scan cost is dominated by file-open overhead. Compaction
    is the standard nightly repair: read the one partition, coalesce to
    the target file count, write to a staging dir, atomically swap.
    Only the partition being compacted is touched (O(partition), never
    O(table)), so a fleet compacts yesterday's partitions while today's
    keep streaming — exactly how Delta/Iceberg OPTIMIZE schedules, done
    here as plain directory arithmetic.
    """
    full = os.path.join(path, partition_rel)
    files = [f for f in os.listdir(full) if f.endswith(".parquet")]
    before = len(files)
    total_bytes = sum(os.path.getsize(os.path.join(full, f)) for f in files)
    n_out = max(1, -(-total_bytes // target_bytes))  # ceil
    if n_out >= before:
        return before, before  # already compact
    staging = full + ".compact_tmp"
    (
        spark.read.parquet(full)
        .coalesce(int(n_out))
        .write.mode("overwrite")
        .parquet(staging)
    )
    old = full + ".compact_old"
    os.rename(full, old)
    os.rename(staging, full)
    shutil.rmtree(old)
    # drop _SUCCESS marker noise so the dir stays a clean partition
    marker = os.path.join(full, "_SUCCESS")
    if os.path.exists(marker):
        os.remove(marker)
    after = sum(1 for f in os.listdir(full) if f.endswith(".parquet"))
    return before, after


def compact_all(
    spark, path: str, target_bytes: int = 128 * 1024 * 1024
) -> dict[str, tuple[int, int]]:
    """Compact every partition that has more files than its data needs."""
    results = {}
    for rel, n in partition_file_counts(path).items():
        if n > 1:
            results[rel] = compact_partition(spark, path, rel, target_bytes)
    return results


def recover_interrupted_compactions(path: str) -> dict[str, str]:
    """Repair partitions left inconsistent by a compaction crash.

    The swap sequence is: write `.compact_tmp` → rename live dir to
    `.compact_old` → rename tmp to live → delete old. A crash can
    leave (a) an orphan `.compact_tmp` (crash before the swap — the
    live dir is intact: drop the tmp), or (b) a `.compact_old` with no
    live dir (crash between the renames: restore the old dir) or with
    a live dir (crash before cleanup: the swap completed, drop the
    old). Run this on startup, the way a WAL is replayed.
    """
    actions: dict[str, str] = {}
    for root, dirs, _files in os.walk(path):
        for d in list(dirs):
            full = os.path.join(root, d)
            if d.endswith(".compact_tmp"):
                shutil.rmtree(full)
                actions[os.path.relpath(full, path)] = "dropped orphan tmp"
                dirs.remove(d)
            elif d.endswith(".compact_old"):
                live = full[: -len(".compact_old")]
                if os.path.exists(live):
                    shutil.rmtree(full)
                    actions[os.path.relpath(full, path)] = (
                        "swap had completed; dropped old"
                    )
                else:
                    os.rename(full, live)
                    actions[os.path.relpath(full, path)] = (
                        "restored interrupted swap"
                    )
                dirs.remove(d)
    return actions
