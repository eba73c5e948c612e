"""Local mirror of the driver's t2 correctness gate.

Sweeps the FULL registry (canonical + variants — ``all_queries()``) on
Spark and each ``all_oracles()`` twin on DuckDB over the same parquet
tables, then compares row count, sorted column names, and an
order-insensitive value hash. The driver only samples the ≤50 canonical
names from ``queries()``; this tool is the evidence for everything else.

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
        python tools/check_oracle.py --canonical [sf_dir]   # driver mirror
"""

from __future__ import annotations

import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    if isinstance(v, Decimal):
        f = float(v)
        if f == int(f) and abs(f) < 1e15:
            return str(int(f))
        return f"{f:.9g}"
    if isinstance(v, datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    return out


def main():
    import os

    argv = [a for a in sys.argv[1:]]
    canonical_only = "--canonical" in argv
    if canonical_only:
        argv.remove("--canonical")
    argv = [a for a in argv if not a.startswith("--")]
    # positionals: a directory is the sf_dir, anything else is a query
    # name (prefix match, so `check_oracle.py b12` sweeps all b12_*)
    sf_dir = "/root/testdata/sf0.01"
    only = set()
    for a in argv:
        if os.path.isdir(a):
            sf_dir = a
        else:
            only.add(a)

    import __spark_entry__ as entrymod
    from iot_system_plc_data_to_influxdb_spark import plans
    from iot_system_plc_data_to_influxdb_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )

    if canonical_only:
        qs = entrymod.queries()
        os_ = entrymod.oracle_sql()
    else:
        qs = plans.all_queries()
        os_ = plans.all_oracles()
    failures = []
    for name, fn in qs.items():
        if only and not any(name == o or name.startswith(o) for o in only):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in os_:
            print(f"rows  {name}: {len(srows)} rows (rows-only, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.sql(os_[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        sc, dc = canon(scols, srows), canon(dcols, drows)
        ok_vals = sc == dc
        status = "PASS" if (ok_cols and ok_count and ok_vals) else "FAIL"
        print(
            f"{status}  {name}: rows {len(srows)}/{len(drows)} "
            f"cols={'ok' if ok_cols else (scols, dcols)} "
            f"vals={'ok' if ok_vals else 'MISMATCH'} ({time.time()-t0:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_vals and ok_cols and ok_count:
                for a, b in zip(sc, dc):
                    if a != b:
                        print(f"      spark : {a[:200]}")
                        print(f"      duckdb: {b[:200]}")
                        break
    print(f"\n{'ALL PASS' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
