"""Audit every query/oracle pair's OUTPUT dtypes for columns the
driver's canonicalizer mishandles:

- Spark side: ARRAY / MAP / STRUCT columns (pandas gets unhashable
  lists/dicts → the canonicalizer's sort_values crashes), DECIMAL
  (object Decimal cells).
- DuckDB side: HUGEINT (int128 — duckdb .df() renders it float64, so
  integer values hash differently than Spark's int64) and DECIMAL /
  LIST for the same reasons.

Usage: python tools/audit_output_types.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

SPARK_BAD = ("array", "map", "struct", "decimal")
DUCK_BAD = ("HUGEINT", "DECIMAL", "[]", "LIST", "STRUCT", "MAP")


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from iot_system_plc_data_to_influxdb_spark import plans

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )

    oracles = plans.all_oracles()
    bad = 0
    for name, fn in sorted(plans.all_queries().items()):
        flags = []
        try:
            df = fn(spark, SF_DIR)
            for c, dt in df.dtypes:
                if any(b in dt for b in SPARK_BAD):
                    flags.append(f"spark {c}:{dt}")
        except Exception as e:  # noqa: BLE001
            flags.append(f"spark ERROR {e}")
        sql = oracles.get(name)
        if sql:
            try:
                rel = con.sql(sql)
                for c, dt in zip(rel.columns, map(str, rel.types)):
                    if any(b in dt for b in DUCK_BAD):
                        flags.append(f"duckdb {c}:{dt}")
            except Exception as e:  # noqa: BLE001
                flags.append(f"duckdb ERROR {type(e).__name__}: {e}")
        if flags:
            bad += 1
            print(f"FLAG  {name}: " + "; ".join(flags))
    print(f"\n{bad} queries flagged" if bad else "\nall output dtypes clean")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
