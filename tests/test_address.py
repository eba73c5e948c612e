"""A6 address parsing (getNumbers, Linux/InfluxConnector2.py:212-219)."""

from pyspark.sql import functions as F

from iot_system_plc_data_to_influxdb_spark.functions.address import (
    address_numbers,
    parse_address,
)

CASES = [
    # (area, address, nums, db, byte, bit) — SURVEY.md §5.3 goldens
    ("S7AreaDB", "DB10.DBW0", [10, 0], 10, 0, None),
    ("S7AreaDB", "DB5.DBX2.7", [5, 2, 7], 5, 2, 7),
    ("S7AreaPE", "I0.1", [0, 1], None, 0, 1),
    ("S7AreaPA", "QW20", [20], None, 20, None),
    ("S7AreaMK", "M12", [12], None, 12, None),
    ("S7AreaPE", "IW6", [6], None, 6, None),
]


def test_address_parse(spark):
    df = spark.createDataFrame(
        [(i, a, s) for i, (a, s, *_) in enumerate(CASES)],
        "id int, area string, address string",
    )
    out = (
        df.select(
            "id",
            address_numbers(F.col("address")).alias("nums"),
            parse_address(F.col("area"), F.col("address")).alias("p"),
        )
        .orderBy("id")
        .collect()
    )
    for row, (_, _, nums, db, byte, bit) in zip(out, CASES):
        assert row["nums"] == nums
        assert row["p"]["db_number"] == db
        assert row["p"]["byte_offset"] == byte
        assert row["p"]["bit_offset"] == bit
