"""A7/A8/A9 decode goldens + property round-trip (SURVEY.md §5.3/§5.5).

Golden expectations follow snap7.util semantics
(Linux/InfluxConnector2.py:146-170): big-endian Real/DWord/Word,
bit-indexed Bit, and the reference's Byte-via-get_int quirk under
strict_reference mode.
"""

import struct

import pytest
from pyspark.sql import functions as F

from iot_system_plc_data_to_influxdb_spark.functions.decode import (
    s7_value,
    s7_value_pandas,
)

GOLDENS = [
    # (data_type, buf, bit_off, expected)
    ("S7WLReal", struct.pack(">f", 1.0), None, 1.0),
    ("S7WLReal", struct.pack(">f", -12.5), None, -12.5),
    ("S7WLReal", struct.pack(">f", 0.15625), None, 0.15625),
    ("S7WLReal", struct.pack(">f", 0.0), None, 0.0),
    ("S7WLReal", struct.pack(">f", 3.4e38), None, 3.4e38),
    ("S7WLDWord", struct.pack(">I", 4294967295), None, 4294967295.0),
    ("S7WLDWord", struct.pack(">I", 2147483648), None, 2147483648.0),  # >2³¹
    ("S7WLDWord", struct.pack(">I", 0), None, 0.0),
    ("S7WLWord", struct.pack(">h", -1), None, -1.0),
    ("S7WLWord", struct.pack(">h", 12345), None, 12345.0),
    ("S7WLWord", struct.pack(">h", -32768), None, -32768.0),
    ("S7WLByte", struct.pack(">B", 200) + b"\x00", None, 200.0),
    ("S7WLByte", struct.pack(">B", 0) + b"\x00", None, 0.0),
    ("S7WLBit", bytes([0b10100101]), 0, 1.0),
    ("S7WLBit", bytes([0b10100101]), 1, 0.0),
    ("S7WLBit", bytes([0b10100101]), 5, 1.0),
    ("S7WLBit", bytes([0b10100101]), 7, 1.0),
    ("S7WLCounter", b"\x00\x2a", None, None),  # null gate A9
    ("S7WLTimer", b"\x00\x07", None, None),
]


def _decode_df(spark, rows, **kwargs):
    df = spark.createDataFrame(
        [(i, dt, buf, bit) for i, (dt, buf, bit, _) in enumerate(rows)],
        "id int, data_type string, buf binary, bit_off int",
    )
    return (
        df.select(
            "id", s7_value(F.col("data_type"), F.col("buf"), F.col("bit_off"), **kwargs).alias("v")
        )
        .orderBy("id")
        .collect()
    )


def test_native_decode_goldens(spark):
    out = _decode_df(spark, GOLDENS)
    for row, (dt, buf, bit, expected) in zip(out, GOLDENS):
        if expected is None:
            assert row["v"] is None, dt
        else:
            assert row["v"] == pytest.approx(expected, rel=1e-6), (dt, buf)


def test_pandas_udf_decode_matches_native(spark):
    df = spark.createDataFrame(
        [(i, dt, buf, bit) for i, (dt, buf, bit, _) in enumerate(GOLDENS)],
        "id int, data_type string, buf binary, bit_off int",
    )
    both = df.select(
        "id",
        s7_value(F.col("data_type"), F.col("buf"), F.col("bit_off")).alias("native"),
        s7_value_pandas(F.col("data_type"), F.col("buf"), F.col("bit_off")).alias("udf"),
    ).collect()
    for r in both:
        if r["native"] is None:
            assert r["udf"] is None
        else:
            assert r["udf"] == pytest.approx(r["native"], rel=1e-9)


def test_strict_reference_byte_quirk(spark):
    """Reference decodes Byte with the 2-byte signed getter
    (Linux/InfluxConnector2.py:152-153): 0xC8 0x00 → 51200-65536."""
    rows = [("S7WLByte", bytes([200, 0]), None, None)]
    out = _decode_df(spark, rows, strict_reference=True)
    assert out[0]["v"] == float(200 * 256 - 65536)
    out_correct = _decode_df(spark, rows)
    assert out_correct[0]["v"] == 200.0


def test_property_roundtrip(spark):
    """decode(encode(x)) == x across representative ranges per type."""
    import random

    rng = random.Random(42)
    cases = []
    for _ in range(200):
        f = struct.unpack(">f", struct.pack(">f", rng.uniform(-1e6, 1e6)))[0]
        cases.append(("S7WLReal", struct.pack(">f", f), None, f))
        u = rng.randrange(2**32)
        cases.append(("S7WLDWord", struct.pack(">I", u), None, float(u)))
        w = rng.randrange(-(2**15), 2**15)
        cases.append(("S7WLWord", struct.pack(">h", w), None, float(w)))
        b = rng.randrange(256)
        cases.append(("S7WLByte", bytes([b, 0]), None, float(b)))
        bit = rng.randrange(8)
        byte = rng.randrange(256)
        cases.append(("S7WLBit", bytes([byte]), bit, float((byte >> bit) & 1)))
    out = _decode_df(spark, cases)
    for row, (dt, _, _, expected) in zip(out, cases):
        assert row["v"] == pytest.approx(expected, rel=1e-6, abs=1e-30), dt
