"""S7 typed-buffer decode (SURVEY.md A7/A8/A9).

The reference decodes snap7 byte buffers with an if/elif chain over the
declared type (Linux/InfluxConnector2.py:141-170): S7WLReal →
big-endian IEEE-754 float32, S7WLDWord → unsigned 32-bit, S7WLWord →
signed 16-bit, S7WLByte → (quirk) the 2-byte signed getter, S7WLBit →
``int(get_bool(buf, 0, bit))``; Counter/Timer fall through to None and
are dropped (:172, the null gate A9).

Two implementations:

- ``s7_value``: pure Catalyst expressions over a BINARY buffer —
  hex→conv for the integer view, explicit IEEE-754 field algebra for
  Real. Stays inside whole-stage codegen; this is the hot path.
- ``s7_value_pandas``: Arrow-batched pandas UDF using struct.unpack —
  the B30 cross-check and the template for decoders that genuinely
  need Python.

``strict_reference=True`` reproduces the reference's Byte quirk
(decode via the signed 16-bit getter); the default decodes Byte
correctly as unsigned 8-bit — a documented deviation (SURVEY.md §2
notes, §7 risk register).
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

DECODABLE_TYPES = ("S7WLReal", "S7WLDWord", "S7WLWord", "S7WLByte", "S7WLBit")
ALL_TYPES = DECODABLE_TYPES + ("S7WLCounter", "S7WLTimer")


def _u(buf: Column, start: int, nbytes: int) -> Column:
    """Unsigned big-endian integer view of buf[start:start+nbytes]."""
    return F.conv(F.hex(F.substring(buf, start + 1, nbytes)), 16, 10).cast("bigint")


def _signed16(u16: Column) -> Column:
    return F.when(u16 >= 32768, u16 - 65536).otherwise(u16)


def _real_from_u32(u32: Column) -> Column:
    """IEEE-754 binary32 from its unsigned integer representation.

    Exact for normal floats: sign·(1 + frac/2²³)·2^(exp−127); zero and
    subnormals map through the subnormal branch; Inf/NaN are null-gated
    (a PLC Real of Inf/NaN carries no process value).
    """
    sign = F.when((u32 / F.lit(2147483648)).cast("bigint") == 1, F.lit(-1.0)).otherwise(
        F.lit(1.0)
    )
    exp = ((u32 % 2147483648) / F.lit(8388608)).cast("bigint")
    frac = (u32 % 8388608).cast("double")
    normal = sign * (F.lit(1.0) + frac / F.lit(8388608.0)) * F.pow(
        F.lit(2.0), (exp - 127).cast("double")
    )
    subnormal = sign * (frac / F.lit(8388608.0)) * F.pow(F.lit(2.0), F.lit(-126.0))
    return (
        F.when(exp == 255, F.lit(None).cast("double"))
        .when(exp == 0, subnormal)
        .otherwise(normal)
    )


def s7_value(
    data_type: Column,
    buf: Column,
    bit_offset: Column,
    *,
    strict_reference: bool = False,
) -> Column:
    """Decode a raw S7 buffer to DOUBLE by declared type (CASE chain).

    Unknown/untested types (Counter/Timer) yield NULL — callers apply
    the A9 null gate ``filter(value.isNotNull())``.
    """
    byte_decode = (
        # Reference quirk: byte buffers decoded via the 2-byte signed
        # getter (Linux/InfluxConnector2.py:152-153).
        _signed16(_u(buf, 0, 2)) if strict_reference else _u(buf, 0, 1)
    )
    return (
        F.when(data_type == "S7WLReal", _real_from_u32(_u(buf, 0, 4)))
        .when(data_type == "S7WLDWord", _u(buf, 0, 4).cast("double"))
        .when(data_type == "S7WLWord", _signed16(_u(buf, 0, 2)).cast("double"))
        .when(data_type == "S7WLByte", byte_decode.cast("double"))
        .when(
            data_type == "S7WLBit",
            # int(get_bool(buf, 0, bit)) — A8's bool→int projection.
            # (buf[0] >> bit) & 1 via arithmetic (shiftright() takes only
            # literal shift amounts; bit_offset is a column).
            (
                F.floor(
                    _u(buf, 0, 1).cast("double")
                    / F.pow(F.lit(2.0), F.coalesce(bit_offset, F.lit(0)).cast("double"))
                ).cast("bigint")
                % 2
            ).cast("double"),
        )
        .otherwise(F.lit(None).cast("double"))
    )


@F.pandas_udf(DoubleType())
def s7_value_pandas(
    data_type: pd.Series, buf: pd.Series, bit_offset: pd.Series
) -> pd.Series:
    """Arrow-batched decode twin of ``s7_value`` (B30 cross-check)."""

    def one(dt, b, bit):
        if b is None:
            return None
        b = bytes(b)
        try:
            if dt == "S7WLReal":
                v = struct.unpack(">f", b[:4])[0]
                return None if v != v or v in (float("inf"), float("-inf")) else float(v)
            if dt == "S7WLDWord":
                return float(struct.unpack(">I", b[:4])[0])
            if dt == "S7WLWord":
                return float(struct.unpack(">h", b[:2])[0])
            if dt == "S7WLByte":
                return float(b[0])
            if dt == "S7WLBit":
                return float((b[0] >> int(bit or 0)) & 1)
        except (struct.error, IndexError):
            return None
        return None

    return pd.Series(
        [one(dt, b, bit) for dt, b, bit in zip(data_type, buf, bit_offset)]
    )
