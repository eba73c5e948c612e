"""S7 address-string parsing (SURVEY.md A6).

The reference extracts every digit run with ``re.findall('[0-9]+', s)``
(``getNumbers``, Linux/InfluxConnector2.py:212-219) and consumes them
positionally: DB area → (db_number, byte_offset[, bit_offset]);
PE/PA/MK areas → (byte_offset[, bit_offset])
(Linux/InfluxConnector2.py:139-170).

Here that is a native Catalyst expression — ``regexp_extract_all`` plus
0-based ``F.get`` (NULL out of range, ANSI-safe), no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DB_AREAS = ("S7AreaDB",)


def address_numbers(address: Column) -> Column:
    """All digit runs in the address, as ARRAY<INT>.

    'DB10.DBW0' → [10, 0]; 'I0.1' → [0, 1]; 'QW20' → [20].
    """
    return F.transform(
        F.regexp_extract_all(address, F.lit(r"([0-9]+)"), 1),
        lambda x: x.cast("int"),
    )


def parse_address(area: Column, address: Column) -> Column:
    """STRUCT<db_number INT, byte_offset INT, bit_offset INT>.

    DB area consumes numbers positionally as (db, byte[, bit]); other
    areas as (byte[, bit]); missing positions are NULL (the reference
    would IndexError — we null-gate instead, matching A9).
    """
    nums = address_numbers(address)
    is_db = area.isin(*DB_AREAS)
    return F.struct(
        F.when(is_db, F.get(nums, 0)).alias("db_number"),
        F.when(is_db, F.get(nums, 1)).otherwise(F.get(nums, 0)).alias("byte_offset"),
        F.when(is_db, F.get(nums, 2)).otherwise(F.get(nums, 1)).alias("bit_offset"),
    )
