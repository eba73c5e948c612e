"""PLC polling source (SURVEY.md A5) as a PySpark Python DataSource.

The reference polls Siemens S7 PLC memory via snap7 inside hand-rolled
process/thread loops (Linux/InfluxConnector2.py:142-160,197-209,282-302).
Here the same acquisition is a Spark DataSource usable as
``spark.read.format(...)`` (one poll sweep) or ``spark.readStream``
(micro-batch per poll; offsets = poll sequence numbers, so restart
semantics come from Spark checkpointing instead of the reference's
reconnect loop, A14).

Backends:
- **simulator** (default): deterministic synthetic byte buffers per
  (tag, poll) — CI has no PLC. Values follow simple per-type ramps so
  tests can assert exact decodes.
- **snap7**: the production backend, constructed lazily per partition
  (one connection per PLC group, mirroring A3); import-gated because
  the library is absent in this environment.

Partitioning: one input partition per PLC (A3's process-per-PLC), so a
1000-PLC fleet fans out across executors with per-partition connection
reuse — the scalable shape of the reference's multiprocessing scheme.
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

READING_SCHEMA = (
    "poll bigint, ts timestamp, plc_ip string, alias string, "
    "data_type string, data_area string, address string, bit_off int, buf binary"
)

# Default tag list (mirrors plans.config_plane.CONFIG_ROWS actives).
DEFAULT_TAGS = [
    ("192.168.0.10", "S7WLReal", "S7AreaDB", "DB10.DBD0", "boiler_temp"),
    ("192.168.0.10", "S7WLWord", "S7AreaDB", "DB10.DBW4", "boiler_rpm"),
    ("192.168.0.10", "S7WLBit", "S7AreaPE", "I0.1", "door_open"),
    ("192.168.0.10", "S7WLByte", "S7AreaMK", "M12", "mode_code"),
    ("192.168.0.11", "S7WLReal", "S7AreaPA", "QD16", "valve_pos"),
    ("192.168.0.11", "S7WLBit", "S7AreaDB", "DB5.DBX2.7", "alarm"),
    ("192.168.0.11", "S7WLWord", "S7AreaPE", "IW6", "line_speed"),
    ("192.168.0.12", "S7WLDWord", "S7AreaMK", "MD100", "uptime_s"),
    ("192.168.0.12", "S7WLByte", "S7AreaPA", "QB3", "out_flags"),
]

_EPOCH_BASE = 1704067200  # 2024-01-01T00:00:00Z — deterministic poll clock


def simulate_buffer(data_type: str, alias: str, poll: int) -> bytes:
    """Deterministic snap7-style big-endian buffer for (tag, poll).

    Ramps chosen so every decoded value is exactly representable and
    easy to assert: Real = seed + poll/4, Word = (seed*7 + poll) wrap
    signed, DWord crosses 2³¹, Byte wraps 0..255, Bit alternates.
    """
    seed = sum(ord(c) for c in alias)
    if data_type == "S7WLReal":
        return struct.pack(">f", float(seed) + poll * 0.25)
    if data_type == "S7WLDWord":
        return struct.pack(">I", (2147483000 + seed * 1000 + poll) % (2**32))
    if data_type == "S7WLWord":
        return struct.pack(">H", (seed * 7 + poll * 3) % (2**16))
    if data_type == "S7WLByte":
        return struct.pack(">B", (seed + poll) % 256)
    if data_type == "S7WLBit":
        return struct.pack(">B", 0b10101010 if (poll + seed) % 2 else 0b01010101)
    # Counter/Timer: reference never decodes these — emit junk the
    # null gate (A9) must drop.
    return b"\x00\x00"


@dataclass
class _PlcPartition(InputPartition):
    plc_ip: str
    polls: Sequence[int]


class PLCSimBatchReader(DataSourceReader):
    def __init__(self, options):
        self.tags = _tags_from_options(options)
        self.n_polls = int(options.get("polls", "3"))

    def partitions(self):
        ips = sorted({ip for ip, *_ in self.tags})
        return [_PlcPartition(ip, range(self.n_polls)) for ip in ips]

    def read(self, partition: _PlcPartition) -> Iterator[tuple]:
        yield from _poll_rows(self.tags, partition.plc_ip, partition.polls)


class PLCSimStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch poll loop: offset = poll counter; each read() is one
    sweep over every tag of every PLC (the reference's update_items)."""

    def __init__(self, options):
        self.tags = _tags_from_options(options)
        self.polls_per_batch = int(options.get("pollsPerBatch", "1"))

    def initialOffset(self):
        return {"poll": 0}

    def read(self, start: dict):
        first = start["poll"]
        polls = range(first, first + self.polls_per_batch)
        rows = []
        for ip in sorted({ip for ip, *_ in self.tags}):
            rows.extend(_poll_rows(self.tags, ip, polls))
        return iter(rows), {"poll": first + self.polls_per_batch}

    def readBetweenOffsets(self, start: dict, end: dict):
        polls = range(start["poll"], end["poll"])
        rows = []
        for ip in sorted({ip for ip, *_ in self.tags}):
            rows.extend(_poll_rows(self.tags, ip, polls))
        return iter(rows)


def _tags_from_options(options) -> list[tuple]:
    raw = options.get("tags")
    if raw:
        return [tuple(t) for t in json.loads(raw)]
    return list(DEFAULT_TAGS)


def _address_numbers(address: str) -> list[int]:
    import re

    return [int(x) for x in re.findall(r"[0-9]+", address)]


def _poll_rows(tags, plc_ip: str, polls) -> Iterator[tuple]:
    import datetime

    for poll in polls:
        ts = datetime.datetime.utcfromtimestamp(_EPOCH_BASE + poll)
        for ip, data_type, data_area, address, alias in tags:
            if ip != plc_ip:
                continue
            nums = _address_numbers(address)
            if data_area == "S7AreaDB":
                bit_off = nums[2] if len(nums) > 2 else None
            else:
                bit_off = nums[1] if len(nums) > 1 else None
            yield (
                poll,
                ts,
                ip,
                alias,
                data_type,
                data_area,
                address,
                bit_off,
                simulate_buffer(data_type, alias, poll),
            )


class PLCSimDataSource(DataSource):
    """format("plc_sim") — registered via spark.dataSource.register."""

    @classmethod
    def name(cls):
        return "plc_sim"

    def schema(self):
        return READING_SCHEMA

    def reader(self, schema: StructType):
        return PLCSimBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return PLCSimStreamReader(self.options)


def try_snap7_backend():
    """Production backend hook: returns the snap7 module or None.

    The real reader would open one snap7 client per partition (per PLC,
    A3) and call ``read_area(area, db, offset, size)`` exactly as
    Linux/InfluxConnector2.py:142-160 does; unavailable in CI.
    """
    try:  # pragma: no cover - snap7 not installed here
        import snap7  # type: ignore

        return snap7
    except ImportError:
        return None


def register(spark) -> None:
    spark.dataSource.register(PLCSimDataSource)
