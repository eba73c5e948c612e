"""XML config plane (SURVEY.md A1, A18–A24).

The reference stores acquisition config as an XML document
(``<communication><plc slot="1">IP<data>…</data></plc></communication>``)
written by the GUI (ConfigApp/ConfigApp.py:54-84) and read positionally
— ``data[0..5]`` = type, area, address, alias, active, interval
(Linux/InfluxConnector2.py:261) — with values revived via ``eval()``
(Linux/InfluxConnector2.py:47-52), re-parsing the file on every
operation (ConfigApp.py:50,91,108,127,145,163).

This module replaces that with:
- one parse into a typed DataFrame (closed-enum validated, no eval);
- CRUD as pure relational ops (plans/config_plane.py);
- an explicit save that serializes back to the reference's exact XML
  shape, so existing config files round-trip byte-compatibly in
  structure.

The config is tiny (KBs) — parsing happens driver-side and the result
is a broadcastable dimension table, which is what the decode join
wants at scale.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.dom import minidom

from pyspark.sql import DataFrame, SparkSession

CONFIG_SCHEMA = (
    "plc_ip string, slot int, data_type string, data_area string, "
    "address string, alias string, active boolean, poll_interval string"
)

# Closed enums from the GUI (ConfigApp/ConfigApp.py:185-187); replaces
# the reference's eval() of these strings into snap7 constants.
VALID_TYPES = {
    "S7WLBit", "S7WLByte", "S7WLWord", "S7WLDWord", "S7WLReal",
    "S7WLCounter", "S7WLTimer",
}
VALID_AREAS = {"S7AreaPE", "S7AreaPA", "S7AreaMK", "S7AreaDB", "S7AreaCT", "S7AreaTM"}
VALID_INTERVALS = {"min", "1s", "2s", "5s", "10s", "60s", "300s"}

_CHILD_ORDER = ("data_type", "data_area", "data_address", "data_alias", "active", "interval")


class ConfigValidationError(ValueError):
    pass


def _parse_bool(s: str) -> bool:
    if s in ("True", "true", "1"):
        return True
    if s in ("False", "false", "0"):
        return False
    raise ConfigValidationError(f"invalid boolean {s!r}")


def parse_config_xml(path: str) -> list[tuple]:
    """XML → typed rows, with closed-enum validation (no eval)."""
    root = ET.parse(path).getroot()
    rows = []
    for plc in root.findall("plc"):
        plc_ip = (plc.text or "").strip()
        slot = int(plc.get("slot", "1"))
        for data in plc.findall("data"):
            # positional children, as the reference reads them
            # (Linux/InfluxConnector2.py:261)
            vals = [(child.text or "").strip() for child in data]
            if len(vals) < 5:
                raise ConfigValidationError(
                    f"<data> needs >=5 children, got {len(vals)}"
                )
            dt, area, address, alias = vals[0], vals[1], vals[2], vals[3]
            active = _parse_bool(vals[4])
            # Windows variant has no interval element
            # (Windows/InfluxConnector2.py:35-43) → default 'min'.
            interval = vals[5] if len(vals) > 5 else "min"
            if dt not in VALID_TYPES:
                raise ConfigValidationError(f"invalid data_type {dt!r}")
            if area not in VALID_AREAS:
                raise ConfigValidationError(f"invalid data_area {area!r}")
            if interval not in VALID_INTERVALS:
                raise ConfigValidationError(f"invalid interval {interval!r}")
            rows.append((plc_ip, slot, dt, area, address, alias, active, interval))
    return rows


def read_config(spark: SparkSession, path: str) -> DataFrame:
    return spark.createDataFrame(parse_config_xml(path), CONFIG_SCHEMA)


def write_config(df: DataFrame, path: str) -> None:
    """Serialize back to the reference's XML shape (ConfigApp.py:54-84)."""
    root = ET.Element("communication")
    rows = df.collect()
    by_plc: dict[tuple, list] = {}
    for r in rows:
        by_plc.setdefault((r["plc_ip"], r["slot"]), []).append(r)
    for (ip, slot), tags in by_plc.items():
        plc = ET.SubElement(root, "plc", attrib={"slot": str(slot)})
        plc.text = ip
        for r in tags:
            data = ET.SubElement(plc, "data")
            vals = (
                r["data_type"],
                r["data_area"],
                r["address"],
                r["alias"],
                str(r["active"]),
                r["poll_interval"],
            )
            for name, val in zip(_CHILD_ORDER, vals):
                ET.SubElement(data, name).text = val
    pretty = minidom.parseString(ET.tostring(root)).toprettyxml(indent="  ")
    # remove_empty_lines (ConfigApp.py:18-32) equivalent
    lines = [ln for ln in pretty.splitlines() if ln.strip()]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
