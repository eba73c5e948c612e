"""Config plane round-trip: XML ↔ DataFrame ↔ CRUD (A1, A18–A23)."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from iot_system_plc_data_to_influxdb_spark.plans.config_plane import (
    CONFIG_ROWS,
    config_df,
)
from iot_system_plc_data_to_influxdb_spark.sources.config import (
    ConfigValidationError,
    parse_config_xml,
    read_config,
    write_config,
)

SAMPLE_XML = """<communication>
  <plc slot="1">192.168.0.10
    <data>
      <data_type>S7WLReal</data_type>
      <data_area>S7AreaDB</data_area>
      <data_address>DB10.DBD0</data_address>
      <data_alias>boiler_temp</data_alias>
      <active>True</active>
      <interval>1s</interval>
    </data>
    <data>
      <data_type>S7WLBit</data_type>
      <data_area>S7AreaPE</data_area>
      <data_address>I0.1</data_address>
      <data_alias>door_open</data_alias>
      <active>False</active>
      <interval>min</interval>
    </data>
  </plc>
  <plc slot="2">192.168.0.11
    <data>
      <data_type>S7WLWord</data_type>
      <data_area>S7AreaPE</data_area>
      <data_address>IW6</data_address>
      <data_alias>line_speed</data_alias>
      <active>True</active>
      <interval>10s</interval>
    </data>
  </plc>
</communication>
"""


def _write(tmp, content):
    p = os.path.join(tmp, "config.xml")
    with open(p, "w") as f:
        f.write(content)
    return p


def test_parse_reference_xml_shape():
    with tempfile.TemporaryDirectory() as tmp:
        rows = parse_config_xml(_write(tmp, SAMPLE_XML))
    assert rows[0] == (
        "192.168.0.10", 1, "S7WLReal", "S7AreaDB", "DB10.DBD0",
        "boiler_temp", True, "1s",
    )
    assert rows[1][6] is False
    assert rows[2][0] == "192.168.0.11" and rows[2][1] == 2


def test_windows_variant_missing_interval_defaults_min():
    """Windows my_data has no interval (Windows/InfluxConnector2.py:35-43)."""
    xml = SAMPLE_XML.replace("<interval>1s</interval>", "")
    with tempfile.TemporaryDirectory() as tmp:
        rows = parse_config_xml(_write(tmp, xml))
    assert rows[0][7] == "min"


def test_invalid_enum_rejected_not_evaled():
    """The reference eval()s these strings; we validate instead."""
    evil = SAMPLE_XML.replace("S7WLReal", "__import__('os').getcwd()")
    with tempfile.TemporaryDirectory() as tmp:
        with pytest.raises(ConfigValidationError):
            parse_config_xml(_write(tmp, evil))


def test_roundtrip_read_write_read(spark):
    df = config_df(spark)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "out.xml")
        write_config(df, path)
        back = read_config(spark, path)
        assert sorted(map(tuple, back.collect())) == sorted(CONFIG_ROWS)


def test_crud_cycle(spark):
    """A18 insert → A23 update → A22 delete, persisted through XML."""
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "cfg.xml")
        write_config(config_df(spark), path)

        cfg = read_config(spark, path)
        new = spark.createDataFrame(
            [("10.0.0.1", 3, "S7WLReal", "S7AreaDB", "DB9.DBD4", "pressure", True, "5s")],
            cfg.schema,
        )
        cfg = cfg.unionByName(new)  # A18
        key = (F.col("plc_ip") == "10.0.0.1") & (F.col("alias") == "pressure")
        cfg = cfg.select(  # A23: flip active
            *[c for c in cfg.columns if c != "active"],
            F.when(key, F.lit(False)).otherwise(F.col("active")).alias("active"),
        ).select(cfg.columns)
        cfg = cfg.filter(  # A22: delete a different row
            ~((F.col("plc_ip") == "192.168.0.10") & (F.col("alias") == "cycles"))
        )
        write_config(cfg, path)

        final = read_config(spark, path)
        assert final.count() == len(CONFIG_ROWS)  # +1 insert, -1 delete
        row = final.filter(key).collect()
        assert len(row) == 1 and row[0]["active"] is False
        assert final.filter(F.col("alias") == "cycles").count() == 0
