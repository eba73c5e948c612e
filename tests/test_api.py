"""End-to-end facade test: config → acquisition → query surface —
the reference user's complete workflow on Spark.
"""

import os
import tempfile
import time

from pyspark.sql import functions as F

from iot_system_plc_data_to_influxdb_spark.api import IoTEngine
from iot_system_plc_data_to_influxdb_spark.plans.config_plane import config_df
from iot_system_plc_data_to_influxdb_spark.sources.config import write_config


def test_full_workflow(spark):
    with tempfile.TemporaryDirectory() as tmp:
        cfg_path = os.path.join(tmp, "plc.xml")
        write_config(config_df(spark), cfg_path)

        engine = IoTEngine(spark, config_path=cfg_path)
        assert engine.config.count() == 12

        # daemon: acquire a few micro-batches into the points table
        table = os.path.join(tmp, "points")
        q = engine.start_acquisition(table, os.path.join(tmp, "ckpt"))
        deadline = time.time() + 60
        while time.time() < deadline and q.lastProgress is None:
            time.sleep(0.5)
        time.sleep(2)
        q.stop()

        pts = engine.points(table)
        n = pts.count()
        assert n > 0
        # active tags only: the inactive DWord and the Counter/Timer
        # rows must never appear (A2 + A9)
        aliases = {r["alias"] for r in pts.select("alias").distinct().collect()}
        assert "total_count" not in aliases  # inactive
        assert "cycles" not in aliases and "cycle_time" not in aliases  # null gate

        # current values: one row per (plc, alias)
        cv = engine.current_values(pts)
        assert cv.count() == pts.select("plc_ip", "alias").distinct().count()

        # downsample + gap fill run and keep key cardinality
        ds = engine.downsample(pts, "1 minute")
        assert ds.count() >= cv.count()
        filled = engine.fill_previous(pts, "1 minute")
        assert filled.filter(F.col("last_value_filled").isNull()).count() == 0

        # batch decode path over a batch read of the same source
        raw = spark.read.format("plc_sim").option("polls", "2").load()
        decoded = engine.decode_batch(raw)
        assert decoded.count() == 18
