"""A14 parity: the reference's reconnect-and-continue loop
(Linux/InfluxConnector2.py:187-195) becomes checkpoint-based recovery —
a restarted query resumes from committed offsets (replaying at most the
one uncommitted batch) with no gaps in the poll sequence.
"""

import os
import tempfile
import time

from iot_system_plc_data_to_influxdb_spark.sources import plc as plc_src


def _run_until(spark, ckpt, out_rows, min_batches, timeout=60):
    raw = spark.readStream.format("plc_sim").option("pollsPerBatch", "1").load()
    seen = []
    q = (
        raw.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(
            lambda df, bid: seen.append(sorted({r["poll"] for r in df.collect()}))
        )
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + timeout
    while time.time() < deadline and len(seen) < min_batches:
        time.sleep(0.3)
    q.stop()
    out_rows.extend(seen)


def test_restart_resumes_from_checkpoint(spark):
    plc_src.register(spark)
    with tempfile.TemporaryDirectory() as tmp:
        ckpt = os.path.join(tmp, "ckpt")
        run1, run2 = [], []
        _run_until(spark, ckpt, run1, min_batches=3)
        assert len(run1) >= 2
        polls1 = sorted(p for batch in run1 for p in batch)
        # poll sequence is contiguous from 0
        assert polls1 == list(range(len(polls1)))

        _run_until(spark, ckpt, run2, min_batches=2)
        assert run2, "restarted query produced no batches"
        polls2 = sorted(p for batch in run2 for p in batch)
        # resumes at (or replays exactly) the frontier — never gaps,
        # never restarts from zero
        assert polls2[0] in (polls1[-1], polls1[-1] + 1)
        assert polls2 == list(range(polls2[0], polls2[0] + len(polls2)))
