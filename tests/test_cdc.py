"""Content-defined chunking (operators/cdc.py) invariants.

The registry sweep (test_registry.py) hash-checks the full
b19_cdc_chunk_dedup pipeline against DuckDB; these tests pin the
operator-level contracts the oracle can't see: the windowed-sum /
sequential-recurrence identity, payload reassembly, the max-chunk
bound, full dedup of identical blobs, and the boundary-resync property
that is CDC's whole reason to exist (an insert shifts every fixed-size
block but only a bounded neighborhood of content-defined chunks).
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from iot_system_plc_data_to_influxdb_spark.operators.cdc import (  # noqa: E402
    _GEAR,
    cdc_chunks,
    chunk_hash,
    chunk_spans,
    gear_mask_values,
)


def _sequential_masked(data, mask_bits):
    """The textbook Gear recurrence, full 64-bit state, masked at the
    end — the ground truth the vectorized windowed sum must equal."""
    g = _GEAR()
    h = np.uint64(0)
    out = []
    with np.errstate(over="ignore"):
        for b in data:
            h = h * np.uint64(2) + g[b]
            out.append(int(h) & ((1 << mask_bits) - 1))
    return np.array(out)


@pytest.mark.parametrize("mask_bits", [6, 10, 13])
def test_windowed_sum_equals_sequential_recurrence(mask_bits):
    rng = np.random.default_rng(mask_bits)
    data = rng.integers(0, 256, size=3000, dtype=np.uint8)
    assert (
        gear_mask_values(data, mask_bits)
        == _sequential_masked(data, mask_bits)
    ).all()


def test_chunks_partition_payload_and_respect_max():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, size=5000, dtype=np.uint8)
    spans = chunk_spans(data, mask_bits=6, max_chunk=512)
    assert spans[0][0] == 0 and spans[-1][1] == len(data)
    for (s0, e0), (s1, _) in zip(spans, spans[1:]):
        assert e0 == s1  # contiguous, no gap/overlap
    assert all(1 <= e - s <= 512 for s, e in spans)


def test_max_chunk_subdivision_is_stateless():
    # all-zero bytes: GEAR[0]'s masked sum never lands on 0 for this
    # table at 6 bits unless by construction — force the degenerate
    # no-boundary case with a mask that can't fire, then the whole
    # blob must come back as fixed 512-byte strides.
    data = np.zeros(2000, dtype=np.uint8)
    hm = gear_mask_values(data, 6)
    if (hm[:-1] == 0).any():
        pytest.skip("constant corpus happens to produce gear boundaries")
    spans = chunk_spans(data, mask_bits=6, max_chunk=512)
    assert spans == [(0, 512), (512, 1024), (1024, 1536), (1536, 2000)]


def test_identical_blobs_dedup_fully():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, size=4096, dtype=np.uint8)
    h1 = [chunk_hash(data[s:e]) for s, e in chunk_spans(data, 6, 512)]
    h2 = [chunk_hash(data[s:e]) for s, e in chunk_spans(data, 6, 512)]
    assert h1 == h2 and len(h1) > 10


def test_insert_resyncs_boundaries_fixed_blocks_do_not():
    """Prepend 7 bytes: content-defined chunks re-align after the
    first post-insert boundary, fixed-size 64-byte blocks never do."""
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, size=8192, dtype=np.uint8)
    shifted = np.concatenate(
        [rng.integers(0, 256, size=7, dtype=np.uint8), data]
    )

    def hashes(d):
        return [chunk_hash(d[s:e]) for s, e in chunk_spans(d, 6, 512)]

    base, shift = set(hashes(data)), set(hashes(shifted))
    cdc_shared = len(base & shift) / len(base)
    assert cdc_shared > 0.9, f"CDC resync too weak: {cdc_shared}"

    def fixed(d):
        return {
            chunk_hash(d[i : i + 64]) for i in range(0, len(d) - 63, 64)
        }

    fixed_shared = len(fixed(data) & fixed(shifted)) / len(fixed(data))
    assert fixed_shared < 0.05, f"fixed blocking resynced?! {fixed_shared}"


def test_empty_payload_yields_no_chunks():
    assert chunk_spans(np.array([], dtype=np.uint8)) == []


def test_cdc_chunks_dataframe_matches_reference(spark):
    rng = np.random.default_rng(4)
    blobs = [
        bytes(rng.integers(0, 256, size=n, dtype=np.uint8).tolist())
        for n in (0, 700, 2048)
    ]
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)], "doc_id long, payload binary"
    )
    got = {
        (r.doc_id, r.chunk_ord): (r.chunk_start, r.chunk_len, r.chunk_hash)
        for r in cdc_chunks(df).collect()
    }
    want = {}
    for i, b in enumerate(blobs):
        data = np.frombuffer(b, dtype=np.uint8)
        for ordn, (s, e) in enumerate(chunk_spans(data, 6, 512)):
            want[(i, ordn)] = (s, e - s, chunk_hash(data[s:e]))
    assert got == want


def test_cdc_dedup_stream_writes_only_novel_chunks(spark, tmp_path):
    """Streaming twin contract: batch 2 re-sends blob A (zero novel
    chunks) and a half-overlapping blob (only the novel half's chunks
    emitted). Verified against the batch operator's first-occurrence
    set over the same blobs in the same order."""
    import glob
    import os
    import shutil
    import time as _time

    from pyspark.sql import functions as F

    from iot_system_plc_data_to_influxdb_spark.streaming.curation import (
        cdc_dedup_stream,
    )

    rng = np.random.default_rng(11)
    blob_a = bytes(rng.integers(0, 256, size=4096, dtype=np.uint8).tolist())
    blob_b = bytes(rng.integers(0, 256, size=4096, dtype=np.uint8).tolist())
    # half of A, half new — CDC should re-emit only the new half's chunks
    blob_c = blob_a[:2048] + bytes(
        rng.integers(0, 256, size=2048, dtype=np.uint8).tolist()
    )
    batches = [
        [("2024-01-01 00:00:01", 1, blob_a), ("2024-01-01 00:00:02", 2, blob_b)],
        [("2024-01-01 00:00:11", 3, blob_a), ("2024-01-01 00:00:12", 4, blob_c)],
    ]
    dst = str(tmp_path / "blobs")
    os.makedirs(dst, exist_ok=True)
    t0 = _time.time() - 100
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, "ingest_ts string, doc_id bigint, payload binary"
        ).select(F.col("ingest_ts").cast("timestamp"), "doc_id", "payload")
        stage = str(tmp_path / f"stage{i}")
        df.coalesce(1).write.parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        out = os.path.join(dst, f"{i:04d}.parquet")
        shutil.copy(part, out)
        os.utime(out, (t0 + i * 10, t0 + i * 10))

    stream = (
        spark.readStream.schema(
            "ingest_ts timestamp, doc_id bigint, payload binary"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(dst)
    )
    got = []
    q = (
        cdc_dedup_stream(stream, watermark="5 minutes")
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: got.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # ground truth: first occurrence over blobs in arrival order
    seen, want = set(), []
    for doc_id, blob in [(1, blob_a), (2, blob_b), (3, blob_a), (4, blob_c)]:
        data = np.frombuffer(blob, dtype=np.uint8)
        for s, e in chunk_spans(data, 6, 512):
            h = chunk_hash(data[s:e])
            if h not in seen:
                seen.add(h)
                want.append((doc_id, h))
    got_pairs = sorted((r.doc_id, r.chunk_hash) for r in got)
    assert got_pairs == sorted(want)
    # doc 3 (exact re-send) contributed nothing
    assert not any(d == 3 for d, _ in got_pairs)
    # doc 4 contributed SOME chunks (its novel half) but fewer than a
    # fresh blob would — the resync property, end-to-end
    n4 = sum(1 for d, _ in got_pairs if d == 4)
    data_c = np.frombuffer(blob_c, dtype=np.uint8)
    assert 0 < n4 < len(chunk_spans(data_c, 6, 512))


# -- hypothesis properties (no Spark) --------------------------------------
from hypothesis import given, settings, strategies as st  # noqa: E402

_BLOB = st.binary(min_size=0, max_size=6000)


@settings(max_examples=25, deadline=None)
@given(_BLOB)
def test_property_spans_partition_any_payload(blob):
    data = np.frombuffer(blob, dtype=np.uint8)
    spans = chunk_spans(data, 6, 512)
    if len(data) == 0:
        assert spans == []
        return
    assert spans[0][0] == 0 and spans[-1][1] == len(data)
    assert all(e0 == s1 for (_, e0), (s1, _) in zip(spans, spans[1:]))
    assert all(1 <= e - s <= 512 for s, e in spans)


@settings(max_examples=15, deadline=None)
@given(_BLOB, st.binary(min_size=1, max_size=64))
def test_property_edit_divergence_is_bounded(blob, prefix):
    """THE content-defined guarantee, as a hard bound: gear state
    spans exactly mask_bits bytes, so after prepending arbitrary
    bytes, every GEAR BOUNDARY at offset >= mask_bits past the splice
    exists in both streams (shifted by the prefix length) — divergence
    is confined to a bounded neighborhood of the edit, it never
    propagates to the whole stream the way fixed-size blocking does.
    (Stated on raw boundaries, not final spans: max-chunk stride
    splits inside a gap that STRADDLES the splice legitimately shift —
    that subdivision is relative to the gap start by design.)"""
    data = np.frombuffer(blob, dtype=np.uint8)
    if len(data) < 64:
        return
    pre = np.frombuffer(prefix, dtype=np.uint8)
    combined = np.concatenate([pre, data])
    hm_a = gear_mask_values(data, 6)
    hm_b = gear_mask_values(combined, 6)
    cuts_a = {int(i) + 1 for i in np.nonzero(hm_a[:-1] == 0)[0] if i + 1 >= 6}
    cuts_b = {
        int(i) + 1 - len(pre)
        for i in np.nonzero(hm_b[:-1] == 0)[0]
        if i + 1 - len(pre) >= 6
    }
    assert cuts_a == cuts_b
