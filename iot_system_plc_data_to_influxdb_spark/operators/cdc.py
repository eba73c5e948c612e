"""Content-defined chunking (CDC) — Gear rolling-hash chunk
boundaries over opaque binary columns, the storage-dedup primitive
(LBFS/FastCDC family) a 100 TB multimodal lake needs: near-identical
blobs (re-encoded crawls, appended logs, re-exported media) share most
of their content, and fixed-size blocks cannot see that — one inserted
byte shifts every later block. Content-defined boundaries re-align
after an edit, so identical regions hash to identical chunks no matter
where they sit in the stream.

Reference scope note: the reference pipeline (Linux/
InfluxConnector2.py) ships raw PLC payloads; chunk-level dedup is part
of the brief's training-data-pipeline extension surface, not a port.

Algorithm (Gear, the FastCDC base hash):

    h_i = (h_{i-1} * 2 + GEAR[b_i])  mod 2^64,   h before each blob = 0
    boundary AFTER position i  iff  h_i & MASK == 0

Because the recurrence doubles h each step, the byte at distance k
contributes ``GEAR[b] << k`` — everything at distance >= w vanishes
from the low w bits. So the boundary predicate on a w-bit mask is a
pure WINDOWED SUM over the last w bytes:

    h_i & (2^w - 1) == ( sum_{k=0..w-1} GEAR[b_{i-k}] << k ) & (2^w - 1)

That identity is what makes the operator oracle-checkable: DuckDB
reproduces the predicate with a bounded self-join (positions x offsets
0..w-1), no per-byte recursion — and it is also why the Spark side can
vectorize boundary detection with numpy shifted adds instead of a
per-byte Python loop. ``tests/test_cdc.py`` pins the identity against
the sequential full-64-bit recurrence.

No minimum-chunk constraint: FastCDC's min-size skip makes each
boundary depend on the previous one (a sequential scan); plain Gear
boundaries are position-independent, so chunking parallelizes
per-blob with no cross-chunk state. A MAXIMUM size is enforced as a
stateless post-pass (oversized gaps split at fixed strides from the
gap start), bounding per-chunk memory at scale.

Scale shape: chunking itself is map-only (one Arrow batch in, chunk
rows out — no shuffle); duplicate detection is one hash-partitioned
exchange on chunk_hash. Nothing is ever all-pairs and no driver
collect exists on this path.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame

#: Gear constants: top 64 bits of md5(str(byte)) — public, deterministic,
#: and reproducible in DuckDB from the same md5 hex (the oracle only
#: needs them modulo 2^mask_bits; see the windowed-sum identity above).
def _gear_table():
    import numpy as np

    return np.array(
        [
            int(hashlib.md5(str(v).encode()).hexdigest()[:16], 16)
            for v in range(256)
        ],
        dtype=np.uint64,
    )


def gear_mask_values(data, mask_bits: int):
    """Vectorized ``h_i & (2^mask_bits - 1)`` for the Gear recurrence
    over ``data`` (uint8 array), via the windowed-sum identity: the
    low w bits of h_i are the low w bits of
    ``sum_{k<w} GEAR[b_{i-k}] << k`` (missing terms at i < k simply
    absent, matching h starting at 0)."""
    import numpy as np

    gear = _GEAR()
    vals = gear[data]  # uint64, wraparound adds are mod 2^64
    acc = vals.copy()
    for k in range(1, mask_bits):
        acc[k:] += vals[:-k] << np.uint64(k)
    return acc & np.uint64((1 << mask_bits) - 1)


_GEAR_CACHE = None


def _GEAR():
    global _GEAR_CACHE
    if _GEAR_CACHE is None:
        _GEAR_CACHE = _gear_table()
    return _GEAR_CACHE


def chunk_spans(data, mask_bits: int = 6, max_chunk: int = 512):
    """(start, end) chunk spans for one blob. Boundaries where the
    masked Gear hash is zero; spans longer than ``max_chunk`` are
    subdivided at fixed ``max_chunk`` strides from the span start (a
    stateless post-pass — each oversized gap is split identically no
    matter what surrounds it)."""
    import numpy as np

    n = len(data)
    if n == 0:
        return []
    hm = gear_mask_values(data, mask_bits)
    # boundary AFTER i closes a chunk; the final byte closes implicitly
    cuts = np.nonzero(hm[:-1] == 0)[0] + 1
    starts = [0] + cuts.tolist()
    ends = cuts.tolist() + [n]
    spans = []
    for s, e in zip(starts, ends):
        while e - s > max_chunk:
            spans.append((s, s + max_chunk))
            s += max_chunk
        spans.append((s, e))
    return spans


def chunk_hash(data) -> str:
    """Chunk identity: md5 over the dash-joined DECIMAL byte values
    (not the raw bytes) so DuckDB can recompute the identical hash
    with string_agg — the same ord-replay convention as the b22
    feature/audio oracles. Collision behavior is md5's either way."""
    return hashlib.md5(
        "-".join(str(int(b)) for b in data).encode()
    ).hexdigest()


def cdc_chunks(
    df: DataFrame,
    mask_bits: int = 6,
    max_chunk: int = 512,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, payload) -> one row per chunk: (id, chunk_ord, chunk_start,
    chunk_len, chunk_hash). Map-only: Arrow batches in, chunk rows out,
    zero shuffle — the exchange (if any) belongs to whatever consumes
    the chunk table."""

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            ids, ords, starts, lens, hashes = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = np.frombuffer(bytes(payload), dtype=np.uint8)
                for ordn, (s, e) in enumerate(
                    chunk_spans(data, mask_bits, max_chunk)
                ):
                    ids.append(int(doc_id))
                    ords.append(ordn)
                    starts.append(s)
                    lens.append(e - s)
                    hashes.append(chunk_hash(data[s:e]))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "chunk_ord": pd.Series(ords, dtype="int32"),
                    "chunk_start": pd.Series(starts, dtype="int32"),
                    "chunk_len": pd.Series(lens, dtype="int32"),
                    "chunk_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return df.mapInPandas(
        batches,
        f"{id_col} bigint, chunk_ord int, chunk_start int, "
        "chunk_len int, chunk_hash string",
    )
