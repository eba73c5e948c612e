"""Multimodal column support (north-star B22).

Image/audio/video payloads are opaque BINARY columns travelling next to
typed metadata; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes never round-trip through Python row-at-a-time.

The actual media decode is STUBBED (no image/audio libs in this
container): ``decode_image`` raises NotImplementedError, and
``extract_features`` computes a deterministic fake feature (byte
histogram) so the Spark-side plumbing — schema, batch shape, partition
behavior — is real and tested (tests/test_northstar.py).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, modality string, width int, height int, "
    "features array<double>"
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach a BINARY payload + typed metadata struct to each doc.

    Stands in for reading real media blobs; the payload is the UTF-8
    bytes of the text so everything stays deterministic.
    """
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("modality"),
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - documented stub
    """Real image decode (PIL/opencv) — unavailable in this container."""
    raise NotImplementedError(
        "media decode requires an image library not present in this "
        "environment; extract_features uses a deterministic byte "
        "histogram instead"
    )


def extract_features(df: DataFrame, n_bins: int = 4) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Production shape: mapInPandas over (payload, meta) with a real
    decoder in place of the byte histogram. Each Arrow batch is a
    pandas DataFrame — no per-row Python overhead.
    """

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            n_bytes = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                # vectorized histogram: bin = byte * n_bins // 256,
                # whole payload in one C-speed pass (np.bincount),
                # never a per-byte Python loop
                hist = np.bincount(
                    (arr.astype(np.int64) * n_bins) >> 8, minlength=n_bins
                )
                n_bytes.append(arr.size)
                feats.append((hist / max(arr.size, 1)).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_bytes": np.asarray(n_bytes, dtype=np.int32),
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "width": [m["width"] for m in pdf["meta"]],
                    "height": [m["height"] for m in pdf["meta"]],
                    "features": feats,
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 64,
    stride: int = 128,
    max_frames: int = 4,
) -> DataFrame:
    """Deterministic frame sampling over binary payloads — the video
    path's 1→N row expansion (decode N frames per clip), shaped for
    scale: Arrow-batched ``mapInPandas``, no exploding intermediate
    array, each output row carries only its own frame bytes.

    Frames are fixed-offset byte slices (``frame_idx * stride``,
    ``frame_bytes`` long, up to ``max_frames`` per payload) — the
    production version replaces the slice with a real container/codec
    frame extraction at the same (payload, meta) → rows contract. The
    final frame may be short (payload tail), never empty.
    """

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            lens = np.fromiter(
                (len(p) for p in pdf["payload"]), dtype=np.int64, count=len(pdf)
            )
            # frames per payload: ceil(len/stride) capped at max_frames —
            # offsets/indices computed vectorized; the remaining loop is
            # one zero-copy slice per emitted frame, never per byte
            n_frames = np.minimum(-(-lens // stride), max_frames)
            doc_ids = np.repeat(pdf["doc_id"].to_numpy(), n_frames)
            frame_idx = np.concatenate(
                [np.arange(k, dtype=np.int64) for k in n_frames]
            ) if len(pdf) else np.empty(0, dtype=np.int64)
            offsets = frame_idx * stride
            frames = [
                bytes(p)[off : off + frame_bytes]
                for p, k in zip(pdf["payload"], n_frames)
                for off in range(0, int(k) * stride, stride)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "frame_idx": frame_idx.astype(np.int32),
                    "offset": offsets.astype(np.int32),
                    "frame_len": np.fromiter(
                        (len(f) for f in frames),
                        dtype=np.int32,
                        count=len(frames),
                    ),
                    "frame": frames,
                }
            )

    return df.mapInPandas(
        batches,
        "doc_id bigint, frame_idx int, offset int, frame_len int, frame binary",
    )


def window_stats(
    df: DataFrame,
    window_bytes: int = 256,
    max_windows: int = 4,
) -> DataFrame:
    """Deterministic windowed waveform stats over binary payloads — the
    audio path's decode→window→aggregate shape (RMS/peak per fixed
    window), Arrow-batched like the other media ops.

    Each payload yields up to ``max_windows`` non-overlapping
    ``window_bytes`` windows; per window: byte count, exact integer
    amplitude sum, integer sum of squares (the RMS numerator), and the
    peak byte. The production version swaps the byte array for decoded
    PCM samples at the same (payload) → rows contract; numpy does the
    vector math per Arrow batch, not per row.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # whole-batch via offsets: concatenate every payload's
            # windowed prefix into ONE array, then a single reduceat
            # per statistic over the global window boundaries — no
            # per-byte (or per-window) Python loops
            segs = []
            doc_ids = []
            win_counts = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                nw = min(max_windows, -(-b.size // window_bytes))
                if nw == 0:
                    continue
                segs.append(b[: nw * window_bytes])
                doc_ids.append(doc_id)
                win_counts.append(nw)
            if not segs:
                yield pd.DataFrame(
                    {
                        "doc_id": np.empty(0, dtype=np.int64),
                        "win_idx": np.empty(0, dtype=np.int32),
                        "n": np.empty(0, dtype=np.int32),
                        "sum_amp": np.empty(0, dtype=np.int64),
                        "sum_sq": np.empty(0, dtype=np.int64),
                        "peak": np.empty(0, dtype=np.int32),
                    }
                )
                continue
            flat = np.concatenate(segs).astype(np.int64)
            seg_lens = np.fromiter(
                (s.size for s in segs), dtype=np.int64, count=len(segs)
            )
            seg_starts = np.concatenate(([0], np.cumsum(seg_lens)[:-1]))
            win_counts = np.asarray(win_counts, dtype=np.int64)
            win_idx = np.concatenate(
                [np.arange(k, dtype=np.int64) for k in win_counts]
            )
            bounds = (
                np.repeat(seg_starts, win_counts) + win_idx * window_bytes
            )
            ends = np.append(bounds[1:], flat.size)
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(np.asarray(doc_ids), win_counts),
                    "win_idx": win_idx.astype(np.int32),
                    "n": (ends - bounds).astype(np.int32),
                    "sum_amp": np.add.reduceat(flat, bounds),
                    "sum_sq": np.add.reduceat(flat * flat, bounds),
                    "peak": np.maximum.reduceat(flat, bounds).astype(np.int32),
                }
            )

    return df.mapInPandas(
        batches,
        "doc_id bigint, win_idx int, n int, sum_amp bigint, sum_sq bigint, "
        "peak int",
    )
