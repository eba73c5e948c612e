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

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                b = bytes(payload)
                hist = [0] * n_bins
                for byte in b:
                    hist[byte * n_bins // 256] += 1
                total = max(len(b), 1)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": len(b),
                        "modality": meta["modality"],
                        "width": meta["width"],
                        "height": meta["height"],
                        "features": [h / total for h in hist],
                    }
                )
            yield pd.DataFrame(rows)

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

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for idx in range(max_frames):
                    off = idx * stride
                    if off >= len(b):
                        break
                    chunk = b[off : off + frame_bytes]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "offset": off,
                            "frame_len": len(chunk),
                            "frame": chunk,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "offset", "frame_len", "frame"],
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
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                for idx in range(max_windows):
                    off = idx * window_bytes
                    if off >= len(b):
                        break
                    w = b[off : off + window_bytes].astype(np.int64)
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "win_idx": idx,
                            "n": int(w.size),
                            "sum_amp": int(w.sum()),
                            "sum_sq": int((w * w).sum()),
                            "peak": int(w.max()),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "win_idx", "n", "sum_amp", "sum_sq", "peak"],
            )

    return df.mapInPandas(
        batches,
        "doc_id bigint, win_idx int, n int, sum_amp bigint, sum_sq bigint, "
        "peak int",
    )
