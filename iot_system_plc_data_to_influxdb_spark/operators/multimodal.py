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
