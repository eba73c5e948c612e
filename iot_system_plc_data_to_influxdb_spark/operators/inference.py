"""Batched model-inference plumbing (north-star B20/B22).

The missing middle of an embedding pipeline: corpus text → model →
`array<float>` embedding column, at GPU batch sizes. Spark's slot for
this is Arrow-batched ``mapInPandas``: the model loads ONCE per
executor (closure/broadcast), every Arrow batch becomes one forward
pass, and nothing touches Python row-at-a-time.

The "model" here is a deterministic hashed bag-of-words encoder —
dim j of a document = Σ over tokens of (h16(md5("j|" + token)) % 201
− 100) — because no ML runtime ships in this container. It is
numerically exact integer math, which buys the same verification the
other stubs get: `encode_documents` (the mapInPandas path that a real
model drops into) is proven EQUAL to `encode_documents_native` (pure
Catalyst expressions) and both replay in DuckDB (b22_text_encoder).

Swapping in a real model changes ~5 lines: load it in the generator
prologue, call it on `batch["text"]`, keep the schema. Batch size is
governed by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — set it
to the model's optimal forward-pass batch.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import token_hash16, tokens

N_DIMS = 8

ENCODER_SCHEMA = "doc_id bigint, n_tokens int, embedding array<bigint>"


def _h16(s: str) -> int:
    h = hashlib.md5(s.encode()).hexdigest()
    return int(h[:4], 16)


def encode_documents(docs: DataFrame, n_dims: int = N_DIMS) -> DataFrame:
    """mapInPandas encoder: one numpy 'forward pass' per Arrow batch.

    A real deployment replaces the hashed-BoW arithmetic with
    `model.encode(batch["text"])`; everything around it — schema,
    batching, tokenization parity with functions/text.tokens — stays.
    """

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # model "load" happens here, once per task, not per batch
        memo: dict[str, np.ndarray] = {}

        def tok_vec(tok: str) -> np.ndarray:
            v = memo.get(tok)
            if v is None:
                v = np.array(
                    [_h16(f"{j}|{tok}") % 201 - 100 for j in range(n_dims)],
                    dtype=np.int64,
                )
                memo[tok] = v
            return v

        for batch in batches:
            out = []
            for doc_id, text in zip(batch["doc_id"], batch["text"]):
                toks = [t for t in str(text).strip().lower().split()]
                toks = [t for t in toks if t] or [""]
                emb = np.zeros(n_dims, dtype=np.int64)
                for t in toks:
                    emb += tok_vec(t)
                out.append((doc_id, len(toks), list(emb)))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_tokens", "embedding"]
            )

    return docs.select("doc_id", "text").mapInPandas(encode, ENCODER_SCHEMA)


def encode_documents_native(docs: DataFrame, n_dims: int = N_DIMS) -> DataFrame:
    """Pure-Catalyst twin of the same encoder (the verification anchor:
    mapInPandas output must equal this expression tree exactly)."""
    w = tokens(F.col("text"))
    dims = [
        F.aggregate(
            F.transform(
                w,
                lambda tok: token_hash16(
                    F.concat(F.lit(f"{j}|"), tok)
                )
                % 201
                - 100,
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        for j in range(n_dims)
    ]
    return docs.select(
        "doc_id",
        F.size(w).cast("int").alias("n_tokens"),
        F.array(*dims).alias("embedding"),
    )
