"""Streaming document curation (north-star B21 × B26).

The batch text-analysis operators (plans/northstar.py) as a continuous
ingest pipeline: documents arrive as a stream, get content-hashed,
deduplicated within a watermark (exact dedup state stays bounded),
scored, language-tagged, and filtered — the shape of a training-data
ingest service that curates as data lands rather than in nightly
batches.

Everything is native Catalyst expressions (no Python in the hot path),
so the same columns the batch queries compute stream with whole-stage
codegen; dedup is Spark's watermark-bounded state store. At fleet scale
the stream partitions by content hash automatically (the dedup state
shuffle) and every other stage is map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, shingles, tokens


def curate_stream(
    docs: DataFrame,
    *,
    watermark: str = "10 minutes",
    min_quality: float = 0.3,
    lang: str | None = None,
) -> DataFrame:
    """doc stream (ingest_ts, doc_id, text, ...) → curated stream.

    Stages: content md5 → dropDuplicatesWithinWatermark on the hash
    (exact streaming dedup, state bounded by the watermark) → token
    stats → quality score (same exact-integer formula as
    b21_quality_score) → language heuristic → threshold filters.
    """
    w = tokens(F.col("text"))
    deduped = docs.withColumn(
        "content_md5", F.md5(F.col("text"))
    ).withWatermark("ingest_ts", watermark).dropDuplicatesWithinWatermark(
        ["content_md5"]
    )
    nt = F.col("n_tokens")

    def ratio4(a, b):
        return F.floor((2 * a * 10000 + b) / (2 * b)) / 10000.0

    stats = deduped.withColumns(
        {
            "n_tokens": F.size(w),
            "n_distinct": F.size(F.array_distinct(w)),
            "stop_hits": F.size(F.filter(w, lambda x: x.isin(*STOPWORDS))),
        }
    )
    quality_num = (
        (4 * F.col("n_distinct") + 3 * (nt - F.col("stop_hits"))) * 100
        + 3 * F.least(nt, F.lit(100)) * nt
    )
    scored = stats.withColumns(
        {
            "quality": ratio4(quality_num, 1000 * nt),
            "predicted_lang": F.when(
                F.col("stop_hits") / nt >= 0.05, F.lit("en")
            ).otherwise(F.lit("other")),
        }
    )
    out = scored.filter(F.col("quality") >= min_quality)
    if lang is not None:
        out = out.filter(F.col("predicted_lang") == lang)
    return out


def neardup_filter_stream(
    docs: DataFrame,
    *,
    watermark: str = "10 minutes",
    n_hashes: int = 8,
    bands: int = 4,
    finalize: str = "1 minute",
) -> DataFrame:
    """Streaming NEAR-duplicate ingest filter (B19 × B26): MinHash-LSH
    dedup as data lands, instead of a nightly batch pass.

    doc stream (ingest_ts, doc_id, text) → survivor stream
    (window, doc_id, ingest_ts, n_fresh_bands).

    Stages:
    1. MinHash signature — the identical zero-shuffle recipe as the
       batch ``b19_minhash_lsh_neardup`` (salted-md5 components min-
       folded over the un-exploded shingle array; closure factory per
       component, NOT a ``lambda s, j=j`` default, which pyspark reads
       as transform's (element, index) form). Map-only, codegen'd.
    2. LSH band keys — ``bands`` rows per doc, key = md5 of the
       concatenated signature slice. The explode is map-only.
    3. ``dropDuplicatesWithinWatermark(["band", "bk"])`` — the FIRST
       holder of each LSH bucket within the watermark horizon keeps
       its band row; later arrivals sharing the bucket lose theirs.
       State is bounded by the watermark, keyed by (band, bk) — at
       fleet scale this is the state-store shuffle, same key the batch
       LSH join uses.
    4. A doc survives iff ALL its bands were fresh (any shared bucket
       = near-dup candidate = filtered), re-assembled by a windowed
       count per doc — the second stateful operator; Spark's
       multi-stateful support chains it after the dedup because both
       run on the same event-time watermark.

    The survivor stream carries doc_id + ingest_ts, not the payload:
    at 100 TB the text/bytes stay in the landed table and survivors
    join back by doc_id — shuffling full documents through two state
    stores would dominate the cost. Tuning: aggressiveness follows the
    LSH threshold curve — bands=4 of 2 hashes each ≈ "candidate at
    sim ≳ 0.5"; raise rows-per-band to demand closer duplicates.
    """
    if n_hashes % bands:
        raise ValueError("bands must divide n_hashes evenly")
    rows_per_band = n_hashes // bands
    arr = (
        docs.select(
            "ingest_ts", "doc_id", tokens(F.col("text")).alias("w")
        )
        .select(
            "ingest_ts",
            "doc_id",
            F.array_distinct(shingles(F.col("w"))).alias("arr"),
        )
    )

    def _component(j: int):
        salt = F.lit(f"{j}|")
        return F.array_min(
            F.transform(
                F.col("arr"),
                lambda s: F.substring(F.md5(F.concat(salt, s)), 1, 8),
            )
        ).alias(f"h{j}")

    sig = arr.select(
        "ingest_ts", "doc_id", *[_component(j) for j in range(n_hashes)]
    )
    band_rows = sig.select(
        "ingest_ts",
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat(
                                *[
                                    F.col(f"h{b * rows_per_band + k}")
                                    for k in range(rows_per_band)
                                ]
                            )
                        ).alias("bk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("e"),
    ).select("ingest_ts", "doc_id", "e.band", "e.bk")
    fresh = band_rows.withWatermark(
        "ingest_ts", watermark
    ).dropDuplicatesWithinWatermark(["band", "bk"])
    return (
        fresh.groupBy(F.window("ingest_ts", finalize), "doc_id")
        .agg(
            F.min("ingest_ts").alias("ingest_ts"),
            F.count("*").alias("n_fresh_bands"),
        )
        .filter(F.col("n_fresh_bands") == bands)
    )


def chunk_stream(
    curated: DataFrame, size: int = 50, stride: int = 40
) -> DataFrame:
    """Curated doc stream → training-chunk stream: the same 50/40
    context-window grid as plans/northstar.b21_chunk_windows, applied
    to streaming rows. Map-only (sequence → explode → slice), so it
    composes with any upstream watermark/dedup state without adding
    state of its own — chunking streams at ingest speed.
    """
    w = F.col("_cw")
    n_chunks = F.greatest(
        F.floor((F.size(w) - (size - stride) - 1) / stride), F.lit(0)
    ).cast("int")
    return (
        curated.withColumn("_cw", tokens(F.col("text")))
        .withColumn("chunk_id", F.explode(F.sequence(F.lit(0), n_chunks)))
        .select(
            "ingest_ts",
            "doc_id",
            "chunk_id",
            (F.col("chunk_id") * stride).alias("start_tok"),
            F.slice(w, F.col("chunk_id") * stride + 1, size).alias("_ck"),
            "quality",
            "predicted_lang",
        )
        .select(
            "ingest_ts",
            "doc_id",
            "chunk_id",
            "start_tok",
            F.size("_ck").alias("n_tok"),
            F.md5(F.array_join("_ck", " ")).alias("chunk_md5"),
            "quality",
            "predicted_lang",
        )
    )


# --------------------------------------------------------------------------
# B22 × B29 — streaming SCENE-CHANGE detection on camera ingest: the
# stateful twin of plans/northstar.py b22_scene_changes. Each camera
# key retains exactly ONE previous frame (luma bytes) in the state
# store; every arriving frame emits its exact integer SAD against that
# retained frame and a cut flag, then replaces it. State is O(cameras
# x frame size), independent of stream length — the same bounded-state
# argument as the A10 current-value table, with frames instead of
# floats. Frames are processed in frame_idx order within a batch;
# late/replayed frames (idx <= last seen) are dropped deterministically
# rather than corrupting the diff chain.
# --------------------------------------------------------------------------

SCENE_OUTPUT = (
    "camera string, frame_idx int, sad bigint, n_px int, is_cut int"
)
SCENE_STATE = "prev binary, last_idx int, w int, h int"


def scene_change_stream(frames: DataFrame, threshold: int = 30) -> DataFrame:
    """frames (camera string, frame_idx int, w int, h int, luma binary)
    → per-frame (sad, n_px, is_cut) vs the camera's retained previous
    frame. The first frame of a camera emits nothing (no predecessor),
    matching the batch operator's frame_idx >= 1 output."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        camera = key[0]
        rows = pd.concat(list(pdfs)).sort_values("frame_idx")
        if state.exists:
            prev_b, last_idx, w, h = state.get
            prev = np.frombuffer(prev_b, dtype=np.uint8).astype(np.int64)
        else:
            prev, last_idx, w, h = None, -1, None, None
        out = {"camera": [], "frame_idx": [], "sad": [], "n_px": [],
               "is_cut": []}
        for _, r in rows.iterrows():
            idx = int(r["frame_idx"])
            if idx <= last_idx:
                continue  # late or replayed frame: drop, keep the chain
            cur = np.frombuffer(bytes(r["luma"]), dtype=np.uint8).astype(
                np.int64
            )
            w, h = int(r["w"]), int(r["h"])
            if prev is not None and prev.size == cur.size:
                sad = int(np.abs(cur - prev).sum())
                n = w * h
                out["camera"].append(camera)
                out["frame_idx"].append(idx)
                out["sad"].append(sad)
                out["n_px"].append(n)
                out["is_cut"].append(int(sad > threshold * n))
            prev, last_idx = cur, idx
        if prev is not None:
            state.update((prev.astype(np.uint8).tobytes(), last_idx, w, h))
        yield pd.DataFrame(out)

    return frames.groupBy("camera").applyInPandasWithState(
        update,
        outputStructType=SCENE_OUTPUT,
        stateStructType=SCENE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cdc_dedup_stream(
    blobs: DataFrame,
    *,
    watermark: str = "10 minutes",
    mask_bits: int = 6,
    max_chunk: int = 512,
) -> DataFrame:
    """Blob stream (ingest_ts, doc_id, payload) → the chunk rows a
    chunk store would actually WRITE: the streaming twin of
    b19_cdc_chunk_dedup (plans/northstar.py). Each blob is Gear-chunked
    map-side (operators/cdc.py — position-independent boundaries, so
    chunking needs no cross-batch state), then
    ``dropDuplicatesWithinWatermark(["chunk_hash"])`` keeps only
    first-seen chunk content: a re-uploaded or lightly edited blob
    contributes only its genuinely novel byte ranges downstream.

    State is one row per DISTINCT chunk hash within the watermark —
    O(unique content), not O(stream) — and the only exchange carries
    ~60 B chunk metadata per chunk, never payload bytes (the same
    scale contract as the batch operator, SCALE.md). Emission is
    immediate (dedup is not a windowed aggregate), so novel chunks
    land in the store within the triggering micro-batch."""
    from ..operators.cdc import chunk_hash, chunk_spans

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            ts, ids, ords, lens, hashes = [], [], [], [], []
            for ingest_ts, doc_id, payload in zip(
                pdf["ingest_ts"], pdf["doc_id"], pdf["payload"]
            ):
                data = np.frombuffer(bytes(payload), dtype=np.uint8)
                for ordn, (s, e) in enumerate(
                    chunk_spans(data, mask_bits, max_chunk)
                ):
                    ts.append(ingest_ts)
                    ids.append(int(doc_id))
                    ords.append(ordn)
                    lens.append(e - s)
                    hashes.append(chunk_hash(data[s:e]))
            yield pd.DataFrame(
                {
                    "ingest_ts": pd.Series(ts, dtype="datetime64[us]"),
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_ord": pd.Series(ords, dtype="int32"),
                    "chunk_len": pd.Series(lens, dtype="int32"),
                    "chunk_hash": pd.Series(hashes, dtype="object"),
                }
            )

    chunks = blobs.select("ingest_ts", "doc_id", "payload").mapInPandas(
        batches,
        "ingest_ts timestamp, doc_id bigint, chunk_ord int, "
        "chunk_len int, chunk_hash string",
    )
    return chunks.withWatermark(
        "ingest_ts", watermark
    ).dropDuplicatesWithinWatermark(["chunk_hash"])


def gopher_filter_stream(docs: DataFrame) -> DataFrame:
    """The Gopher rule gate (functions/text.gopher_stats — the SAME
    Column expressions as the batch b21_gopher_rules query, so batch
    and stream can never drift) applied at ingest. Stateless native
    projection + filter: no watermark, no state store, whole-stage
    codegen end to end."""
    from ..functions.text import gopher_stats

    w = tokens(F.col("text"))
    g = gopher_stats(F.col("text"), w)
    return docs.withColumns(
        {k: g[k] for k in ("n_words", "stop_hits", "passes")}
    ).filter(F.col("passes"))


def importance_filter_stream(
    docs: DataFrame,
    weights: dict,
    *,
    min_score: float,
) -> DataFrame:
    """DSIR-style importance scoring at ingest — the train-batch /
    serve-stream split: ``weights`` is the {bucket: fixed-point weight}
    table the batch job fits (the wt stage of plans/northstar.py
    b21_importance_resample — 256 entries), carried as a MAP LITERAL in
    the plan (the b21_classifier_score pattern) and folded over the
    un-exploded token array, so scoring is a stateless map-only
    projection — no aggregation, no watermark, true append stream.
    Each doc's fixed-point ``imp_score`` must clear ``min_score``.
    (The batch job's exact-quartile NTILE needs the full corpus; a
    stream uses the threshold that quartile implies — recompute it per
    model refresh.)"""
    from ..functions.text import token_hash16

    wmap = F.create_map(
        *[F.lit(x) for kv in sorted(weights.items()) for x in kv]
    )
    w = tokens(F.col("text"))
    wsum = F.aggregate(
        F.transform(
            w,
            lambda t: F.coalesce(
                F.element_at(wmap, F.pmod(token_hash16(t), F.lit(256))),
                F.lit(0),
            ).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    from ..plans._exact import round_ratio

    nt = F.size(w).cast("bigint")
    scored = docs.withColumns(
        {
            "n_tokens": nt,
            "w_sum": wsum,
            # the SAME pmod-based exact rounding as the batch query —
            # a double-division floor can cross an integer boundary on
            # near-integer quotients and disagree with it
            "imp_score": round_ratio(wsum, nt, 4),
        }
    )
    return scored.filter(F.col("imp_score") >= F.lit(min_score))


def ivf_assign_stream(vectors: DataFrame, centroids: list) -> DataFrame:
    """Route embedding vectors to their IVF cell at ingest — the
    streaming leg of operators/similarity.knn_ivf's coarse quantizer,
    so vectors can land pre-partitioned by cell (the layout the ANN
    probe prunes on) instead of waiting for a nightly re-bucketing.

    Same train-batch / serve-stream split as importance_filter_stream:
    ``centroids`` is the [(cell, [floats])] table the batch quantizer
    produces (operators/similarity.ivf_centroids — n_cells entries).
    Batch and stream now share ONE fold — operators/similarity.
    ivf_best_cell (argmax exact-decimal cosine over an array-of-struct
    centroid literal, ties to the smallest cell) — so the two legs are
    structurally incapable of drifting, not merely tested equal.

    Stateless map-only projection: no watermark, no state store, no
    shuffle — a true append stream that scales with ingest rate only.
    """
    from ..operators.similarity import ivf_best_cell

    # two-stage projection: the fold evaluates ONCE per row and the
    # two outputs read its struct fields (a single withColumns would
    # inline the fold into both columns)
    return (
        vectors.withColumn("_best", ivf_best_cell(centroids))
        .withColumns(
            {
                "cell": F.col("_best.cell"),
                "cell_sim": F.col("_best.sim"),
            }
        )
        .drop("_best")
    )


def url_dedup_stream(
    pages: DataFrame, *, watermark: str = "10 minutes"
) -> DataFrame:
    """URL-canonical dedup at ingest: the streaming leg of
    plans/northstar.b19_url_dedup, built on the SHARED
    functions/url.canonical_url expressions (batch and stream cannot
    drift). Canonicalization is a stateless map; the dedup is
    dropDuplicatesWithinWatermark on the canonical key — the same
    watermark-bounded state the content-hash dedup uses, keyed by the
    canonical URL instead, so a page re-crawled under a tracking-param
    or www-variant alias within the window is dropped before any
    fetch/decode spend. State is O(distinct canonical URLs inside the
    watermark), not O(stream)."""
    from ..functions.url import canonical_url

    canon = pages.withColumn("canon_url", canonical_url(F.col("url")))
    return canon.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["canon_url"]
    )


def surprisal_stream(
    docs: DataFrame, c2_model: DataFrame, c1_model: DataFrame, v: int
) -> DataFrame:
    """Per-bigram LM surprisal tagging at ingest — the streaming leg
    of plans/northstar.b21_perplexity_bits (same
    functions/text.surprisal_bits expression tree, so batch and
    stream can never drift).

    The train-batch / serve-stream split: ``c2_model`` (w1, w2, c2)
    and ``c1_model`` (w1, c1) are the bigram/left-context count tables
    the nightly batch job fits, ``v`` its vocabulary size. The stream
    explodes each arriving doc into bigrams (stateless) and
    STREAM-STATIC left-joins the model — NOVEL bigrams (the thing a
    stream sees that the training corpus didn't) fall back to count 0,
    i.e. maximum surprisal bits(c1+V), exactly what add-one smoothing
    prescribes. Emits one (doc_id, w1, w2, bits) row per bigram
    occurrence in APPEND mode with zero state store — per-doc
    aggregation is the batch consumer's job (the b21 query); keeping
    the stream stateless is what lets it run at ingest rate.
    """
    from ..functions.text import surprisal_bits, tokens

    w = tokens(F.col("text"))
    bg = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(w) - 2),
                lambda i: F.struct(
                    F.get(w, i).alias("w1"), F.get(w, i + 1).alias("w2")
                ),
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    joined = bg.join(c2_model, ["w1", "w2"], "left").join(
        c1_model, "w1", "left"
    )
    return joined.select(
        "doc_id",
        "w1",
        "w2",
        surprisal_bits(
            F.coalesce(F.col("c1"), F.lit(0)) + F.lit(int(v)),
            F.coalesce(F.col("c2"), F.lit(0)) + 1,
        ).alias("bits"),
    )
