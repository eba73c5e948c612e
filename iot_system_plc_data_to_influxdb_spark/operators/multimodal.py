"""Multimodal column support (north-star B22).

Image/audio/video payloads are opaque BINARY columns travelling next to
typed metadata; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes never round-trip through Python row-at-a-time.

Decode support has two tiers:

- **Real byte-level decode** for the uncompressed container formats —
  24bpp BMP (header/offset/row-padding/bottom-up/BGR), binary PPM
  (P6 grammar incl. comments), RIFF/WAVE PCM16 (proper chunk walk) —
  implemented in pure struct/numpy below and hash-checked against
  closed-form SQL oracles (b22_image_decode / b22_audio_decode).
- **Codec-gated**: compressed formats (JPEG/PNG/MP4) need an image/
  audio library not present in this container; ``decode_image``
  raises the documented NotImplementedError for those, and
  ``extract_features`` computes a deterministic byte histogram so the
  Spark-side plumbing — schema, batch shape, partition behavior — is
  still real and tested (tests/test_northstar.py).
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


def decode_image(payload: bytes):
    """Image decode dispatch: REAL decoders for 24bpp BMP, binary PPM
    (pure numpy) and PNG (stdlib-zlib inflate + spec-level chunk walk
    and filter reconstruction — see decode_png below). JPEG and video
    codecs require libraries not present in this container and raise
    the documented gate. Returns (width, height, (H, W, C) uint8)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(payload)
    raise NotImplementedError(
        "JPEG/video codec decode requires a library not present in "
        "this environment; BMP, PPM, and PNG decode natively"
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


# --------------------------------------------------------------------------
# REAL byte-level media decode — pure struct/numpy, no codec libraries.
#
# Uncompressed container formats (BMP, binary PPM, RIFF/WAVE PCM) are
# fully specified byte layouts; parsing them needs no image/audio lib,
# so these decoders are REAL — every header field, row-padding rule,
# channel order, and sample width is honored and tested byte-for-byte.
# Compressed codecs (JPEG/PNG/MP4) still raise the documented gate in
# decode_image; a production deployment drops PIL/ffmpeg into the same
# (payload) → array contract.
# --------------------------------------------------------------------------


def encode_bmp(pixels) -> bytes:
    """numpy (H, W, 3) uint8 RGB → a standard 24bpp bottom-up BMP.

    Layout: 14-byte BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER, rows
    stored bottom-up, pixels as BGR, each row padded to 4 bytes."""
    import struct

    import numpy as np

    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    img_size = (row_bytes + pad) * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    bgr = pixels[:, :, ::-1]  # RGB → BGR
    rows = []
    padding = b"\x00" * pad
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.append(bgr[y].tobytes() + padding)
    return header + dib + b"".join(rows)


def decode_bmp(payload: bytes):
    """24bpp uncompressed BMP → (width, height, (H, W, 3) uint8 RGB).

    Handles the format's real quirks: pixel-array offset from the file
    header, signed height (negative = top-down), BGR channel order,
    4-byte row padding."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    dib_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24bpp uncompressed BMP is supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h_signed < 0
    h = abs(h_signed)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=offset)
    rows = raw.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return w, h, rows[:, :, ::-1]  # BGR → RGB


def encode_ppm(pixels) -> bytes:
    """numpy (H, W, 3) uint8 RGB → binary PPM (P6)."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def decode_ppm(payload: bytes):
    """Binary PPM (P6) → (width, height, (H, W, 3) uint8 RGB), honoring
    the whitespace/comment grammar of the header."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> data,
    # '#' comments run to end-of-line
    # every scan is bounded by len(payload): a truncated header raises
    # instead of spinning forever inside a mapInPandas task (b'' is not
    # .isspace(), so an unbounded 'scan to whitespace' never exits)
    end = len(payload)
    fields = []
    i = 2
    while len(fields) < 3:
        while i < end and payload[i : i + 1].isspace():
            i += 1
        if i >= end:
            raise ValueError("truncated PPM header")
        if payload[i : i + 1] == b"#":
            while i < end and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < end and not payload[j : j + 1].isspace():
            j += 1
        if j >= end:
            raise ValueError("truncated PPM header")
        try:
            fields.append(int(payload[i:j]))
        except ValueError:
            raise ValueError(
                f"malformed PPM header field {payload[i:j]!r}"
            ) from None
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return w, h, arr.reshape(h, w, 3)


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """numpy int16 mono samples → RIFF/WAVE PCM16."""
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(payload: bytes):
    """RIFF/WAVE PCM → (sample_rate, channels, numpy int16 samples).

    Walks the chunk list properly (fmt may be followed by LIST/fact
    chunks before data; chunks are word-aligned)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = channels = bits = None
    samples = None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack_from(
                "<HHI", payload, body
            )
            bits = struct.unpack_from("<H", payload, body + 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM16 supported (fmt={audio_fmt}, bits={bits})"
                )
        elif cid == b"data":
            samples = np.frombuffer(payload, dtype="<i2", count=size // 2,
                                    offset=body)
        pos = body + size + (size % 2)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return sample_rate, channels, samples


# --------------------------------------------------------------------------
# REAL video-container decode: YUV4MPEG2 (.y4m) — the uncompressed
# interchange format every video toolchain speaks (ffmpeg/x264 I/O).
# ASCII stream header with order-free parameter tokens, then one
# "FRAME\n" marker + raw planar YCbCr per frame. C420 subsampling is
# honored (luma W×H + two W/2×H/2 chroma planes). Compressed video
# codecs (H.264/VP9/…) remain the documented gate.
# --------------------------------------------------------------------------


def encode_y4m(frames, fps: int = 25) -> bytes:
    """list of (H, W) uint8 luma frames → YUV4MPEG2 C420jpeg bytes
    (chroma planes constant 128 — grayscale video)."""
    import numpy as np

    first = np.asarray(frames[0], dtype=np.uint8)
    h, w = first.shape
    if h % 2 or w % 2:
        raise ValueError("C420 needs even dimensions")
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420jpeg\n".encode()
    chroma = b"\x80" * ((w // 2) * (h // 2) * 2)
    body = b"".join(
        b"FRAME\n" + np.asarray(f, dtype=np.uint8).tobytes() + chroma
        for f in frames
    )
    return head + body


def decode_y4m(payload: bytes):
    """YUV4MPEG2 → (width, height, fps, [(H, W) uint8 luma, ...]).

    Real container parsing: the stream-header parameter tokens are
    order-free (W/H/F/I/A/C per spec), FRAME markers may carry their
    own parameters up to the newline, and the per-frame byte budget
    follows the declared colorspace (C420* = 1.5·W·H, C444 = 3·W·H)."""
    import numpy as np

    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = None
    fps = 25
    cs = "420jpeg"
    for tok in payload[9:nl].split():
        tag, val = chr(tok[0]), tok[1:].decode()
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            num, den = val.split(":")
            fps = int(num) // max(int(den), 1)
        elif tag == "C":
            cs = val
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if cs.startswith("420"):
        frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
    elif cs == "444":
        frame_bytes = 3 * w * h
    else:
        raise NotImplementedError(f"unsupported Y4M colorspace C{cs}")
    frames = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"missing FRAME marker at byte {pos}")
        pos = payload.index(b"\n", pos) + 1  # marker params run to \n
        luma = np.frombuffer(
            payload, dtype=np.uint8, count=w * h, offset=pos
        ).reshape(h, w)
        frames.append(luma)
        pos += frame_bytes
    return w, h, fps, frames


def decode_video_frames(df: DataFrame, every: int = 2) -> DataFrame:
    """Arrow-batched REAL video decode + frame sampling: Y4M payloads →
    one row per sampled luma frame (every ``every``-th) with exact
    integer luma statistics — the decode→sample→feature dataflow of a
    video curation pipeline, on a real container format."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "frame_idx": [], "width": [], "height": [],
                "n_frames": [], "sum_luma": [], "max_luma": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _fps, frames = decode_y4m(bytes(payload))
                for idx in range(0, len(frames), every):
                    f = frames[idx]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_frames"].append(len(frames))
                    out["sum_luma"].append(int(f.sum(dtype=np.int64)))
                    out["max_luma"].append(int(f.max()))
            yield pd.DataFrame(out)

    return df.mapInPandas(
        batches,
        "doc_id bigint, frame_idx int, width int, height int, "
        "n_frames int, sum_luma bigint, max_luma int",
    )


# --------------------------------------------------------------------------
# REAL compressed-codec decode: PNG. The DEFLATE layer is the Python
# standard library's zlib (no external image library), and everything
# around it — chunk walk with CRC verification, IHDR validation, and
# all five scanline filters (None/Sub/Up/Average/Paeth) — is
# implemented here per the PNG spec (RFC 2083). 8-bit non-interlaced
# truecolor (RGB) and truecolor+alpha (RGBA) are supported; palette /
# 16-bit / interlaced images raise the documented gate.
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a, b, c):
    """Paeth predictor over int32 numpy arrays (spec §6.6)."""
    import numpy as np

    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(pixels) -> bytes:
    """numpy (H, W, 3|4) uint8 → a real PNG (8-bit, non-interlaced).

    The filter type cycles y % 5 per scanline, deliberately exercising
    every filter (None/Sub/Up/Average/Paeth) so a decoder round-trip
    covers all five reconstruction paths."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    color_type = 2 if ch == 3 else 6
    raw = bytearray()
    prev = np.zeros((w, ch), dtype=np.int32)
    for y in range(h):
        row = px[y].astype(np.int32)
        left = np.zeros_like(row)
        left[1:] = row[:-1]
        ul = np.zeros_like(row)
        ul[1:] = prev[:-1]
        ft = y % 5
        if ft == 0:
            filt = row
        elif ft == 1:  # Sub
            filt = row - left
        elif ft == 2:  # Up
            filt = row - prev
        elif ft == 3:  # Average
            filt = row - (left + prev) // 2
        else:  # Paeth
            filt = row - _paeth(left, prev, ul)
        raw.append(ft)
        raw += (filt % 256).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """PNG → (width, height, (H, W, 3|4) uint8).

    Real spec-level decode: chunk walk with CRC32 verification,
    multi-IDAT concatenation, zlib inflate, and per-scanline filter
    reconstruction. Sub reconstruction is a vectorized cumulative sum
    (mod-256 addition is associative, so cumsum-then-truncate equals
    the serial recurrence); Up is one vectorized add; Average/Paeth
    carry a true left-dependence and walk pixels within the row."""
    import struct
    import zlib

    import numpy as np

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt_method, interlace = ihdr
    if (
        depth != 8
        or color_type not in (2, 6)
        or comp != 0
        or filt_method != 0
        or interlace != 0
    ):
        raise NotImplementedError(
            "only 8-bit non-interlaced truecolor(+alpha) PNG is "
            f"supported (depth={depth}, color={color_type}, "
            f"interlace={interlace})"
        )
    ch = 3 if color_type == 2 else 4
    raw = zlib.decompress(bytes(idat))
    stride = 1 + w * ch
    if len(raw) != stride * h:
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((h, w, ch), dtype=np.int32)
    prev = np.zeros((w, ch), dtype=np.int32)
    for y in range(h):
        ft = raw[y * stride]
        fr = np.frombuffer(
            raw, dtype=np.uint8, count=w * ch, offset=y * stride + 1
        ).reshape(w, ch).astype(np.int32)
        if ft == 0:
            row = fr
        elif ft == 1:  # Sub: out[x] = fr[x] + out[x-1]
            row = np.cumsum(fr, axis=0)
        elif ft == 2:  # Up
            row = fr + prev
        elif ft == 3:  # Average
            row = np.zeros_like(fr)
            left = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                row[x] = (fr[x] + (left + prev[x]) // 2) % 256
                left = row[x]
        elif ft == 4:  # Paeth
            row = np.zeros_like(fr)
            left = np.zeros(ch, dtype=np.int32)
            ulx = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                row[x] = (fr[x] + _paeth(left, prev[x], ulx)) % 256
                left = row[x]
                ulx = prev[x]
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        row = row % 256
        out[y] = row
        prev = row
    return w, h, out.astype(np.uint8)


def decode_images(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL image decode: BMP/PPM payloads → per-image
    dimensions + exact per-channel sums and means. Wrong padding, row
    order, or channel handling in the decoder shows up immediately as
    a mean mismatch against the closed-form oracle."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "width": [], "height": [], "n_px": [],
                "sum_r": [], "sum_g": [], "sum_b": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = decode_image(bytes(payload))
                sums = px.reshape(-1, px.shape[2])[:, :3].sum(
                    axis=0, dtype=np.int64
                )
                n = w * h
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["n_px"].append(n)
                for k, c in zip(("sum_r", "sum_g", "sum_b"), range(3)):
                    out[k].append(int(sums[c]))
                for k, c in zip(("mean_r", "mean_g", "mean_b"), range(3)):
                    out[k].append(float(sums[c]) / n)
            yield pd.DataFrame(out)

    return df.mapInPandas(
        batches,
        "doc_id bigint, width int, height int, n_px int, "
        "sum_r bigint, sum_g bigint, sum_b bigint, "
        "mean_r double, mean_g double, mean_b double",
    )


def decode_audio(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL audio decode: WAV PCM16 payloads → header
    fields + exact integer sample statistics."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "sample_rate": [], "channels": [],
                "n_samples": [], "sum_amp": [], "peak": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, ch, samples = decode_wav(bytes(payload))
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                out["channels"].append(ch)
                out["n_samples"].append(samples.size)
                out["sum_amp"].append(int(samples.astype(np.int64).sum()))
                out["peak"].append(int(samples.max()) if samples.size else 0)
            yield pd.DataFrame(out)

    return df.mapInPandas(
        batches,
        "doc_id bigint, sample_rate int, channels int, n_samples int, "
        "sum_amp bigint, peak int",
    )
