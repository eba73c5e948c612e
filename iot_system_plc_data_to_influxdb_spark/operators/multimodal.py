"""Multimodal column support (north-star B22).

Image/audio/video payloads are opaque BINARY columns travelling next to
typed metadata; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes never round-trip through Python row-at-a-time.

Decode support has two tiers:

- **Real byte-level decode**, pure struct/numpy/stdlib-zlib,
  hash-checked against closed-form SQL oracles: 24bpp BMP
  (offset/padding/bottom-up/BGR), binary PPM (P6 grammar incl.
  comments), PNG (DEFLATE + all five row filters), GIF87a/89a
  (palette + variable-width LZW + interlace), baseline JPEG at 4:4:4
  and 4:2:0 (Huffman/dequant/IDCT/YCbCr, restart markers), progressive
  JPEG (T.81 Annex G spectral selection + successive approximation),
  RIFF/WAVE PCM16 (proper chunk walk), and Y4M C444 video. On top of
  decode: bilinear resize, 64-bit perceptual hash (pHash), rFFT
  spectrograms, and log-mel filterbank features.
- **Codec-gated**: formats that genuinely need an external codec
  library (H.264/VP9, 12-bit JPEG, non-8-bit PPM, non-C420/C444 Y4M)
  raise a documented NotImplementedError next to a working sibling
  path, and ``extract_features`` computes a deterministic byte
  histogram so the Spark-side plumbing — schema, batch shape,
  partition behavior — is still real and tested
  (tests/test_northstar.py).
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
    (pure numpy), PNG (stdlib-zlib inflate + spec-level chunk walk and
    filter reconstruction — see decode_png below), and baseline JPEG
    (pure-numpy Huffman + dequant + IDCT — see decode_jpeg below).
    Progressive JPEG and video codecs raise the documented gate.
    Returns (width, height, (H, W, C) uint8)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    if payload[:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
        return decode_tiff(payload)
    raise NotImplementedError(
        "video codec decode requires a library not present in this "
        "environment; BMP, PPM, PNG, and baseline JPEG decode natively"
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


# ---------------------------------------------------------------------------
# GIF87a/89a — palette + LZW (GIF's variable-width variant, a different
# compression family from PNG's DEFLATE). Pure python/numpy; covers
# interlaced images (the 4-pass row shuffle) and in-stream CLEAR resets.
# Reference behavior: the reference delegates all media handling to
# external systems; this is north-star B22 surface.
# ---------------------------------------------------------------------------

_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_lzw_encode(indices, mcs: int) -> bytes:
    """GIF-variant LZW: variable-width codes (mcs+1 .. 12 bits) packed
    LSB-first, CLEAR emitted up-front and again on table overflow at
    4096 entries. The width bump happens when the NEXT free code no
    longer fits the current width (encoder counts one table entry
    ahead of the decoder, hence the classic off-by-one pair with
    _gif_lzw_decode's ``len(table) == (1 << size) - 1`` rule)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = n_bits = 0

    def put(code: int, size: int):
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += size
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    def fresh():
        return {}, eoi + 1, mcs + 1

    table, next_code, size = fresh()
    put(clear, size)
    it = iter(int(k) for k in indices)
    try:
        current = next(it)
    except StopIteration:
        put(eoi, size)
    else:
        for k in it:
            nxt = table.get((current, k))
            if nxt is not None:
                current = nxt
                continue
            put(current, size)
            table[(current, k)] = next_code
            next_code += 1
            if next_code == (1 << size) and size < 12:
                size += 1
            current = k
            if next_code == 4096:
                put(clear, size)
                table, next_code, size = fresh()
        put(current, size)
        put(eoi, size)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, mcs: int, n_expected: int):
    """Inverse of _gif_lzw_encode; tolerates deferred-clear streams
    (table sits full at 4096 until a CLEAR arrives)."""
    import numpy as np

    clear, eoi = 1 << mcs, (1 << mcs) + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    size = mcs + 1
    out = bytearray()
    acc = n_bits = pos = 0
    prev = None
    while True:
        while n_bits < size:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << n_bits
            pos += 1
            n_bits += 8
        code = acc & ((1 << size) - 1)
        acc >>= size
        n_bits -= size
        if code == clear:
            table = list(base)
            size = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"bad GIF LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # decoder lags the encoder by one entry: bump one early
            if len(table) == (1 << size) - 1 and size < 12:
                size += 1
        prev = entry
    if len(out) < n_expected:
        raise ValueError("GIF LZW stream ended short of the pixel count")
    return np.frombuffer(bytes(out[:n_expected]), dtype=np.uint8)


def encode_gif(pixels, interlace: bool = False) -> bytes:
    """numpy (H, W, 3) uint8 RGB → GIF89a (global color table, one
    image, real LZW). ``interlace=True`` writes the 4-pass row order.
    Raises if the image needs more than 256 distinct colors (GIF is
    palette-indexed; quantization is a separate concern)."""
    import struct

    import numpy as np

    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF needs a <=256-color palette, got {len(palette)}")
    # global color table size is a power of two >= max(palette, 4)
    bits = max(2, int(len(palette) - 1).bit_length())
    gct = np.zeros((1 << bits, 3), dtype=np.uint8)
    gct[: len(palette)] = palette
    idx = inverse.astype(np.uint16).reshape(h, w)
    if interlace:
        order = [y for start, step in _GIF_INTERLACE_PASSES
                 for y in range(start, h, step)]
        idx = idx[order]
    mcs = bits  # minimum LZW code size = palette bits (>= 2)
    lzw = _gif_lzw_encode(idx.reshape(-1), mcs)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1),
                       0, 0)
    out += gct.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                       0x40 if interlace else 0)
    out.append(mcs)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(payload: bytes):
    """GIF87a/89a → (width, height, (H, W, 3) uint8 RGB): header +
    screen descriptor, global/local color tables, extension-block
    skipping, sub-block reassembly, LZW decode, 4-pass deinterlace.
    First image frame only (animation = repeated image blocks).
    Malformed/truncated payloads fail in-band with ValueError (never
    an executor-crashing IndexError from a mapInPandas task)."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    try:
        return _decode_gif_body(payload)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated or malformed GIF: {exc}") from None


def _decode_gif_body(payload: bytes):
    import struct

    import numpy as np
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if table is None:
            raise ValueError("GIF image has no color table")
        mcs = payload[pos]
        pos += 1
        chunks = []
        while payload[pos]:
            n = payload[pos]
            chunks.append(payload[pos + 1 : pos + 1 + n])
            pos += 1 + n
        idx = _gif_lzw_decode(b"".join(chunks), mcs, w * h).reshape(h, w)
        if ipacked & 0x40:  # deinterlace
            order = [y for start, step in _GIF_INTERLACE_PASSES
                     for y in range(start, h, step)]
            deint = np.empty_like(idx)
            deint[order] = idx
            idx = deint
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("GIF pixel index outside the color table")
        return w, h, table[idx]
    raise ValueError("GIF contains no image block")


def resize_bilinear(pixels, out_w: int, out_h: int):
    """Bilinear image resize with half-pixel centers and edge clamp
    (the align_corners=False convention of torch/PIL): source coord
    of output x is (x + 0.5) * (W_in / W_out) - 0.5. Accumulates in
    float64 and emits uint8 via round-half-up (floor(v + 0.5)) — at
    exact 2:1 downscale the weights are exactly 0.25 each, so output
    equals the 2x2 box mean bit-exactly (the SQL-oracle anchor for
    b22_resize_bilinear). Fully vectorized: one fancy-index gather +
    weighted sum per axis pair, no per-pixel Python."""
    import numpy as np

    h, w, c = pixels.shape
    if out_w <= 0 or out_h <= 0:
        raise ValueError("resize target must be positive")
    xs = (np.arange(out_w, dtype=np.float64) + 0.5) * (w / out_w) - 0.5
    ys = (np.arange(out_h, dtype=np.float64) + 0.5) * (h / out_h) - 0.5
    x0f, y0f = np.floor(xs), np.floor(ys)
    fx, fy = xs - x0f, ys - y0f
    x0 = np.clip(x0f.astype(np.int64), 0, w - 1)
    y0 = np.clip(y0f.astype(np.int64), 0, h - 1)
    x1 = np.minimum(x0f.astype(np.int64) + 1, w - 1).clip(0)
    y1 = np.minimum(y0f.astype(np.int64) + 1, h - 1).clip(0)
    p = pixels.astype(np.float64)
    fy_ = fy[:, None, None]
    fx_ = fx[None, :, None]
    top = p[y0][:, x0] * (1 - fx_) + p[y0][:, x1] * fx_
    bot = p[y1][:, x0] * (1 - fx_) + p[y1][:, x1] * fx_
    out = top * (1 - fy_) + bot * fy_
    return np.floor(out + 0.5).clip(0, 255).astype(np.uint8)


def encode_wav(samples, sample_rate: int = 8000, channels: int = 1) -> bytes:
    """numpy int16 samples → RIFF/WAVE PCM16. For ``channels > 1`` the
    input is already interleaved frame-major (L R L R ...), the RIFF
    on-disk order."""
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * 2 * channels, 2 * channels, 16,
    )
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def encode_wav_pcm24(samples, sample_rate: int = 8000) -> bytes:
    """numpy int32 mono samples in [-2^23, 2^23) → RIFF/WAVE PCM24
    (format 1, bits=24, blockAlign=3 — the pro-audio layout). 3-byte
    little-endian two's complement per sample."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype=np.int64)
    if s.size and (s.min() < -(1 << 23) or s.max() >= (1 << 23)):
        raise ValueError("PCM24 samples out of 24-bit range")
    u = (s & 0xFFFFFF).astype("<u4")
    b4 = u.view(np.uint8).reshape(-1, 4) if s.size else (
        np.zeros((0, 4), dtype=np.uint8)
    )
    data = b4[:, :3].tobytes()  # drop the high zero byte of each u32
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 3, 3, 24)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def encode_wav_float32(samples, sample_rate: int = 8000) -> bytes:
    """numpy samples → RIFF/WAVE IEEE float (format 3, bits=32) — the
    DAW/export layout. Little-endian float32 per sample."""
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, sample_rate, sample_rate * 4, 4, 32)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(payload: bytes):
    """RIFF/WAVE → (sample_rate, channels, numpy integer samples).

    Walks the chunk list properly (fmt may be followed by LIST/fact
    chunks before data; chunks are word-aligned). Handles PCM16 and
    PCM24 (format 1) natively and IMA ADPCM (format 0x11, 4-bit
    compressed) via the integer state machine below; other formats
    raise the documented gate."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = channels = bits = audio_fmt = None
    n_samples = None
    data = None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack_from(
                "<HHI", payload, body
            )
            bits = struct.unpack_from("<H", payload, body + 14)[0]
            if audio_fmt == 0x11 and size >= 20:
                (n_samples,) = struct.unpack_from("<H", payload, body + 18)
            if audio_fmt not in (1, 3, 0x06, 0x07, 0x11) or (
                audio_fmt == 1 and bits not in (16, 24)
            ) or (audio_fmt == 3 and bits != 32):
                raise NotImplementedError(
                    f"only PCM16/24, float32, A-law, mu-law, and "
                    f"IMA-ADPCM supported (fmt={audio_fmt}, bits={bits})"
                )
        elif cid == b"data":
            data = payload[body : body + size]
        pos = body + size + (size % 2)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if audio_fmt == 3:
        # IEEE float32; integer-valued samples (within 2^24) survive
        # the float round-trip exactly, which is what makes the stats
        # oracle-checkable on the synthetic corpus
        samples = np.frombuffer(data, dtype="<f4", count=len(data) // 4)
        return sample_rate, channels, samples
    if audio_fmt == 1 and bits == 24:
        # 3-byte little-endian two's complement → sign-extended int32
        raw = np.frombuffer(data, dtype=np.uint8, count=(len(data) // 3) * 3)
        tri = raw.reshape(-1, 3).astype(np.int64)
        u = tri[:, 0] | (tri[:, 1] << 8) | (tri[:, 2] << 16)
        samples = (u - ((u >> 23) << 24)).astype(np.int32)
        return sample_rate, channels, samples
    if audio_fmt == 1:
        samples = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
        return sample_rate, channels, samples
    if audio_fmt == 0x06:  # G.711 A-law: one code byte per sample
        codes = np.frombuffer(data, dtype=np.uint8)
        return sample_rate, channels, alaw_decode(codes)
    if audio_fmt == 0x07:  # G.711 mu-law: one code byte per sample
        codes = np.frombuffer(data, dtype=np.uint8)
        return sample_rate, channels, mulaw_decode(codes)
    return sample_rate, channels, _ima_adpcm_decode_block(data, n_samples)


# IMA/DVI ADPCM reference tables (public T.811 / IMA spec constants)
_IMA_STEP = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step_code(sample: int, pred: int, idx: int):
    """One IMA ADPCM encode step: returns (4-bit code, new pred, new
    idx). The encoder reconstructs exactly like the decoder, so both
    sides track identical integer state (the property the recursive-
    CTE oracle replays)."""
    step = _IMA_STEP[idx]
    diff = sample - pred
    code = 0
    if diff < 0:
        code = 8
        diff = -diff
    if diff >= step:
        code |= 4
        diff -= step
    if diff >= step >> 1:
        code |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        code |= 1
    return code, *_ima_reconstruct(code, pred, idx)


def _ima_reconstruct(code: int, pred: int, idx: int):
    """Shared encode/decode state update for one 4-bit code."""
    step = _IMA_STEP[idx]
    diffq = step >> 3
    if code & 4:
        diffq += step
    if code & 2:
        diffq += step >> 1
    if code & 1:
        diffq += step >> 2
    pred = pred - diffq if code & 8 else pred + diffq
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX[code & 7]))
    return pred, idx


def _ima_adpcm_decode_block(data: bytes, n_samples=None):
    """One IMA ADPCM block: 4-byte header (predictor int16, step index
    u8, reserved u8) then packed nibbles, LOW nibble first. Sample 0
    IS the header predictor (standard block layout)."""
    import struct

    import numpy as np

    if len(data) < 4:
        raise ValueError("truncated ADPCM block header")
    pred, idx, _res = struct.unpack_from("<hBB", data, 0)
    if idx > 88:
        raise ValueError(f"ADPCM step index {idx} out of range")
    out = [pred]
    limit = n_samples if n_samples is not None else 1 + 2 * (len(data) - 4)
    for byte in data[4:]:
        for code in (byte & 0x0F, byte >> 4):
            if len(out) >= limit:
                break
            pred, idx = _ima_reconstruct(code, pred, idx)
            out.append(pred)
    if n_samples is not None and len(out) < n_samples:
        raise ValueError("ADPCM data short of declared sample count")
    return np.asarray(out, dtype=np.int16)


def encode_wav_adpcm(samples, sample_rate: int = 8000,
                     step_index: int = 0) -> bytes:
    """numpy int16 mono samples → RIFF/WAVE IMA-ADPCM (format 0x11),
    one block: header carries sample 0 as the initial predictor and
    ``step_index``; remaining samples compress to 4-bit codes (low
    nibble first). The fmt extension carries samplesPerBlock so odd
    counts round-trip exactly."""
    import struct

    import numpy as np

    samples = np.asarray(samples, dtype=np.int16)
    if samples.size == 0:
        raise ValueError("need at least one sample")
    pred, idx = int(samples[0]), int(step_index)
    if not 0 <= idx <= 88:
        raise ValueError("step index must be in [0, 88]")
    nibbles = []
    for s in samples[1:]:
        code, pred, idx = _ima_step_code(int(s), pred, idx)
        nibbles.append(code)
    if len(nibbles) % 2:
        nibbles.append(0)
    body = bytearray(struct.pack("<hBB", int(samples[0]), step_index, 0))
    for lo, hi in zip(nibbles[::2], nibbles[1::2]):
        body.append(lo | (hi << 4))
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, 1, sample_rate,
        (sample_rate * len(body)) // max(1, samples.size),  # nominal rate
        len(body), 4, 2, samples.size,
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + bytes(body)
        + (b"\x00" if len(body) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# --------------------------------------------------------------------------
# REAL video-container decode: YUV4MPEG2 (.y4m) — the uncompressed
# interchange format every video toolchain speaks (ffmpeg/x264 I/O).
# ASCII stream header with order-free parameter tokens, then one
# "FRAME\n" marker + raw planar YCbCr per frame. C420 subsampling is
# honored (luma W×H + two W/2×H/2 chroma planes). Compressed video
# codecs (H.264/VP9/…) remain the documented gate.
# --------------------------------------------------------------------------


def encode_y4m(frames, fps: int = 25, c444: bool = False) -> bytes:
    """list of (H, W) uint8 luma frames → YUV4MPEG2 bytes (chroma
    planes constant 128 — grayscale video). Default C420jpeg
    (subsampled chroma, 1.5·W·H per frame); ``c444`` writes full-res
    chroma (C444, 3·W·H per frame) — the other byte-budget branch of
    the decoder's colorspace dispatch."""
    import numpy as np

    first = np.asarray(frames[0], dtype=np.uint8)
    h, w = first.shape
    if c444:
        cs = "C444"
        chroma = b"\x80" * (w * h * 2)
    else:
        if h % 2 or w % 2:
            raise ValueError("C420 needs even dimensions")
        cs = "C420jpeg"
        chroma = b"\x80" * ((w // 2) * (h // 2) * 2)
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 {cs}\n".encode()
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


def encode_png_palette(pixels) -> bytes:
    """numpy (H, W, 3) uint8 with ≤256 distinct colors → a real
    INDEXED-COLOR PNG (color type 3): PLTE palette chunk + 8-bit index
    scanlines. The same y % 5 filter cycle as encode_png, applied to
    the index bytes (PNG filters operate on bytes regardless of color
    type), so the round-trip covers every filter on the palette path
    too."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    if ch != 3:
        raise ValueError("palette PNG wants (H, W, 3) input")
    flat = px.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("more than 256 distinct colors")
    idx = inverse.reshape(h, w).astype(np.uint8)
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int32)
    for y in range(h):
        row = idx[y].astype(np.int32)
        left = np.zeros_like(row)
        left[1:] = row[:-1]
        ul = np.zeros_like(row)
        ul[1:] = prev[:-1]
        ft = y % 5
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left
        elif ft == 2:
            filt = row - prev
        elif ft == 3:
            filt = row - (left + prev) // 2
        else:
            filt = row - _paeth(left, prev, ul)
        raw.append(ft)
        raw += (filt % 256).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", palette.astype(np.uint8).tobytes())
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_gray(pixels) -> bytes:
    """numpy (H, W) uint8 luma → a real GRAYSCALE PNG (color type 0,
    8-bit) — the screenshot/scanned-document variant. Same y % 5
    filter cycle over the 1-byte-per-pixel scanlines."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int32)
    for y in range(h):
        row = px[y].astype(np.int32)
        left = np.zeros_like(row)
        left[1:] = row[:-1]
        ul = np.zeros_like(row)
        ul[1:] = prev[:-1]
        ft = y % 5
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left
        elif ft == 2:
            filt = row - prev
        elif ft == 3:
            filt = row - (left + prev) // 2
        else:
            filt = row - _paeth(left, prev, ul)
        raw.append(ft)
        raw += (filt % 256).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
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
    plte = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"PLTE":
            if length % 3:
                raise ValueError("PLTE length not a multiple of 3")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
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
        or color_type not in (0, 2, 3, 6)
        or comp != 0
        or filt_method != 0
        or interlace != 0
    ):
        raise NotImplementedError(
            "only 8-bit non-interlaced gray/truecolor(+alpha)/indexed "
            f"PNG is supported (depth={depth}, color={color_type}, "
            f"interlace={interlace})"
        )
    if color_type == 3 and plte is None:
        raise ValueError("indexed PNG missing PLTE chunk")
    ch = {0: 1, 2: 3, 3: 1, 6: 4}[color_type]
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
    if color_type == 3:
        idx = out[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        return w, h, plte[idx]
    if color_type == 0:
        # grayscale → replicated RGB, so every consumer sees one
        # uniform (H, W, 3) shape regardless of source color type
        return w, h, np.repeat(out.astype(np.uint8), 3, axis=2)
    return w, h, out.astype(np.uint8)


# ---------------------------------------------------------------------------
# Baseline JPEG (ISO/IEC 10918-1), pure numpy/stdlib. The encoder emits
# JFIF / SOF0 with the Annex K Huffman tables at 4:4:4 or 4:2:0 (2x2
# box-averaged chroma, 16x16 MCUs — the layout camera/phone files use);
# the decoder is a general baseline-sequential reader (tables from the
# FILE, not assumed: multi-table DQT/DHT markers, restart intervals,
# grayscale or 3-channel, any DIVISIBLE sampling layout via the
# interleaved-MCU walk with replication chroma upsampling). Progressive
# (SOF2) and non-divisible sampling raise typed gates. Quantization
# defaults to all-ones so a block-constant grayscale image round-trips
# EXACTLY (DC-only blocks are integer-representable through
# FDCT->quant->dequant->IDCT, and grayscale chroma is constant 128 —
# invariant under box downsample + replication upsample), which is what
# makes decode hash-checkable against a closed-form SQL oracle at BOTH
# sampling layouts.
# ---------------------------------------------------------------------------
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
# Annex K Huffman table specs: (BITS[1..16], HUFFVAL)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
        0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
        0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
        0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
        0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
        0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
        0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
        0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
        0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
        0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
        0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
        0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
        0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
        0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
        0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
        0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
        0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
        0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix():
    import numpy as np

    n = np.arange(8)
    k = n[:, None]
    a = np.cos((2 * n[None, :] + 1) * k * np.pi / 16) / 2.0
    a[0, :] /= np.sqrt(2.0)
    return a  # orthonormal: F = A @ f @ A.T is the JPEG FDCT


def _huff_encode_table(bits, vals):
    """(BITS, HUFFVAL) → {value: (code, length)} (canonical codes)."""
    table = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return table


def _huff_decode_table(bits, vals):
    """(BITS, HUFFVAL) → {(length, code): value}."""
    table = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self._n:
            self.put(0x7F, 7 - ((self._n - 1) % 8))  # pad with 1-bits


def _mag_bits(v: int):
    """Coefficient → (category, appended bits) per spec F.1.2.1."""
    if v == 0:
        return 0, 0
    s = abs(v).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def encode_jpeg(
    pixels, quant=None, restart_interval: int = 0, subsampling: str = "444"
) -> bytes:
    """numpy (H, W, 3) uint8 RGB → baseline JFIF JPEG (SOF0, Annex K
    Huffman tables). ``quant`` is an optional 64-entry zigzag-order
    quantization list shared by luma and chroma; default all-ones,
    under which block-constant grayscale content round-trips exactly
    (for 4:2:0 too: grayscale chroma is constant 128, invariant under
    the 2×2 box downsample). ``restart_interval`` > 0 emits DRI + RSTn
    markers every that many MCUs (the error-resilience feature real
    camera files use; exercises the decoder's restart path).
    ``subsampling`` is ``"444"`` (1×1 components, 8×8-pixel MCUs) or
    ``"420"`` (2×2-sampled luma, 2×2 box-averaged chroma, 16×16-pixel
    MCUs of 4 Y + 1 Cb + 1 Cr blocks — the layout virtually every
    camera/phone JPEG uses)."""
    import struct

    import numpy as np

    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    s420 = subsampling == "420"
    px = np.asarray(pixels, dtype=np.float64)
    h, w, _ = px.shape
    q = np.ones(64, dtype=np.int64) if quant is None else np.asarray(
        quant, dtype=np.int64
    )
    # RGB → YCbCr (JFIF / BT.601 full-range)
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
    ]
    # pad to whole-MCU multiples by edge replication (8 px at 4:4:4,
    # 16 px at 4:2:0 so the downsampled chroma pads to whole blocks)
    unit = 16 if s420 else 8
    ph, pw = -(-h // unit) * unit, -(-w // unit) * unit
    planes = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes
    ]
    if s420:
        # chroma: 2×2 box average (the conventional JFIF downsample)
        planes[1:] = [
            p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            for p in planes[1:]
        ]
    A = _dct_matrix()
    qz = q[np.argsort(_ZIGZAG)].reshape(8, 8)  # natural-order table

    enc_dc = [_huff_encode_table(*_DC_LUMA), _huff_encode_table(*_DC_CHROMA)]
    enc_ac = [_huff_encode_table(*_AC_LUMA), _huff_encode_table(*_AC_CHROMA)]
    bw = _BitWriter()
    pred = [0, 0, 0]

    def put_block(ci: int, block) -> None:
        tbl = 0 if ci == 0 else 1
        coef = A @ (block - 128.0) @ A.T
        qc = np.round(coef / qz).astype(np.int64)
        zz = qc.flatten()[_ZIGZAG]
        # DC: differential
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        s, extra = _mag_bits(diff)
        code, ln = enc_dc[tbl][s]
        bw.put(code, ln)
        if s:
            bw.put(extra, s)
        # AC: run-length of zeros + category
        run = 0
        for ac in zz[1:]:
            v = int(ac)
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = enc_ac[tbl][0xF0]  # ZRL
                bw.put(code, ln)
                run -= 16
            s, extra = _mag_bits(v)
            code, ln = enc_ac[tbl][(run << 4) | s]
            bw.put(code, ln)
            bw.put(extra, s)
            run = 0
        if run:
            code, ln = enc_ac[tbl][0x00]  # EOB
            bw.put(code, ln)

    mcu = 0
    for by in range(ph // unit):
        for bx in range(pw // unit):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                n = mcu // restart_interval - 1
                bw.out += bytes([0xFF, 0xD0 + n % 8])
                pred = [0, 0, 0]
            mcu += 1
            if s420:
                # MCU = 4 luma blocks in raster order, then Cb, Cr
                Y = planes[0]
                for v in range(2):
                    for hh in range(2):
                        yy, xx = (2 * by + v) * 8, (2 * bx + hh) * 8
                        put_block(0, Y[yy : yy + 8, xx : xx + 8])
                for ci in (1, 2):
                    put_block(
                        ci,
                        planes[ci][
                            by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                        ],
                    )
            else:
                for ci, plane in enumerate(planes):
                    put_block(
                        ci,
                        plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
                    )
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    zz_q = bytes(int(q[i]) for i in range(64))
    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + zz_q)  # DQT table 0 (luma)
    out += seg(0xFFDB, b"\x01" + zz_q)  # DQT table 1 (chroma)
    out += seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + (
            b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"  # Y 2x2, Cb/Cr 1x1
            if s420
            else b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"  # all 1x1
        ),
    )
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    for tc_th, (bits, vals) in (
        (0x00, _DC_LUMA), (0x10, _AC_LUMA),
        (0x01, _DC_CHROMA), (0x11, _AC_CHROMA),
    ):
        out += seg(
            0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals)
        )
    out += seg(0xFFDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
    out += bytes(bw.out)
    out += b"\xff\xd9"  # EOI
    return out


class _BitReader:
    """Entropy-coded-segment reader: 0xFF00 unstuffing, restart-marker
    detection at byte boundaries."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos : self.pos + 1]
                if nxt == b"\x00":
                    self.pos += 1
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt.hex()} in entropy data"
                    )
            self._acc = byte
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_and_expect_rst(self, n: int) -> None:
        self._n = 0
        # 1-bit padding before a marker can itself be a stuffed 0xFF00
        while self.data[self.pos : self.pos + 2] == b"\xff\x00":
            self.pos += 2
        if self.data[self.pos : self.pos + 2] != bytes([0xFF, 0xD0 + n % 8]):
            raise ValueError("missing JPEG restart marker")
        self.pos += 2

    def decode_huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """Appended-bits value → signed coefficient (spec F.2.2.1)."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes):
    """Baseline JPEG → (width, height, (H, W, 3) uint8 RGB).

    General baseline-sequential decoder: quantization and Huffman
    tables are read from the FILE (multi-table markers supported),
    restart intervals honored, grayscale accepted, and any divisible
    component sampling layout decoded via the interleaved-MCU walk of
    spec A.2.3 — 4:4:4, 4:2:0 (the camera default), 4:2:2/4:4:0 —
    with replication upsampling of subsampled chroma. Progressive
    (SOF2) and non-divisible sampling raise typed NotImplementedError
    gates."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict = {}
    htables: dict = {}  # (class, id) -> decode table
    frame = None
    dri = 0
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT (may hold several tables)
            _parse_dqt(body, qtables)
        elif marker == 0xC4:  # DHT (may hold several tables)
            _parse_dht(body, htables)
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision, fh, fw, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for c in range(ncomp):
                # components start after precision(1)+h(2)+w(2)+ncomp(1)
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (fw, fh, comps)
        elif marker == 0xC2:  # SOF2 — hand off to the multi-scan path
            return decode_jpeg_progressive(payload)
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for c in range(ns):
                cid, tt = body[1 + 2 * c : 3 + 2 * c]
                scan.append((cid, tt >> 4, tt & 0xF))
            pos = pos + 2 + length
            break
        pos += 2 + length
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    fw, fh, comps = frame
    tq_by_cid = {cid: tq for cid, _h, _v, tq in comps}
    # a single-component scan is NON-interleaved per spec A.2.2: the
    # MCU is one block and sampling factors don't apply (grayscale)
    if len(scan) == 1:
        sampling = {scan[0][0]: (1, 1)}
    else:
        sampling = {cid: (hc, vc) for cid, hc, vc, _tq in comps}
    hmax = max(hc for hc, _vc in sampling.values())
    vmax = max(vc for _hc, vc in sampling.values())
    for hc, vc in sampling.values():
        if hc < 1 or vc < 1 or hmax % hc or vmax % vc:
            raise NotImplementedError(
                f"non-divisible JPEG sampling factors {hc}x{vc} "
                f"(max {hmax}x{vmax}) not supported"
            )
    A = _dct_matrix()
    inv_zig = np.argsort(np.asarray(_ZIGZAG))

    br = _BitReader(payload, pos)
    mx, my = -(-fw // (8 * hmax)), -(-fh // (8 * vmax))
    samp = [sampling[cid] for cid, _td, _ta in scan]
    planes = [
        np.zeros((my * 8 * vc, mx * 8 * hc)) for hc, vc in samp
    ]
    pred = [0] * len(scan)
    mcu = 0
    for by in range(my):
        for bx in range(mx):
            if dri and mcu and mcu % dri == 0:
                br.align_and_expect_rst(mcu // dri - 1)
                pred = [0] * len(scan)
            for ci, (cid, td, ta) in enumerate(scan):
                dc_t = htables[(0, td)]
                ac_t = htables[(1, ta)]
                hc, vc = samp[ci]
                # Hc×Vc data units per MCU, raster order (spec A.2.3)
                for dv in range(vc):
                    for dh in range(hc):
                        zz = np.zeros(64, dtype=np.int64)
                        s = br.decode_huff(dc_t)
                        diff = _extend(br.bits(s), s) if s else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = br.decode_huff(ac_t)
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC index overrun")
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        coef = (zz * qtables[tq_by_cid[cid]])[
                            inv_zig
                        ].reshape(8, 8)
                        block = A.T @ coef @ A + 128.0
                        yy = (by * vc + dv) * 8
                        xx = (bx * hc + dh) * 8
                        planes[ci][yy : yy + 8, xx : xx + 8] = block
            mcu += 1

    return _jpeg_reconstruct(planes, samp, hmax, vmax, fw, fh)


def _jpeg_reconstruct(planes, samp, hmax, vmax, fw: int, fh: int):
    """Shared decode tail: upsample subsampled components by
    replication (each chroma sample covers an (vmax/Vc)×(hmax/Hc)
    pixel tile — exact inverse of a box downsample on tile-constant
    content), crop to the frame, and convert YCbCr→RGB (BT.601
    full-range; grayscale replicates the single plane)."""
    import numpy as np

    planes = [
        (
            p.repeat(vmax // vc, axis=0).repeat(hmax // hc, axis=1)
            if (hc, vc) != (hmax, vmax)
            else p
        )[:fh, :fw]
        for p, (hc, vc) in zip(planes, samp)
    ]
    if len(planes) == 1:
        y = planes[0]
        rgb = np.stack([y, y, y], axis=2)
    else:
        y, cb, cr = planes
        rgb = np.stack(
            [
                y + 1.402 * (cr - 128.0),
                y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                y + 1.772 * (cb - 128.0),
            ],
            axis=2,
        )
    return fw, fh, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _parse_dqt(body: bytes, qtables: dict) -> None:
    """DQT segment body → {table_id: 64 zigzag-order int64 values}
    (a single segment may carry several tables; 8- and 16-bit
    precisions both accepted)."""
    import numpy as np

    i = 0
    while i < len(body):
        pq, tq = body[i] >> 4, body[i] & 0xF
        i += 1
        if pq:
            vals = np.frombuffer(
                body, dtype=">u2", count=64, offset=i
            ).astype(np.int64)
            i += 128
        else:
            vals = np.frombuffer(
                body, dtype=np.uint8, count=64, offset=i
            ).astype(np.int64)
            i += 64
        qtables[tq] = vals


def _parse_dht(body: bytes, htables: dict) -> None:
    """DHT segment body → {(class, id): canonical decode table}
    (a single segment may carry several tables)."""
    i = 0
    while i < len(body):
        tc, th = body[i] >> 4, body[i] & 0xF
        bits = list(body[i + 1 : i + 17])
        n = sum(bits)
        if len(bits) < 16 or i + 17 + n > len(body):
            raise ValueError("truncated JPEG DHT segment")
        vals = list(body[i + 17 : i + 17 + n])
        htables[(tc, th)] = _huff_decode_table(bits, vals)
        i += 17 + n


# --------------------------------------------------------------------------
# Progressive JPEG (SOF2, ITU T.81 Annex G): the frame's DCT
# coefficients arrive over MULTIPLE scans — spectral selection splits
# the zigzag band, successive approximation delivers coefficient bits
# most-significant-first — so the decoder accumulates per-component
# coefficient arrays across scans and runs dequant+IDCT once at the
# end. This is the layout most web JPEGs use. Everything below is
# pure numpy/stdlib, spec-derived (T.81 figures G.3-G.7); the scan
# script mirrors the conventional 10-scan spectral/successive split.
# --------------------------------------------------------------------------

# Annex K's AC tables carry no EOBn symbols (their only size-0 codes
# are EOB0 and ZRL), but progressive AC scans need EOB1..EOB14 for
# end-of-band runs. Encoding therefore uses this fixed full-alphabet
# AC table: 255 symbols at 8 bits + one at 9 — a valid canonical code
# whose all-ones prefix stays unused as T.81 C.2 requires.
_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)

# The conventional 3-component progressive scan script: interleaved
# DC first (Al=1), per-component AC bands coarse-to-fine with an
# extra successive-approximation level (Al 2→1→0) on luma, DC
# refinement, then AC refinement per component. Exercises every
# decoder path: interleaved+non-interleaved walks, EOB runs, ZRL in
# refinement, multi-level approximation.
_PROG_SCANS_3 = [
    ((0, 1, 2), 0, 0, 0, 1),  # DC first, Al=1
    ((0,), 1, 5, 0, 2),       # Y AC 1-5 first, Al=2
    ((2,), 1, 63, 0, 1),      # Cr AC first, Al=1
    ((1,), 1, 63, 0, 1),      # Cb AC first, Al=1
    ((0,), 6, 63, 0, 2),      # Y AC 6-63 first, Al=2
    ((0,), 1, 63, 2, 1),      # Y AC refine, Al 2→1
    ((0, 1, 2), 0, 0, 1, 0),  # DC refine, Al 1→0
    ((2,), 1, 63, 1, 0),      # Cr AC refine
    ((1,), 1, 63, 1, 0),      # Cb AC refine
    ((0,), 1, 63, 1, 0),      # Y AC refine
]


def _jpeg_coef_blocks(pixels, quant=None, subsampling="444"):
    """RGB pixels → per-component MCU-padded (gh, gw, 64) arrays of
    zigzag-order quantized DCT coefficients. The per-block float path
    (A @ (block-128) @ A.T, round, zigzag) is kept IDENTICAL to the
    baseline encoder's so a baseline and a progressive encode of the
    same pixels quantize to bit-identical coefficients."""
    import numpy as np

    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    s420 = subsampling == "420"
    px = np.asarray(pixels, dtype=np.float64)
    h, w, _ = px.shape
    q = np.ones(64, dtype=np.int64) if quant is None else np.asarray(
        quant, dtype=np.int64
    )
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
    ]
    unit = 16 if s420 else 8
    ph, pw = -(-h // unit) * unit, -(-w // unit) * unit
    planes = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes
    ]
    if s420:
        planes[1:] = [
            p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            for p in planes[1:]
        ]
    A = _dct_matrix()
    qz = q[np.argsort(_ZIGZAG)].reshape(8, 8)
    comps = []
    for p in planes:
        gh, gw = p.shape[0] // 8, p.shape[1] // 8
        out = np.zeros((gh, gw, 64), dtype=np.int64)
        for by in range(gh):
            for bx in range(gw):
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = A @ (block - 128.0) @ A.T
                qc = np.round(coef / qz).astype(np.int64)
                out[by, bx] = qc.flatten()[_ZIGZAG]
        comps.append(out)
    return comps, q, h, w


class _ProgACWriter:
    """Per-scan EOB-run + buffered-correction-bit state for
    progressive AC encoding (T.81 G.1.2.2-3): the EOBn symbol's
    appended length bits are followed by every correction bit
    buffered since the run began, and runs cap at 0x7FFF (EOB14)."""

    def __init__(self, bw: "_BitWriter", table: dict):
        self.bw = bw
        self.table = table
        self.eobrun = 0
        self.pending: list = []  # correction bits folded into the run

    def sym(self, rs: int) -> None:
        code, ln = self.table[rs]
        self.bw.put(code, ln)

    def flush_eobrun(self) -> None:
        if self.eobrun == 0:
            return
        nbits = self.eobrun.bit_length() - 1
        self.sym(nbits << 4)
        if nbits:
            self.bw.put(self.eobrun - (1 << nbits), nbits)
        for bit in self.pending:
            self.bw.put(bit, 1)
        self.eobrun = 0
        self.pending = []

    def end_block(self, trailing_zeros: bool, br: list) -> None:
        """Fold a block's unterminated tail into the EOB run."""
        if trailing_zeros or br:
            self.eobrun += 1
            self.pending.extend(br)
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()


def encode_jpeg_progressive(
    pixels,
    quant=None,
    subsampling: str = "444",
    restart_interval: int = 0,
    nscans: int | None = None,
) -> bytes:
    """numpy (H, W, 3) uint8 RGB → progressive JFIF JPEG (SOF2).

    Same coefficient math and container conventions as
    ``encode_jpeg``, but entropy data is delivered over the 10-scan
    spectral-selection + successive-approximation script in
    ``_PROG_SCANS_3``. Successive approximation is lossless once all
    scans are present, so a complete progressive file decodes to
    exactly the pixels its baseline twin does. ``nscans`` truncates
    the script after N scans (still a conforming file — progressive
    streams may end early) for coarse-preview testing;
    ``restart_interval`` emits DRI + per-scan RSTn markers."""
    import struct

    coefs, q, h, w = _jpeg_coef_blocks(pixels, quant, subsampling)
    s420 = subsampling == "420"
    samp = [(2, 2), (1, 1), (1, 1)] if s420 else [(1, 1)] * 3
    hmax = vmax = 2 if s420 else 1
    mx, my = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    # non-interleaved grids (T.81 A.2.2): ceil(comp size / 8) blocks,
    # NOT padded to whole MCUs like the interleaved DC-scan walk
    nb = []
    for hc, vc in samp:
        cw, ch = -(-(w * hc) // hmax), -(-(h * vc) // vmax)
        nb.append((-(-ch // 8), -(-cw // 8)))
    enc_dc = [_huff_encode_table(*_DC_LUMA), _huff_encode_table(*_DC_CHROMA)]
    enc_ac = _huff_encode_table(*_AC_PROG)
    scans = _PROG_SCANS_3 if nscans is None else _PROG_SCANS_3[:nscans]

    chunks = []
    for comps, ss, se, ah, al in scans:
        bw = _BitWriter()
        rst = [0]  # marker counter, shared by the walkers below

        def restart(bw=bw, rst=rst):
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst[0] % 8])
            rst[0] += 1

        if ss == 0:
            pred = [0] * len(comps)
            mcu = 0
            for by in range(my):
                for bx in range(mx):
                    if restart_interval and mcu and mcu % restart_interval == 0:
                        restart()
                        pred = [0] * len(comps)
                    for si, ci in enumerate(comps):
                        hc, vc = samp[ci]
                        tbl = enc_dc[0 if ci == 0 else 1]
                        for dv in range(vc):
                            for dh in range(hc):
                                dc = int(coefs[ci][by * vc + dv, bx * hc + dh, 0])
                                if ah == 0:
                                    v = dc >> al  # arithmetic point transform
                                    diff = v - pred[si]
                                    pred[si] = v
                                    s, extra = _mag_bits(diff)
                                    code, ln = tbl[s]
                                    bw.put(code, ln)
                                    if s:
                                        bw.put(extra, s)
                                else:
                                    bw.put((dc >> al) & 1, 1)
                    mcu += 1
        else:
            ci = comps[0]
            nbh, nbw = nb[ci]
            wtr = _ProgACWriter(bw, enc_ac)
            blk = 0
            for by in range(nbh):
                for bx in range(nbw):
                    if restart_interval and blk and blk % restart_interval == 0:
                        wtr.flush_eobrun()
                        restart()
                    zz = coefs[ci][by, bx]
                    if ah == 0:
                        _enc_ac_first_block(wtr, zz, ss, se, al)
                    else:
                        _enc_ac_refine_block(wtr, zz, ss, se, al)
                    blk += 1
            wtr.flush_eobrun()
        bw.flush()
        sos = bytes([len(comps)])
        for ci in comps:
            td = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (td << 4) | 0])
        sos += bytes([ss, se, (ah << 4) | al])
        chunks.append(
            struct.pack(">HH", 0xFFDA, len(sos) + 2) + sos + bytes(bw.out)
        )

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    zz_q = bytes(int(q[i]) for i in range(64))
    out = b"\xff\xd8"
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + zz_q)
    out += seg(0xFFDB, b"\x01" + zz_q)
    out += seg(
        0xFFC2,
        struct.pack(">BHHB", 8, h, w, 3)
        + (
            b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
            if s420
            else b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
        ),
    )
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    for tc_th, (bits, vals) in (
        (0x00, _DC_LUMA),
        (0x01, _DC_CHROMA),
        (0x10, _AC_PROG),
    ):
        out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    out += b"".join(chunks)
    out += b"\xff\xd9"
    return out


def _enc_ac_first_block(wtr: _ProgACWriter, zz, ss: int, se: int, al: int):
    """One block of an AC first scan (T.81 G.1.2.2): run-length code
    the point-transformed band, folding an all-zero tail into the
    shared EOB run."""
    bw = wtr.bw
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = (abs(v) >> al) * (1 if v >= 0 else -1)  # truncate toward 0
        if t == 0:
            r += 1
            continue
        wtr.flush_eobrun()
        while r > 15:
            wtr.sym(0xF0)
            r -= 16
        s, extra = _mag_bits(t)
        wtr.sym((r << 4) | s)
        bw.put(extra, s)
        r = 0
    wtr.end_block(r > 0, [])


def _enc_ac_refine_block(wtr: _ProgACWriter, zz, ss: int, se: int, al: int):
    """One block of an AC refinement scan (T.81 G.1.2.3): correction
    bits for history-nonzero coefficients, (run, 1) codes for newly
    significant ones, ZRL only when not foldable into the EOB run."""
    bw = wtr.bw
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = -1  # band-relative index of last newly-significant coef
    for i, t in enumerate(absv):
        if t == 1:
            eob = i
    r = 0
    br: list = []  # this block's not-yet-emitted correction bits
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eob:
            wtr.flush_eobrun()
            wtr.sym(0xF0)
            r -= 16
            for bit in br:
                bw.put(bit, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        # newly significant (t == 1): emit run + sign + buffered bits
        wtr.flush_eobrun()
        wtr.sym((r << 4) | 1)
        bw.put(1 if int(zz[ss + i]) >= 0 else 0, 1)
        for bit in br:
            bw.put(bit, 1)
        br = []
        r = 0
    wtr.end_block(r > 0, br)


def decode_jpeg_progressive(payload: bytes):
    """Progressive JPEG (SOF2) → (width, height, (H, W, 3) uint8 RGB).

    Multi-scan decode per T.81 Annex G.2: DC scans (interleaved MCU
    walk, or non-interleaved for a single-component scan) and
    single-component AC band scans accumulate into per-component
    zigzag coefficient arrays — first passes place point-transformed
    values shifted by Al, refinement passes OR in one bit per
    coefficient (EOB runs, ZRL skips, and correction-bit interleave
    per figures G.6/G.7). A stream that ends before the script
    completes (a truncated download — the format's defining feature
    is that this still renders) reconstructs from the bits received.
    Restart markers reset DC predictors and EOB runs per scan."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict = {}
    htables: dict = {}
    frame = None
    sampling = None
    coefs: list = []
    grids: list = []
    dri = 0
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            pos += 2
            continue
        if pos + 4 > len(payload):
            break  # truncated tail: render what we have
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xDB:
            _parse_dqt(body, qtables)
        elif marker == 0xC4:
            _parse_dht(body, htables)
        elif marker == 0xC2:  # SOF2
            precision, fh, fw, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            if ncomp == 1:
                sampling = {comps[0][0]: (1, 1)}
            else:
                sampling = {cid: (hc, vc) for cid, hc, vc, _ in comps}
            hmax = max(hc for hc, _ in sampling.values())
            vmax = max(vc for _, vc in sampling.values())
            for hc, vc in sampling.values():
                if hc < 1 or vc < 1 or hmax % hc or vmax % vc:
                    raise NotImplementedError(
                        f"non-divisible JPEG sampling factors {hc}x{vc} "
                        f"(max {hmax}x{vmax}) not supported"
                    )
            mx, my = -(-fw // (8 * hmax)), -(-fh // (8 * vmax))
            frame = (fw, fh, comps, hmax, vmax, mx, my)
            for cid, _hc, _vc, _tq in comps:
                hc, vc = sampling[cid]
                cw, ch = -(-(fw * hc) // hmax), -(-(fh * vc) // vmax)
                grids.append(
                    (my * vc, mx * hc, -(-ch // 8), -(-cw // 8))
                )
                coefs.append(
                    np.zeros((my * vc, mx * hc, 64), dtype=np.int64)
                )
        elif marker in (0xC0, 0xC1, 0xC3):
            raise ValueError("non-progressive SOF inside progressive decode")
        elif marker == 0xDD:
            (dri,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("JPEG scan before SOF2")
            ns = body[0]
            scomps = []
            for c in range(ns):
                cid, tt = body[1 + 2 * c : 3 + 2 * c]
                scomps.append((cid, tt >> 4, tt & 0xF))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            try:
                pos = _decode_prog_scan(
                    payload, pos + 2 + length, frame, sampling, grids,
                    coefs, htables, scomps, ss, se, ah, al, dri,
                )
            except ValueError as exc:
                if "truncated" in str(exc):
                    pos = len(payload)  # render the scans received
                else:
                    raise
            continue
        pos += 2 + length
    if frame is None:
        raise ValueError("JPEG missing SOF2")
    fw, fh, comps, hmax, vmax, mx, my = frame
    A = _dct_matrix()
    inv_zig = np.argsort(np.asarray(_ZIGZAG))
    planes = []
    samp = []
    for (cid, _hc, _vc, tq), cz, (gh, gw, _nh, _nw) in zip(
        comps, coefs, grids
    ):
        if tq not in qtables:
            raise ValueError(f"JPEG missing quantization table {tq}")
        nat = (cz * qtables[tq][None, None, :])[..., inv_zig].reshape(
            gh, gw, 8, 8
        ).astype(np.float64)
        blocks = np.matmul(np.matmul(A.T, nat), A) + 128.0
        planes.append(
            blocks.transpose(0, 2, 1, 3).reshape(gh * 8, gw * 8)
        )
        samp.append(sampling[cid])
    return _jpeg_reconstruct(planes, samp, hmax, vmax, fw, fh)


def _decode_prog_scan(
    payload, start, frame, sampling, grids, coefs, htables,
    scomps, ss, se, ah, al, dri,
):
    """Decode one progressive scan's entropy segment starting at
    ``start``; returns the offset of the next marker. Raises
    ValueError('truncated...') when bits run out mid-scan."""
    fw, fh, comps, hmax, vmax, mx, my = frame
    idx_by_cid = {cid: i for i, (cid, *_rest) in enumerate(comps)}
    br = _BitReader(payload, start)
    one = 1 << al

    def refine_nonzero(zz, k):
        """Correction bit for a history-nonzero coefficient."""
        if br.bit() and not (int(zz[k]) & one):
            zz[k] += one if zz[k] > 0 else -one

    if ss == 0:  # DC scan — interleaved unless single-component
        if se != 0:
            raise ValueError("DC scan must have Se=0")
        preds = [0] * len(scomps)
        if len(scomps) > 1:
            walk = []
            for cid, td, _ta in scomps:
                ci = idx_by_cid[cid]
                hc, vc = sampling[cid]
                walk.append((ci, td, hc, vc))
            mcu = 0
            for by in range(my):
                for bx in range(mx):
                    if dri and mcu and mcu % dri == 0:
                        br.align_and_expect_rst(mcu // dri - 1)
                        preds = [0] * len(scomps)
                    for si, (ci, td, hc, vc) in enumerate(walk):
                        for dv in range(vc):
                            for dh in range(hc):
                                zz = coefs[ci][by * vc + dv, bx * hc + dh]
                                if ah == 0:
                                    s = br.decode_huff(htables[(0, td)])
                                    diff = _extend(br.bits(s), s) if s else 0
                                    preds[si] += diff
                                    zz[0] = preds[si] << al
                                else:
                                    zz[0] = int(zz[0]) | (br.bit() << al)
                    mcu += 1
        else:
            cid, td, _ta = scomps[0]
            ci = idx_by_cid[cid]
            _gh, _gw, nbh, nbw = grids[ci]
            blk = 0
            for by in range(nbh):
                for bx in range(nbw):
                    if dri and blk and blk % dri == 0:
                        br.align_and_expect_rst(blk // dri - 1)
                        preds[0] = 0
                    zz = coefs[ci][by, bx]
                    if ah == 0:
                        s = br.decode_huff(htables[(0, td)])
                        diff = _extend(br.bits(s), s) if s else 0
                        preds[0] += diff
                        zz[0] = preds[0] << al
                    else:
                        zz[0] = int(zz[0]) | (br.bit() << al)
                    blk += 1
    else:  # AC band scan — always non-interleaved (T.81 G.1.1)
        if len(scomps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        cid, _td, ta = scomps[0]
        ci = idx_by_cid[cid]
        ac_t = htables[(1, ta)]
        _gh, _gw, nbh, nbw = grids[ci]
        eobrun = 0
        blk = 0
        for by in range(nbh):
            for bx in range(nbw):
                if dri and blk and blk % dri == 0:
                    br.align_and_expect_rst(blk // dri - 1)
                    eobrun = 0
                blk += 1
                zz = coefs[ci][by, bx]
                if ah == 0:  # first pass (figure G.6)
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = br.decode_huff(ac_t)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.bits(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("JPEG AC band overrun")
                        zz[k] = _extend(br.bits(s), s) << al
                        k += 1
                else:  # refinement pass (figure G.7)
                    if eobrun > 0:
                        eobrun -= 1
                        for k in range(ss, se + 1):
                            if zz[k] != 0:
                                refine_nonzero(zz, k)
                        continue
                    k = ss
                    while k <= se:
                        rs = br.decode_huff(ac_t)
                        r, s = rs >> 4, rs & 0xF
                        newval = 0
                        if s == 0:
                            if r != 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += br.bits(r)
                                break
                            # ZRL: skip 16 history-zero positions
                        else:
                            if s != 1:
                                raise ValueError(
                                    "invalid refinement magnitude"
                                )
                            newval = one if br.bit() else -one
                        while k <= se:
                            if zz[k] != 0:
                                refine_nonzero(zz, k)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval and k <= se:
                            zz[k] = newval
                        k += 1
                    else:
                        continue
                    # EOB reached: correction bits for the remainder
                    for kk in range(k, se + 1):
                        if zz[kk] != 0:
                            refine_nonzero(zz, kk)
    # advance to the next marker (skip pad bits and stuffed zeros)
    p = br.pos
    n = len(payload)
    while p + 1 < n:
        if payload[p] == 0xFF and payload[p + 1] != 0x00:
            if not (0xD0 <= payload[p + 1] <= 0xD7):
                return p
        p += 1
    return n


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


def phash64(pixels) -> int:
    """64-bit perceptual hash (pHash): fixed-point luma → bilinear
    32x32 → 2D DCT-II → top-left 8x8 coefficients minus DC → threshold
    at the median → 63 sign bits packed little-endian into a
    non-negative int64 (bit 63 stays 0, so the value survives Spark's
    signed LongType unchanged).

    The luma uses integer weights (77, 150, 29)/256 — for gray pixels
    (r=g=b=v) that is EXACTLY v, so a pure brightness offset shifts
    every luma by the same integer and only the (discarded) DC
    coefficient moves: same-content-different-exposure images hash
    identically by construction, not by luck. A positive contrast
    scale multiplies every AC coefficient uniformly, preserving all
    median comparisons, so it is likewise hash-invariant up to uint8
    rounding."""
    import numpy as np

    p = pixels.astype(np.int64)
    luma = (77 * p[:, :, 0] + 150 * p[:, :, 1] + 29 * p[:, :, 2]) >> 8
    if luma.shape != (32, 32):
        luma = resize_bilinear(
            luma.astype(np.uint8)[:, :, None], 32, 32
        )[:, :, 0]
    m = _dctn_matrix(32)
    coef = m @ luma.astype(np.float64) @ m.T
    ac = coef[:8, :8].reshape(-1)[1:]  # 63 coefficients, DC dropped
    bits = ac > np.median(ac)
    return int(sum(1 << i for i, b in enumerate(bits) if b))


_DCTN_CACHE: dict = {}


def _dctn_matrix(n: int):
    """Orthonormal DCT-II matrix (cached per size)."""
    import numpy as np

    m = _DCTN_CACHE.get(n)
    if m is None:
        k = np.arange(n, dtype=np.float64)
        m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
        m *= np.sqrt(2.0 / n)
        m[0] *= np.sqrt(0.5)
        _DCTN_CACHE[n] = m
    return m


def phash_images(df: DataFrame) -> DataFrame:
    """Arrow-batched decode → pHash: (doc_id, payload) → (doc_id,
    phash bigint). The decode/resize/DCT all stay inside one
    mapInPandas task; only the 8-byte hash crosses the shuffle
    boundary downstream."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _w, _h, px = decode_image(bytes(payload))
                ids.append(doc_id)
                hashes.append(phash64(px))
            yield pd.DataFrame({"doc_id": ids, "phash": hashes})

    return df.mapInPandas(batches, "doc_id bigint, phash bigint")


def equalize_hist(channel):
    """Per-channel histogram equalization in EXACT integer math:
    out(v) = round_half_up((cdf(v) - cdf_min) * 255 / (n - cdf_min)),
    computed as ((cdf - cdf_min) * 510 + den) // (2 * den) so both
    engines agree bit-for-bit (no float rounding). A constant channel
    (den = 0) maps to 0."""
    import numpy as np

    flat = channel.reshape(-1).astype(np.int64)
    cnt = np.bincount(flat, minlength=256)
    cdf = np.cumsum(cnt)
    cdf_min = int(cnt[flat.min()]) if flat.size else 0
    den = int(flat.size) - cdf_min
    if den <= 0:
        return np.zeros_like(channel)
    lut = ((cdf - cdf_min) * 510 + den) // (2 * den)
    return lut[flat].reshape(channel.shape).astype(np.uint8)


def equalize_images(df: DataFrame) -> DataFrame:
    """Arrow-batched decode → per-channel histogram equalization →
    exact integer stats of the equalized image (contrast
    normalization, the preprocessing twin of augment_images)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "width": [], "height": [], "n_px": [],
                "sum_r": [], "sum_g": [], "sum_b": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = decode_image(bytes(payload))
                eq = np.stack(
                    [equalize_hist(px[:, :, c]) for c in range(3)], axis=2
                ).astype(np.int64)
                sums = eq.reshape(-1, 3).sum(axis=0)
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["n_px"].append(w * h)
                for k, c in zip(("sum_r", "sum_g", "sum_b"), range(3)):
                    out[k].append(int(sums[c]))
            yield pd.DataFrame(out)

    return df.mapInPandas(
        batches,
        "doc_id bigint, width int, height int, n_px int, "
        "sum_r bigint, sum_g bigint, sum_b bigint",
    )


def augment_images(df: DataFrame, crop=(8, 8)) -> DataFrame:
    """Arrow-batched training-data AUGMENTATION: decode, then apply
    the per-row deterministic pipeline horizontal-flip (``flip`` = 1)
    → ``rot`` CCW quarter-turns → center crop to ``crop`` (h, w), and
    emit exact integer channel sums of the result PLUS the top-left
    quadrant sum — a position-sensitive invariant, so a wrong flip
    axis, rotation direction, or crop offset shifts the numbers even
    when the whole-image sum wouldn't. Input: (doc_id, payload, flip,
    rot)."""
    import numpy as np

    ch, cw = crop

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "out_w": [], "out_h": [],
                "sum_r": [], "sum_g": [], "sum_b": [],
                "tl_r": [], "tl_g": [],
            }
            for doc_id, payload, flip, rot in zip(
                pdf["doc_id"], pdf["payload"], pdf["flip"], pdf["rot"]
            ):
                _w, _h, px = decode_image(bytes(payload))
                if int(flip):
                    px = px[:, ::-1]
                px = np.rot90(px, int(rot) % 4)
                h2, w2 = px.shape[:2]
                if h2 < ch or w2 < cw:
                    raise ValueError(
                        f"crop {crop} exceeds post-rotation dims {(h2, w2)}"
                    )
                top, left = (h2 - ch) // 2, (w2 - cw) // 2
                cp = px[top : top + ch, left : left + cw].astype(np.int64)
                sums = cp.sum(axis=(0, 1))
                tl = cp[: ch // 2, : cw // 2].sum(axis=(0, 1))
                out["doc_id"].append(doc_id)
                out["out_w"].append(cw)
                out["out_h"].append(ch)
                for k, c in zip(("sum_r", "sum_g", "sum_b"), range(3)):
                    out[k].append(int(sums[c]))
                out["tl_r"].append(int(tl[0]))
                out["tl_g"].append(int(tl[1]))
            yield pd.DataFrame(out)

    return df.mapInPandas(
        batches,
        "doc_id bigint, out_w int, out_h int, "
        "sum_r bigint, sum_g bigint, sum_b bigint, "
        "tl_r bigint, tl_g bigint",
    )


def scene_changes(df: DataFrame, threshold: int = 30) -> DataFrame:
    """Arrow-batched video scene-cut detection: decode the Y4M stream,
    then for every consecutive frame pair emit the exact integer SAD
    (sum of absolute luma differences over all pixels) and flag a cut
    where mean absolute difference exceeds ``threshold`` (i.e.
    sad > threshold * n_px — integer compare, no float). The whole
    frame walk stays inside one mapInPandas task; only (doc, frame)
    stat rows come out."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "frame_idx": [], "sad": [],
                "n_px": [], "is_cut": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _fps, frames = decode_y4m(bytes(payload))
                if len(frames) < 2:
                    continue
                stack = np.stack(frames).astype(np.int64)
                sads = np.abs(stack[1:] - stack[:-1]).sum(axis=(1, 2))
                n = w * h
                out["doc_id"].extend([doc_id] * sads.size)
                out["frame_idx"].extend(range(1, len(frames)))
                out["sad"].extend(int(s) for s in sads)
                out["n_px"].extend([n] * sads.size)
                out["is_cut"].extend(
                    int(s > threshold * n) for s in sads
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(
        batches,
        "doc_id bigint, frame_idx int, sad bigint, n_px int, is_cut int",
    )


def decode_resize_images(df: DataFrame, scale: int = 2) -> DataFrame:
    """Arrow-batched decode → bilinear downscale by ``scale`` → exact
    per-channel stats of the RESIZED pixels. The interpolation itself
    is what's under test: a wrong weight, rounding rule, or row/col
    mix-up shifts the sums away from the closed-form oracle."""
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
                ow, oh = w // scale, h // scale
                rs = resize_bilinear(px, ow, oh)
                sums = rs.reshape(-1, rs.shape[2])[:, :3].sum(
                    axis=0, dtype=np.int64
                )
                n = ow * oh
                out["doc_id"].append(doc_id)
                out["width"].append(ow)
                out["height"].append(oh)
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


_MULAW_BIAS, _MULAW_CLIP = 0x84, 32635


def mulaw_encode(samples):
    """G.711 μ-law compression: int16 → uint8 codes (sign, 3-bit
    exponent = position of the leading bit above the bias, 4-bit
    mantissa, ones-complemented). Pure integer, vectorized."""
    import numpy as np

    x = samples.astype(np.int64)
    sign = np.where(x < 0, 0x80, 0)
    x = np.minimum(np.abs(x), _MULAW_CLIP) + _MULAW_BIAS
    # exponent: highest set bit of x>>7 (x is in [132, 32767+132])
    exp = np.zeros_like(x)
    for e in range(7, 0, -1):
        exp = np.where((x >> (e + 7)) > 0, np.maximum(exp, e), exp)
    mant = (x >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def mulaw_decode(codes):
    """G.711 μ-law expansion: uint8 codes → int16 samples (exact
    inverse of the quantized representation)."""
    import numpy as np

    u = (~codes.astype(np.int64)) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    x = (((mant << 3) + _MULAW_BIAS) << exp) - _MULAW_BIAS
    return np.where(sign > 0, -x, x).astype(np.int16)


def alaw_encode(samples):
    """G.711 A-law compression: int16 → uint8 codes (13-bit magnitude,
    segment/mantissa, XOR 0x55 bit inversion; sign bit SET means
    non-negative — A-law's polarity is the opposite of μ-law's)."""
    import numpy as np

    x = samples.astype(np.int64)
    sign = np.where(x >= 0, 0x80, 0)
    ax = np.minimum(np.abs(x) >> 3, 4095)  # 13-bit magnitude
    exp = np.zeros_like(ax)
    for e in range(7, 0, -1):
        exp = np.where((ax >> (e + 4)) > 0, np.maximum(exp, e), exp)
    mant = np.where(exp == 0, ax >> 1, (ax >> exp) & 0x0F)
    return ((sign | (exp << 4) | mant) ^ 0x55).astype(np.uint8)


def alaw_decode(codes):
    """G.711 A-law expansion: uint8 codes → int16 samples."""
    import numpy as np

    u = codes.astype(np.int64) ^ 0x55
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    y = np.where(
        exp == 0, (mant << 1) + 1, ((mant | 0x10) << exp) + (1 << (exp - 1))
    )
    y = y << 3
    return np.where(sign > 0, y, -y).astype(np.int16)


def encode_wav_alaw(samples, sample_rate: int = 8000) -> bytes:
    """numpy int16 mono samples → RIFF/WAVE G.711 A-law (format 0x06,
    8 bits per sample)."""
    import struct

    import numpy as np

    codes = alaw_encode(np.asarray(samples, dtype=np.int16)).tobytes()
    fmt = struct.pack(
        "<HHIIHH", 0x06, 1, sample_rate, sample_rate, 1, 8
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(codes)) + codes
        + (b"\x00" if len(codes) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def encode_wav_mulaw(samples, sample_rate: int = 8000) -> bytes:
    """numpy int16 mono samples → RIFF/WAVE G.711 μ-law (format 0x07,
    8 bits per sample)."""
    import struct

    import numpy as np

    codes = mulaw_encode(np.asarray(samples, dtype=np.int16)).tobytes()
    fmt = struct.pack(
        "<HHIIHH", 0x07, 1, sample_rate, sample_rate, 1, 8
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(codes)) + codes
        + (b"\x00" if len(codes) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def resample_linear(samples, sr_in: int, sr_out: int):
    """Linear-interpolation sample-rate conversion: output sample i
    sits at source position i * sr_in / sr_out (origin-aligned, the
    convention of soxr/librosa's 'linear'), interpolated between its
    two source neighbors with the tail clamped to the last sample.
    int16 in → int16 out via round-half-up (floor(v + 0.5)), so exact
    integer ratios stay closed-form: at 2x upsampling even outputs
    copy the source and odd outputs are (a + b + 1) // 2 in floor
    semantics — the SQL-oracle anchor for b22_audio_resample."""
    import numpy as np

    if sr_in <= 0 or sr_out <= 0:
        raise ValueError("sample rates must be positive")
    n = samples.size
    if n == 0:
        return samples.astype(np.int16)
    n_out = n * sr_out // sr_in
    pos = np.arange(n_out, dtype=np.float64) * (sr_in / sr_out)
    i0 = np.floor(pos).astype(np.int64)
    frac = pos - i0
    i0 = np.clip(i0, 0, n - 1)
    i1 = np.minimum(i0 + 1, n - 1)
    x = samples.astype(np.float64)
    v = x[i0] * (1.0 - frac) + x[i1] * frac
    return np.floor(v + 0.5).clip(-32768, 32767).astype(np.int16)


def resample_audio(df: DataFrame, sr_out: int) -> DataFrame:
    """Arrow-batched WAV decode → linear resample to ``sr_out`` →
    exact integer stats of the RESAMPLED signal (the interpolation is
    what's under test)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "sample_rate": [], "n_samples": [],
                "sum_amp": [], "peak": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, _ch, samples = decode_wav(bytes(payload))
                rs = resample_linear(samples, rate, sr_out)
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(sr_out)
                out["n_samples"].append(int(rs.size))
                out["sum_amp"].append(int(rs.astype(np.int64).sum()))
                out["peak"].append(int(rs.max()) if rs.size else 0)
            yield pd.DataFrame(out)

    return df.mapInPandas(
        batches,
        "doc_id bigint, sample_rate int, n_samples int, "
        "sum_amp bigint, peak int",
    )


def audio_spectrograms(df: DataFrame, frame: int = 512) -> DataFrame:
    """Arrow-batched WAV decode → non-overlapping rectangular frames →
    rFFT power spectrum → two integer invariants per frame:

    - ``dominant_bin``: argmax of the power spectrum (the detected
      frequency — for a periodic source this is the fundamental);
    - ``spec_energy``: the Parseval round-trip
      round((|X_0|^2 + |X_{N/2}|^2 + 2*sum|X_k|^2) / N), which equals
      sum(x[n]^2) EXACTLY for integer PCM16 samples — so the oracle
      can check the transform's total energy in closed form while the
      argmax checks its frequency localization. FFT rounding error is
      ~1e-9 relative, vastly inside the round-to-integer margin.

    Trailing samples short of a full frame are dropped (the standard
    STFT convention)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "frame_id": [],
                "dominant_bin": [], "spec_energy": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _rate, _ch, samples = decode_wav(bytes(payload))
                n_frames = samples.size // frame
                if not n_frames:
                    continue
                x = samples[: n_frames * frame].astype(np.float64)
                spec = np.fft.rfft(x.reshape(n_frames, frame), axis=1)
                power = spec.real**2 + spec.imag**2
                total = (
                    power[:, 0]
                    + power[:, -1]
                    + 2.0 * power[:, 1:-1].sum(axis=1)
                )
                out["doc_id"].extend([doc_id] * n_frames)
                out["frame_id"].extend(range(n_frames))
                out["dominant_bin"].extend(
                    int(k) for k in power.argmax(axis=1)
                )
                out["spec_energy"].extend(
                    int(v) for v in np.round(total / frame)
                )
            yield pd.DataFrame(
                {
                    k: pd.array(v, dtype="int64" if k != "frame_id" else "int32")
                    for k, v in out.items()
                }
            )

    return df.mapInPandas(
        batches,
        "doc_id bigint, frame_id int, dominant_bin bigint, "
        "spec_energy bigint",
    )


def mel_filterbank(n_mels: int = 8, n_fft: int = 512, sr: int = 16000):
    """Standard HTK-style mel triangle filterbank over rFFT bins:
    n_mels triangles with centers equally spaced on the mel scale
    (2595*log10(1 + f/700)) between 0 Hz and sr/2. Returns an
    (n_mels, n_fft//2 + 1) float64 weight matrix."""
    import numpy as np

    def to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def from_mel(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    pts = from_mel(np.linspace(0.0, to_mel(sr / 2.0), n_mels + 2))
    bins = np.floor((n_fft + 1) * pts / sr).astype(np.int64)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(n_mels):
        lo, mid, hi = bins[m], bins[m + 1], bins[m + 2]
        for k in range(lo, mid):
            if mid > lo:
                fb[m, k] = (k - lo) / (mid - lo)
        for k in range(mid, hi):
            if hi > mid:
                fb[m, k] = (hi - k) / (hi - mid)
    return fb


def mel_features(
    df: DataFrame, n_mels: int = 8, frame: int = 512, hop: int = 256
) -> DataFrame:
    """Arrow-batched log-mel feature extraction (the audio twin of the
    text-encoder inference stage): WAV → Hann-windowed overlapping
    frames → rFFT power → mel filterbank → log10(1 + energy). The
    filterbank matrix is built ONCE per task and applied as one matmul
    per batch — no per-frame Python. Registered rows-only (an SQL
    oracle cannot express the FFT); tests/test_northstar.py pins the
    numbers against an independent per-frame reference."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fb_by_rate: dict = {}  # filterbank depends on the sample rate
        window = np.hanning(frame + 1)[:-1]  # periodic Hann
        for pdf in it:
            out = {"doc_id": [], "frame_id": [], "features": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, _ch, samples = decode_wav(bytes(payload))
                fb = fb_by_rate.get(rate)
                if fb is None:
                    fb = fb_by_rate[rate] = mel_filterbank(n_mels, frame, rate)
                x = samples.astype(np.float64)
                n_frames = max(0, (x.size - frame) // hop + 1)
                if not n_frames:
                    continue
                idx = (
                    np.arange(frame)[None, :]
                    + hop * np.arange(n_frames)[:, None]
                )
                spec = np.fft.rfft(x[idx] * window[None, :], axis=1)
                power = spec.real**2 + spec.imag**2
                logmel = np.log10(1.0 + power @ fb.T)
                out["doc_id"].extend([doc_id] * n_frames)
                out["frame_id"].extend(range(n_frames))
                out["features"].extend(row.tolist() for row in logmel)
            yield pd.DataFrame(out)

    return df.mapInPandas(
        batches, "doc_id bigint, frame_id int, features array<double>"
    )


def decode_audio_channels(df: DataFrame) -> DataFrame:
    """Arrow-batched MULTI-CHANNEL audio decode: interleaved RIFF PCM
    → per-channel exact integer statistics. Deinterleave is a numpy
    stride slice (samples[c::channels]) — no copy of the payload, no
    shuffle; one row out per (doc, channel) so downstream per-channel
    analysis (balance, phase checks, channel drop) stays relational."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "sample_rate": [], "channel": [],
                "n_samples": [], "sum_amp": [], "peak": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, ch, samples = decode_wav(bytes(payload))
                for c in range(ch):
                    lane = samples[c::ch]
                    out["doc_id"].append(doc_id)
                    out["sample_rate"].append(rate)
                    out["channel"].append(c)
                    out["n_samples"].append(lane.size)
                    out["sum_amp"].append(int(lane.astype(np.int64).sum()))
                    out["peak"].append(int(lane.max()) if lane.size else 0)
            yield pd.DataFrame(out)

    return df.mapInPandas(
        batches,
        "doc_id bigint, sample_rate int, channel int, n_samples int, "
        "sum_amp bigint, peak int",
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


def retime_video(df: DataFrame, target_fps: int = 4) -> DataFrame:
    """Frame-rate conversion by nearest-frame selection (the uniform
    resample every training pipeline runs before fixed-fps models):
    output frame k of a clip at source rate S covers time k/T, so it
    takes source frame round_half_up(k*S/T) = (2kS + T) // (2T),
    clamped to the last frame; n_out = ceil(nf*T/S) preserves clip
    duration. All index math is exact integers — no float timestamps —
    which is what makes the whole retime SQL-replayable. Map-only like
    every other media stage: decode and retime never leave the task."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        T = target_fps
        for pdf in it:
            out = {
                "doc_id": [], "out_idx": [], "src_idx": [],
                "width": [], "height": [], "src_fps": [],
                "sum_luma": [], "max_luma": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, fps, frames = decode_y4m(bytes(payload))
                nf = len(frames)
                n_out = (nf * T + fps - 1) // fps
                for k in range(n_out):
                    src = min(nf - 1, (2 * k * fps + T) // (2 * T))
                    fr = frames[src]
                    out["doc_id"].append(doc_id)
                    out["out_idx"].append(k)
                    out["src_idx"].append(src)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["src_fps"].append(fps)
                    out["sum_luma"].append(int(fr.astype(np.int64).sum()))
                    out["max_luma"].append(int(fr.max()))
            yield pd.DataFrame(out)

    return df.mapInPandas(
        batches,
        "doc_id bigint, out_idx int, src_idx int, width int, height int, "
        "src_fps int, sum_luma bigint, max_luma int",
    )


# --------------------------------------------------------------------------
# TIFF (stripped RGB; Compression = 1 none / 5 LZW / 32773 PackBits) —
# the scanned-document / pro-photo format a real crawl corpus carries
# alongside PNG/JPEG. Full spec-level IFD walk in BOTH byte orders
# ("II" little- and "MM" big-endian), SHORT/LONG entry types with the
# inline-vs-offset value rule (count*size <= 4 lives left-justified in
# the value field), and multi-strip reassembly (RowsPerStrip < height
# forces it). TIFF-variant LZW (MSB-first bit packing + the spec's
# "early change" width bump — one code earlier than GIF's LSB-first
# variant) and the horizontal-differencing Predictor (tag 317 = 2) are
# implemented per strip; PackBits is the spec's run-length scheme.
# --------------------------------------------------------------------------
def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW over an 8-bit byte stream: ClearCode=256,
    EOI=257, first table entry 258, code widths 9..12 bits packed
    MSB-first, and the TIFF spec's *early change*: the encoder widens
    when the next free code reaches 2^width - 1 (one step before the
    GIF variant would). The table clears at 4095 so 12 bits always
    suffice. Self-consistent with _tiff_lzw_decode (decoder lags one
    entry, so its bump threshold is 2^width - 2)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = n_bits = 0

    def put(code: int, size: int):
        nonlocal acc, n_bits
        acc = (acc << size) | code
        n_bits += size
        while n_bits >= 8:
            out.append((acc >> (n_bits - 8)) & 0xFF)
            n_bits -= 8
        acc &= (1 << n_bits) - 1

    table: dict = {}
    next_code, size = 258, 9
    put(CLEAR, size)
    it = iter(data)
    current = next(it, None)
    if current is None:
        put(EOI, size)
    else:
        for k in it:
            nxt = table.get((current, k))
            if nxt is not None:
                current = nxt
                continue
            put(current, size)
            table[(current, k)] = next_code
            next_code += 1
            if next_code == (1 << size) - 1 and size < 12:
                size += 1  # early change
            elif next_code == 4095:
                put(CLEAR, size)
                table, next_code, size = {}, 258, 9
            current = k
        put(current, size)
        put(EOI, size)
    if n_bits:
        out.append((acc << (8 - n_bits)) & 0xFF)
    return bytes(out)


def _tiff_lzw_decode(data: bytes, n_expected: int) -> bytes:
    """Inverse of _tiff_lzw_encode. MSB-first reads; the decoder's
    table is one entry behind the encoder's, so the early-change bump
    fires at len(table) == 2^width - 2."""
    CLEAR, EOI = 256, 257
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    size = 9
    out = bytearray()
    acc = n_bits = pos = 0
    prev = None
    while True:
        while n_bits < size:
            if pos >= len(data):
                raise ValueError("truncated TIFF LZW stream")
            acc = (acc << 8) | data[pos]
            pos += 1
            n_bits += 8
        code = (acc >> (n_bits - size)) & ((1 << size) - 1)
        n_bits -= size
        acc &= (1 << n_bits) - 1
        if code == CLEAR:
            table = list(base)
            size = 9
            prev = None
            continue
        if code == EOI:
            break
        if code < len(table) and (code < 256 or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"bad TIFF LZW code {code}")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << size) - 2 and size < 12:
                size += 1  # early change, decoder lags one entry
        prev = entry
        if len(out) >= n_expected:
            break
    if len(out) < n_expected:
        raise ValueError("TIFF LZW stream ended short of the byte count")
    return bytes(out[:n_expected])


def _packbits_encode(data: bytes) -> bytes:
    """Apple PackBits (TIFF Compression=32773): header n in 0..127
    copies n+1 literal bytes; n in -1..-127 (two's complement 255..129)
    repeats the next byte 1-n times; -128 is a no-op the encoder never
    emits."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # measure the run starting at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 2:
            out.append(257 - (j - i))  # two's-complement negative
            out.append(data[i])
            i = j
            continue
        # literal stretch: until a run of >= 3 starts (2-byte runs are
        # cheaper folded into the literal) or 128 bytes
        j = i + 1
        while j < n and j - i < 128:
            if (
                j + 2 < n
                and data[j] == data[j + 1] == data[j + 2]
            ):
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def _packbits_decode(data: bytes, n_expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < n_expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < n_expected:
        raise ValueError("PackBits stream ended short of the byte count")
    return bytes(out[:n_expected])


def _predict_rows(strip: bytes, w: int, spp: int):
    """Horizontal differencing (TIFF Predictor=2) applied per row,
    per sample channel, mod 256 — the transform that makes LZW bite on
    smooth photographic gradients."""
    import numpy as np

    a = np.frombuffer(strip, dtype=np.uint8).reshape(-1, w, spp)
    d = a.astype(np.int16)
    d[:, 1:, :] -= a[:, :-1, :].astype(np.int16)
    return (d % 256).astype(np.uint8).tobytes()


def _unpredict_rows(strip: bytes, w: int, spp: int):
    """Inverse of _predict_rows: cumulative sum mod 256 across each
    row's columns, per channel."""
    import numpy as np

    a = np.frombuffer(strip, dtype=np.uint8).reshape(-1, w, spp)
    return (
        np.cumsum(a.astype(np.int64), axis=1) % 256
    ).astype(np.uint8).tobytes()


def encode_tiff(
    pixels,
    big_endian: bool = False,
    compression: int = 1,
    predictor: bool = False,
) -> bytes:
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    bo = ">" if big_endian else "<"
    import struct

    if compression not in (1, 5, 32773):
        raise ValueError(f"unsupported TIFF compression {compression}")
    if predictor and compression != 5:
        raise ValueError("Predictor=2 only pairs with LZW in this profile")

    rows_per_strip = 4
    strips = []
    for y in range(0, h, rows_per_strip):
        raw = px[y : y + rows_per_strip].tobytes()
        if predictor:
            raw = _predict_rows(raw, w, 3)
        if compression == 5:
            raw = _tiff_lzw_encode(raw)
        elif compression == 32773:
            raw = _packbits_encode(raw)
        strips.append(raw)
    n = len(strips)
    # layout: 8-byte header | strip data | BitsPerSample block |
    # strip offset/count arrays (if n > 1) | IFD
    pos = 8
    offs = []
    for s in strips:
        offs.append(pos)
        pos += len(s)
    bits_off = pos
    pos += 6  # 3 SHORTs
    if n > 1:
        so_off, pos = pos, pos + 4 * n
        sc_off, pos = pos, pos + 4 * n
    ifd_off = pos

    def entry(tag, typ, count, value):
        return struct.pack(bo + "HHI", tag, typ, count) + value

    def inline_short(v):
        return struct.pack(bo + "HH", v, 0)

    def inline_long(v):
        return struct.pack(bo + "I", v)

    entries = [
        entry(256, 4, 1, inline_long(w)),            # ImageWidth
        entry(257, 4, 1, inline_long(h)),            # ImageLength
        entry(258, 3, 3, inline_long(bits_off)),     # BitsPerSample ->
        entry(259, 3, 1, inline_short(compression)),  # Compression
        entry(262, 3, 1, inline_short(2)),           # Photometric RGB
        entry(                                        # StripOffsets
            273, 4, n,
            inline_long(offs[0] if n == 1 else so_off),
        ),
        entry(277, 3, 1, inline_short(3)),           # SamplesPerPixel
        entry(278, 4, 1, inline_long(rows_per_strip)),
        entry(                                        # StripByteCounts
            279, 4, n,
            inline_long(len(strips[0]) if n == 1 else sc_off),
        ),
    ]
    if predictor:
        entries.append(entry(317, 3, 1, inline_short(2)))  # Predictor
    out = bytearray()
    out += (b"MM\x00\x2a" if big_endian else b"II\x2a\x00")
    out += struct.pack(bo + "I", ifd_off)
    for s in strips:
        out += s
    out += struct.pack(bo + "HHH", 8, 8, 8)
    if n > 1:
        for o in offs:
            out += struct.pack(bo + "I", o)
        for s in strips:
            out += struct.pack(bo + "I", len(s))
    out += struct.pack(bo + "H", len(entries))
    for e in entries:
        out += e
    out += struct.pack(bo + "I", 0)  # next-IFD terminator
    return bytes(out)


def decode_tiff(payload: bytes):
    import struct

    import numpy as np

    if payload[:4] == b"II\x2a\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00\x2a":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    (n_entries,) = struct.unpack_from(bo + "H", payload, ifd_off)
    tags: dict = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(bo + "HHI", payload, base)
        size = {3: 2, 4: 4}.get(typ)
        if size is None:
            continue  # types this profile never writes (RATIONAL etc.)
        fmt = "H" if typ == 3 else "I"
        if count * size <= 4:
            vals = struct.unpack_from(bo + fmt * count, payload, base + 8)
        else:
            (off,) = struct.unpack_from(bo + "I", payload, base + 8)
            vals = struct.unpack_from(bo + fmt * count, payload, off)
        tags[tag] = list(vals)
    missing = [t for t in (256, 257, 273, 279) if t not in tags]
    if missing:
        raise ValueError(
            f"TIFF IFD lacks required tag(s) {missing} "
            "(ImageWidth/ImageLength/StripOffsets/StripByteCounts) — "
            "truncated file or unsupported entry types"
        )
    comp = tags.get(259, [1])[0]
    if comp not in (1, 5, 32773):
        raise NotImplementedError(
            f"TIFF Compression={comp} not in this profile "
            "(1=none, 5=LZW, 32773=PackBits decode natively)"
        )
    w, h = tags[256][0], tags[257][0]
    spp = tags.get(277, [3])[0]
    if spp != 3 or tags.get(258, [8, 8, 8]) != [8, 8, 8]:
        raise NotImplementedError("only 8-bit RGB TIFF in this profile")
    predictor = tags.get(317, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF Predictor={predictor} unsupported")
    rows_per_strip = tags.get(278, [h])[0]
    data = bytearray()
    rows_left = h
    for off, cnt in zip(tags[273], tags[279]):
        rows = min(rows_per_strip, rows_left)
        rows_left -= rows
        n_raw = rows * w * spp
        raw = payload[off : off + cnt]
        if comp == 5:
            raw = _tiff_lzw_decode(raw, n_raw)
        elif comp == 32773:
            raw = _packbits_decode(raw, n_raw)
        else:
            raw = raw[:n_raw]
        if predictor == 2:
            raw = _unpredict_rows(raw, w, spp)
        data += raw
    px = np.frombuffer(bytes(data), dtype=np.uint8)[: h * w * 3]
    return w, h, px.reshape(h, w, 3)


def vad_segments(
    df: DataFrame, frame: int = 16, threshold: int = 100_000
) -> DataFrame:
    """Energy-based voice-activity detection over WAV payloads: decode
    (the decode_wav chunk walk), frame into ``frame``-sample windows,
    gate each frame on exact integer energy (sum of squared
    amplitudes) >= ``threshold``, and merge consecutive active frames
    into segments — the trim-silence / speech-extent pass every audio
    training pipeline runs before feature extraction.

    One Arrow-batched pass, map-only like every media stage (the
    islands merge is per-doc-local, so it never leaves the task).
    Emits one row per ACTIVE segment: frame extent, exact energy sum,
    and the peak single-frame energy. All integers — SQL-replayable.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "seg_idx": [], "start_frame": [],
                "end_frame": [], "n_frames": [], "energy_sum": [],
                "peak_energy": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _rate, _ch, samples = decode_wav(bytes(payload))
                s = samples.astype(np.int64)
                n = s.size
                if n == 0:
                    continue
                nf = (n + frame - 1) // frame
                padded = np.zeros(nf * frame, dtype=np.int64)
                padded[:n] = s
                energies = (padded * padded).reshape(nf, frame).sum(axis=1)
                active = energies >= threshold
                seg_idx = 0
                f = 0
                while f < nf:
                    if not active[f]:
                        f += 1
                        continue
                    start = f
                    while f < nf and active[f]:
                        f += 1
                    seg = energies[start:f]
                    out["doc_id"].append(doc_id)
                    out["seg_idx"].append(seg_idx)
                    out["start_frame"].append(start)
                    out["end_frame"].append(f - 1)
                    out["n_frames"].append(f - start)
                    out["energy_sum"].append(int(seg.sum()))
                    out["peak_energy"].append(int(seg.max()))
                    seg_idx += 1
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "seg_idx", "start_frame", "end_frame",
                    "n_frames", "energy_sum", "peak_energy",
                ],
            )

    return df.mapInPandas(
        batches,
        "doc_id bigint, seg_idx int, start_frame int, end_frame int, "
        "n_frames int, energy_sum bigint, peak_energy bigint",
    )
