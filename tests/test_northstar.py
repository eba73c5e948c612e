"""North-star operator tests: LSH recall vs brute force, multimodal
pipeline values, minhash candidate quality.
"""

import pytest
from pyspark.sql import functions as F

from iot_system_plc_data_to_influxdb_spark.catalog import t
from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
    decode_image,
    extract_features,
    with_binary_payload,
)
from iot_system_plc_data_to_influxdb_spark.operators.similarity import (
    knn_bruteforce,
    knn_lsh,
)

SF_DIR = "/root/testdata/sf0.001"


def test_knn_lsh_recall_vs_bruteforce(spark):
    emb = t(spark, SF_DIR, "embeddings")
    exact = {r["vec_id"] for r in knn_bruteforce(emb, 0, k=10).collect()}
    approx = {r["vec_id"] for r in knn_lsh(emb, 0, k=10, probe_radius=2).collect()}
    # LSH with radius-2 probing over 8 planes should recover a majority
    # of the true top-10 on this corpus (random vectors, no planted
    # structure — the hard case for LSH).
    assert len(exact) == 10
    assert len(approx & exact) >= 3


def test_multimodal_features_deterministic(spark):
    docs = t(spark, SF_DIR, "documents").limit(5)
    out = extract_features(with_binary_payload(docs)).collect()
    assert len(out) == 5
    for r in out:
        assert r["n_bytes"] > 0
        assert len(r["features"]) == 4
        assert abs(sum(r["features"]) - 1.0) < 1e-9  # histogram normalized
        assert r["modality"] == "image/fake"


def test_decode_image_dispatch():
    """BMP/PPM/PNG decode natively and exactly; baseline AND
    progressive JPEG decode natively (lossy — near-exact under
    all-ones quant); a corrupt stream (baseline entropy data behind an
    SOF2 marker) fails in-band with ValueError, not a crash."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        encode_bmp,
        encode_jpeg,
        encode_jpeg_progressive,
        encode_png,
        encode_ppm,
    )

    px = np.arange(6 * 5 * 3, dtype=np.uint8).reshape(6, 5, 3)
    for enc in (encode_bmp, encode_ppm, encode_png):
        w, h, out = decode_image(enc(px))
        assert (w, h) == (5, 6)
        assert (out == px).all()
    for enc in (encode_jpeg, encode_jpeg_progressive):
        w, h, out = decode_image(enc(px))
        assert (w, h) == (5, 6)
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 3
    blob = bytearray(encode_jpeg(px))
    blob[blob.index(b"\xff\xc0") + 1] = 0xC2  # patch SOF0 → SOF2
    with pytest.raises(ValueError):  # baseline SOS is no valid scan script
        decode_image(bytes(blob))


def test_jpeg_block_constant_gray_exact():
    """All-ones quantization + 8x8-block-constant grayscale: only the
    DC coefficient survives the FDCT and it is integer-exact through
    quant→dequant→IDCT, so decode(encode(px)) == px bit-for-bit —
    the property the b22_jpeg_decode SQL oracle hash-checks."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.RandomState(11)
    for bh, bw in ((1, 1), (2, 3), (3, 2)):
        g = rng.randint(0, 256, (bh, bw)).astype(np.uint8)
        gray = g.repeat(8, axis=0).repeat(8, axis=1)
        px = np.stack([gray, gray, gray], axis=2)
        w, h, out = decode_jpeg(encode_jpeg(px))
        assert (w, h) == (bw * 8, bh * 8)
        assert (out == px).all()


def test_jpeg_lossy_psnr_and_restart():
    """Random color content (JPEG's worst case): near-lossless under
    all-ones quant (>45 dB), still recognizable under the Annex K
    luminance table; restart intervals decode identically, including
    the RSTn index wrap past 8 markers."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    def psnr(a, b):
        mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
        return 10 * np.log10(255**2 / mse) if mse else float("inf")

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (19, 22, 3), dtype=np.uint8)  # pad both dims
    w, h, out = decode_jpeg(encode_jpeg(px))
    assert (w, h) == (22, 19)
    assert psnr(out, px) > 45
    # K.1 luminance table (natural order) → zigzag for the encoder
    k1 = np.array(
        [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
         14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
         18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113,
         92, 49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112,
         100, 103, 99]
    )
    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        _ZIGZAG,
    )

    _w, _h, out_q = decode_jpeg(encode_jpeg(px, quant=k1[np.array(_ZIGZAG)]))
    assert psnr(out_q, px) > 12  # lossy but structured
    # restart markers: 12 MCUs at interval 1 wraps the RST index
    for ri in (1, 3):
        _w, _h, out_r = decode_jpeg(encode_jpeg(px, restart_interval=ri))
        assert (out_r == out).all()


def test_jpeg_420_block_constant_gray_exact():
    """4:2:0: grayscale chroma is constant 128 — invariant under the
    2×2 box downsample and replication upsample — so 8×8-block-
    constant grayscale round-trips EXACTLY through the subsampled
    layout too, including non-16-multiple dims (edge-replication pad)
    and restart markers (now per 16×16 MCU). Distinct luma values
    inside one MCU pin the 4-blocks-raster-order walk of spec A.2.3."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.RandomState(11)
    for bh, bw in ((1, 1), (2, 3), (1, 3), (3, 5)):
        g = rng.randint(0, 256, (bh, bw)).astype(np.uint8)
        gray = g.repeat(8, axis=0).repeat(8, axis=1)
        px = np.stack([gray, gray, gray], axis=2)
        for ri in (0, 2):
            w, h, out = decode_jpeg(
                encode_jpeg(px, restart_interval=ri, subsampling="420")
            )
            assert (w, h) == (bw * 8, bh * 8)
            assert (out == px).all(), (bh, bw, ri)


def test_jpeg_420_lossy_color_psnr():
    """Color content through 4:2:0 is lossy in chroma by construction;
    the decode must still land within a few dB of the 4:4:4 path on
    smooth content (chroma energy concentrated at low frequency) and
    nowhere near garbage."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        _ZIGZAG,
        decode_jpeg,
        encode_jpeg,
    )

    def psnr(a, b):
        mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
        return 10 * np.log10(255**2 / mse) if mse else float("inf")

    yy, xx = np.mgrid[0:32, 0:48]
    px = np.clip(
        np.stack(
            [
                128 + 80 * np.sin(yy / 17.0),
                128 + 80 * np.cos(xx / 23.0),
                128 + 60 * np.sin((xx + yy) / 29.0),
            ],
            axis=2,
        ),
        0,
        255,
    ).astype(np.uint8)
    k1 = np.array(
        [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
         14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
         18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113,
         92, 49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112,
         100, 103, 99]
    )
    q = k1[np.array(_ZIGZAG)]
    _w, _h, out444 = decode_jpeg(encode_jpeg(px, quant=q))
    _w, _h, out420 = decode_jpeg(
        encode_jpeg(px, quant=q, subsampling="420")
    )
    p444, p420 = psnr(out444, px), psnr(out420, px)
    assert p420 > 30
    assert p444 - p420 < 8  # subsampling cost, not a decode bug
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(px, subsampling="422")


def test_jpeg_malformed_fails_fast():
    import numpy as np
    import pytest

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    with pytest.raises(ValueError):
        decode_jpeg(b"notajpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0" + b"\x00" * 16)  # no SOF/SOS
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(px)[:-30])  # truncated entropy data


def test_gif_roundtrip_exact():
    """GIF is lossless for palette-sized images: encode→decode must be
    bit-identical across odd sizes, interlaced row order, and an image
    large enough to force LZW width growth through every code size up
    to the 4096-entry CLEAR/reset."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_gif,
        decode_image,
        encode_gif,
    )

    rng = np.random.RandomState(11)
    for h, w, ncol in ((1, 1, 1), (5, 7, 3), (13, 9, 8), (16, 16, 200)):
        pal = rng.randint(0, 256, (ncol, 3), dtype=np.uint8)
        px = pal[rng.randint(0, ncol, (h, w))]
        for interlace in (False, True):
            w2, h2, out = decode_gif(encode_gif(px, interlace=interlace))
            assert (w2, h2) == (w, h)
            assert (out == px).all()
    # 200x300 random grayscale: >4096 LZW codes → in-stream CLEAR reset
    big = rng.randint(0, 256, (200, 300, 1)).repeat(3, axis=2).astype(np.uint8)
    for interlace in (False, True):
        assert (decode_gif(encode_gif(big, interlace=interlace))[2] == big).all()
    w2, h2, _ = decode_image(encode_gif(big))  # dispatch by magic bytes
    assert (w2, h2) == (300, 200)


def test_resize_bilinear_semantics():
    """Vectorized bilinear must equal a naive per-pixel reference with
    the same convention (half-pixel centers, edge clamp, round-half-up)
    on arbitrary scales; at exact 2:1 it must equal the 2x2 box mean;
    at 1:1 it is the identity."""
    import numpy as np
    import pytest

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        resize_bilinear,
    )

    def naive(px, ow, oh):
        h, w, c = px.shape
        out = np.empty((oh, ow, c), dtype=np.uint8)
        for y in range(oh):
            for x in range(ow):
                xs = (x + 0.5) * (w / ow) - 0.5
                ys = (y + 0.5) * (h / oh) - 0.5
                x0, y0 = int(np.floor(xs)), int(np.floor(ys))
                fx, fy = xs - x0, ys - y0
                x0c, x1c = min(max(x0, 0), w - 1), min(max(x0 + 1, 0), w - 1)
                y0c, y1c = min(max(y0, 0), h - 1), min(max(y0 + 1, 0), h - 1)
                v = (
                    px[y0c, x0c].astype(float) * (1 - fx) * (1 - fy)
                    + px[y0c, x1c].astype(float) * fx * (1 - fy)
                    + px[y1c, x0c].astype(float) * (1 - fx) * fy
                    + px[y1c, x1c].astype(float) * fx * fy
                )
                out[y, x] = np.floor(v + 0.5).clip(0, 255)
        return out

    rng = np.random.RandomState(3)
    for (h, w), (oh, ow) in (
        ((8, 12), (4, 6)),      # exact 2:1
        ((7, 9), (3, 4)),       # odd dims, truncating 2:1
        ((5, 5), (5, 5)),       # identity
        ((4, 6), (9, 5)),       # upscale one axis, downscale the other
        ((3, 3), (10, 10)),     # heavy upscale → edge clamp on all sides
    ):
        px = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        got = resize_bilinear(px, ow, oh)
        assert got.shape == (oh, ow, 3)
        assert (got == naive(px, ow, oh)).all(), (h, w, oh, ow)
    px = rng.randint(0, 256, (8, 12, 3), dtype=np.uint8)
    box = (
        px.reshape(4, 2, 6, 2, 3).astype(np.int64).sum(axis=(1, 3)) + 2
    ) // 4  # round-half-up mean of each 2x2 block
    assert (resize_bilinear(px, 6, 4) == box).all()
    assert (resize_bilinear(px, 12, 8) == px).all()
    with pytest.raises(ValueError):
        resize_bilinear(px, 0, 4)


def test_phash64_invariances():
    """pHash must be bit-identical under a pure brightness offset
    (DC-only shift, provable) and under a clean 2x contrast scale
    (uniform AC scaling), must differ strongly across unrelated
    images, and must route non-32x32 inputs through the bilinear
    resize."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        phash64,
    )

    rng = np.random.RandomState(5)
    v = (64 + rng.randint(0, 64, (32, 32), dtype=np.int64)).astype(np.uint8)
    px = np.stack([v, v, v], axis=2)
    h = phash64(px)
    for off in (-8, -1, 3, 9):
        assert phash64((px.astype(np.int64) + off).astype(np.uint8)) == h
    # 2x contrast around 0: values in [128, 255] stay exact under *2
    half = (px.astype(np.int64) // 2 * 2).astype(np.uint8)  # even values
    assert phash64(half) == phash64((half.astype(np.int64) // 2).astype(
        np.uint8))  # halving = uniform AC scale, no rounding loss
    other = np.stack([v.T, v.T, v.T], axis=2).copy()
    assert bin(phash64(other) ^ h).count("1") > 8
    tall = np.repeat(px, 2, axis=0)  # 64x32 → resize path
    assert isinstance(phash64(tall), int)
    assert 0 <= phash64(tall) < 1 << 63


def test_augment_images_semantics(spark):
    """flip is horizontal, rot90 is CCW, crop is centered: on a 10x12
    marker image with a single bright pixel the augmented quadrant
    sums land exactly where hand-derived coordinates say; an oversized
    crop raises in-band."""
    import numpy as np
    import pytest

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        augment_images,
        encode_bmp,
    )

    px = np.zeros((10, 12, 3), dtype=np.uint8)
    px[1, 2, 0] = 200  # marker near the top-left
    def run(flip, rot, crop=(8, 8)):
        pdf = spark.createDataFrame(
            [(1, bytearray(encode_bmp(px)), flip, rot)],
            "doc_id bigint, payload binary, flip int, rot int",
        )
        return augment_images(pdf, crop=crop).collect()[0]

    # no-op aug: marker (1,2) → crop offset top=1,left=2 → (0,0): in TL
    r = run(0, 0)
    assert (r["sum_r"], r["tl_r"]) == (200, 200)
    # flip: x 2→9; crop → (0, 7): right half, outside TL
    r = run(1, 0)
    assert (r["sum_r"], r["tl_r"]) == (200, 0)
    # rot90 CCW once (no flip): (y,x)=(1,2) → (r,c)=(12-1-2, 1)=(9,1);
    # dims (12,10) → top=2,left=1 → (7,0): bottom-left, outside TL
    r = run(0, 1)
    assert (r["sum_r"], r["tl_r"]) == (200, 0)
    # rot twice: (1,2) → (8,9); top=1,left=2 → (7,7) in-crop, not TL
    r = run(0, 2)
    assert (r["sum_r"], r["tl_r"]) == (200, 0)
    with pytest.raises(Exception):  # crop larger than post-rot dims
        run(0, 0, crop=(11, 8))


def test_scene_changes_flags_shot_boundaries(spark):
    """A synthetic clip with two hard cuts must flag exactly the cut
    frames: slow per-frame drift (+1 luma) stays under the mean-abs-
    diff threshold, a +100 jump exceeds it, and the SAD values are
    exact integers."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        encode_y4m,
        scene_changes,
    )

    bases = [10, 11, 12, 120, 121, 20, 21]  # cuts at frames 3 and 5
    frames = [np.full((6, 8), b, dtype=np.uint8) for b in bases]
    pdf = spark.createDataFrame(
        [(1, bytearray(encode_y4m(frames)))], "doc_id bigint, payload binary"
    )
    rows = {r["frame_idx"]: r for r in scene_changes(pdf).collect()}
    assert set(rows) == {1, 2, 3, 4, 5, 6}
    for f, r in rows.items():
        expect_sad = abs(bases[f] - bases[f - 1]) * 48
        assert r["sad"] == expect_sad and r["n_px"] == 48
        assert r["is_cut"] == (1 if f in (3, 5) else 0)


def test_ima_adpcm_layout_and_roundtrip():
    """Pins the wire layout (block header <pred:int16><idx:u8><0:u8>,
    LOW nibble first, samplesPerBlock in the fmt extension) against a
    hand-built byte fixture, and the state machine against a manual
    simulation; ADPCM must track a smooth signal within a few steps
    after warm-up."""
    import struct

    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        _ima_adpcm_decode_block,
        _ima_reconstruct,
        decode_wav,
        encode_wav_adpcm,
    )

    # hand-built block: pred0=100, idx0=0 (step 7), codes [2, 9]
    # code 2: dq = 7>>3 + 7>>1 = 3 → pred 103, idx += index[2] = -1 → 0
    # code 9: dq = 0 + 7>>2 = 1, sign → pred 102, idx += index[1] = -1 → 0
    block = struct.pack("<hBB", 100, 0, 0) + bytes([2 | (9 << 4)])
    assert _ima_adpcm_decode_block(block).tolist() == [100, 103, 102]
    assert _ima_reconstruct(2, 100, 0) == (103, 0)

    # encoder writes exactly that layout for the equivalent input
    blob = encode_wav_adpcm(np.array([100, 103, 102], dtype=np.int16), 9000)
    rate, ch, dec = decode_wav(blob)
    assert (rate, ch) == (9000, 1)
    assert dec.tolist() == [100, 103, 102]  # this sequence is exactly
    # representable from (pred 100, step 7)
    i = blob.index(b"data")
    assert blob[i + 8 : i + 8 + len(block)] == block  # exact wire layout

    # odd sample counts round-trip via samplesPerBlock (no pad sample)
    x = np.array([0, 50, -80, 120], dtype=np.int16)
    assert decode_wav(encode_wav_adpcm(x, 8000, 30))[2].size == 4

    t = np.arange(400)
    sine = (600 * np.sin(t / 15)).astype(np.int16)
    _, _, rec = decode_wav(encode_wav_adpcm(sine, 8000, 25))
    assert np.abs(rec.astype(int) - sine.astype(int)).max() <= 40


def test_alaw_codec_properties():
    """A-law: silence encodes to the standard 0xD5 byte, EVERY code is
    idempotent (encode(decode(c)) == c for all 256 — A-law has no
    negative-zero alias), quantization error is bounded by half the
    top-segment step, and the WAV format-6 container round-trips."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        alaw_decode,
        alaw_encode,
        decode_wav,
        encode_wav_alaw,
    )

    assert alaw_encode(np.array([0], dtype=np.int16))[0] == 0xD5
    codes = np.arange(256, dtype=np.uint8)
    assert (alaw_encode(alaw_decode(codes)) == codes).all()
    x = np.arange(-32768, 32768, 11, dtype=np.int64).astype(np.int16)
    rec = alaw_decode(alaw_encode(x))
    err = np.abs(rec.astype(int) - np.clip(x.astype(int), -32760, 32760))
    assert err.max() <= 512
    rate, ch, dec = decode_wav(encode_wav_alaw(x[:21], 12000))
    assert (rate, ch, dec.size) == (12000, 1, 21)
    assert (dec == rec[:21]).all()


def test_equalize_hist_semantics():
    """Equalization stretches a low-contrast ramp to full range
    (max 255, min 0 with the standard cdf formula), is idempotent-ish
    on an already-uniform histogram (identity up to rounding), and
    maps a CONSTANT channel to 0 (den = 0 edge)."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        equalize_hist,
    )

    # 16 distinct values 100..115, uniform histogram → full stretch
    ramp = np.repeat(np.arange(100, 116, dtype=np.uint8), 16).reshape(16, 16)
    eq = equalize_hist(ramp)
    assert int(eq.min()) == 0 + (510 * 0 + 240) // 480  # first bucket → 0
    assert int(eq.max()) == 255
    # uniform 0..255 already equalized → identity up to rounding ±1
    full = np.arange(256, dtype=np.uint8).reshape(16, 16)
    assert np.abs(equalize_hist(full).astype(int) - full.astype(int)).max() <= 1
    const = np.full((8, 8), 42, dtype=np.uint8)
    assert (equalize_hist(const) == 0).all()


def test_mulaw_codec_properties():
    """G.711 spot values (0 → 0xFF, -1 → 0x7F, decode(0xFF) = 0), code
    idempotence (encode(decode(c)) == c for all codes except the
    negative-zero alias 0x7F), bounded quantization error, and the WAV
    format-7 container round trip."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_wav,
        encode_wav_mulaw,
        mulaw_decode,
        mulaw_encode,
    )

    assert mulaw_encode(np.array([0], dtype=np.int16))[0] == 0xFF
    assert mulaw_encode(np.array([-1], dtype=np.int16))[0] == 0x7F
    assert mulaw_decode(np.array([0xFF], dtype=np.uint8))[0] == 0
    codes = np.arange(256, dtype=np.uint8)
    rt = mulaw_encode(mulaw_decode(codes))
    assert (rt[codes != 0x7F] == codes[codes != 0x7F]).all()
    assert rt[0x7F] == 0xFF  # negative zero folds to positive zero

    x = np.arange(-32768, 32768, 7, dtype=np.int64).astype(np.int16)
    rec = mulaw_decode(mulaw_encode(x))
    err = np.abs(rec.astype(int) - np.clip(x.astype(int), -32635, 32635))
    # error ≤ half the segment step (2^(e+3)/... ≤ 512) + bias effects
    assert err.max() <= 1024

    rate, ch, dec = decode_wav(encode_wav_mulaw(x[:33], 11000))
    assert (rate, ch, dec.size) == (11000, 1, 33)
    assert (dec == rec[:33]).all()


def test_resample_linear_semantics():
    """Identity at equal rates; exact 2x up keeps every source sample
    and inserts floor-semantics midpoints (round-half-up works on
    NEGATIVE values too); integer-downsample picks exact source
    positions; arbitrary ratios match a naive per-sample reference."""
    import numpy as np
    import pytest

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        resample_linear,
    )

    x = np.array([-7, -6, -1, 0, 5, 100, -32768, 32767], dtype=np.int16)
    assert (resample_linear(x, 8000, 8000) == x).all()
    up = resample_linear(x, 8000, 16000)
    assert up.size == 16
    assert (up[::2] == x).all()
    mid = [(int(a) + int(b) + 1) // 2 for a, b in zip(x, x[1:])]
    assert up[1:-1:2].tolist() == mid  # floor((a+b)/2 + .5), incl. negatives
    assert up[-1] == x[-1]  # tail clamp
    down = resample_linear(up, 16000, 8000)
    assert (down == x).all()

    def naive(x, si, so):
        n_out = x.size * so // si
        out = []
        for j in range(n_out):
            p = j * si / so
            i0 = min(int(np.floor(p)), x.size - 1)
            i1 = min(i0 + 1, x.size - 1)
            v = x[i0] * (1 - (p - np.floor(p))) + x[i1] * (p - np.floor(p))
            out.append(int(np.floor(v + 0.5)))
        return out

    rng = np.random.RandomState(9)
    y = rng.randint(-1024, 1024, 200).astype(np.int16)
    for si, so in ((9000, 16000), (16000, 7000), (44100, 16000)):
        assert resample_linear(y, si, so).tolist() == naive(y, si, so)
    with pytest.raises(ValueError):
        resample_linear(y, 0, 8000)


def test_mel_features_against_independent_reference(spark):
    """The vectorized log-mel stage (gather-index framing + one matmul
    per batch) must match a deliberately different per-frame loop
    reference bit-for-bit, and behave physically: the dominant mel
    filter tracks the square wave's fundamental, and doubling the
    amplitude adds exactly log10(4) to every fully-saturated filter
    energy (checked to float tolerance)."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        encode_wav,
        mel_features,
        mel_filterbank,
    )

    def reference(samples, n_mels=8, frame=512, hop=256, sr=16000):
        fb = mel_filterbank(n_mels, frame, sr)
        win = np.hanning(frame + 1)[:-1]
        x = samples.astype(np.float64)
        rows = []
        for f in range((x.size - frame) // hop + 1):
            seg = x[f * hop : f * hop + frame] * win
            spec = np.fft.rfft(seg)
            power = spec.real**2 + spec.imag**2
            rows.append([
                float(np.log10(1.0 + np.dot(power, fb[m])))
                for m in range(n_mels)
            ])
        return rows

    n = np.arange(2048, dtype=np.int64)
    docs = []
    for d in (0, 3, 7):  # periods 4, 32, 128 → bins 128, 16, 4
        a, p = 100 + d % 50, 1 << (2 + d % 6)
        docs.append((d, (a * (1 - 2 * ((n // (p // 2)) % 2))).astype(np.int16)))
    pdf = spark.createDataFrame(
        [(d, bytearray(encode_wav(x, 16000))) for d, x in docs],
        "doc_id bigint, payload binary",
    )
    got = {
        (r["doc_id"], r["frame_id"]): r["features"]
        for r in mel_features(pdf).collect()
    }
    fb = mel_filterbank(8, 512, 16000)
    for d, x in docs:
        ref = reference(x)
        assert sum(1 for k in got if k[0] == d) == len(ref) == 7
        for f, row in enumerate(ref):
            assert got[(d, f)] == row, (d, f)
        # dominant mel filter contains the fundamental bin
        k = 512 // (1 << (2 + d % 6))
        assert int(np.argmax(got[(d, 0)])) == int(np.argmax(fb[:, k]))
    # amplitude doubling: log-mel shifts by ~log10(4) where energy >> 1
    d, x = docs[0]
    pdf2 = spark.createDataFrame(
        [(d, bytearray(encode_wav((2 * x).astype(np.int16), 16000)))],
        "doc_id bigint, payload binary",
    )
    loud = mel_features(pdf2).collect()[0]["features"]
    base = got[(d, 0)]
    for m in range(8):
        if base[m] > 3:  # 1 + e ≈ e regime
            assert abs((loud[m] - base[m]) - np.log10(4.0)) < 1e-3


def test_gif_malformed_fails_fast():
    import numpy as np
    import pytest

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    with pytest.raises(ValueError):
        decode_gif(b"notagif")
    px = np.full((6, 6, 3), 9, dtype=np.uint8)
    with pytest.raises(ValueError):
        decode_gif(encode_gif(px)[:-4])  # truncated LZW sub-blocks
    with pytest.raises(ValueError):  # >256 distinct colors is a palette error
        i = np.arange(257, dtype=np.int64)
        many = np.stack([i % 256, i // 256, i * 0], axis=1)
        encode_gif(many.astype(np.uint8).reshape(257, 1, 3))


def test_jpeg_progressive_matches_baseline_exactly():
    """T.81 Annex G: successive approximation + spectral selection
    deliver the SAME quantized coefficients as one baseline scan, just
    spread over 10 scans — so a complete progressive file must decode
    BIT-IDENTICALLY to its baseline twin, across both sampling
    layouts, with and without restart markers (which reset DC
    predictors and EOB runs per scan)."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(42)
    px = rng.randint(0, 256, (41, 53, 3), dtype=np.uint8)
    q = [16] * 64
    for sub in ("444", "420"):
        for ri in (0, 3):
            base = decode_jpeg(
                encode_jpeg(px, quant=q, subsampling=sub, restart_interval=ri)
            )[2]
            blob = encode_jpeg_progressive(
                px, quant=q, subsampling=sub, restart_interval=ri
            )
            w, h, prog = decode_jpeg(blob)  # dispatches on SOF2
            assert (w, h) == (53, 41)
            assert (prog == base).all(), (sub, ri)


def test_jpeg_progressive_truncated_scans_coarse_preview():
    """A progressive stream may end after any scan (that's the
    format's whole point: coarse image first). Decoding a 4-scan
    prefix must still produce a full-size image that approximates the
    original but is strictly worse than the complete 10-scan file."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, (24, 40, 3), dtype=np.uint8)
    q = [16] * 64

    def mse(a):
        return float(((a.astype(float) - px) ** 2).mean())

    full = decode_jpeg(encode_jpeg_progressive(px, quant=q))[2]
    prev = None
    for n in (2, 4, 10):
        w, h, out = decode_jpeg(encode_jpeg_progressive(px, quant=q, nscans=n))
        assert (w, h) == (40, 24)
        if prev is not None:
            assert mse(out) <= mse(prev)  # each scan refines
        prev = out
    assert (prev == full).all()  # nscans=10 is the complete script
    assert mse(full) < mse(decode_jpeg(
        encode_jpeg_progressive(px, quant=q, nscans=4)
    )[2])


def test_jpeg_progressive_block_constant_gray_exact():
    """The b22 oracle property carries over: 8×8-block-constant
    grayscale under all-ones quant round-trips exactly through the
    multi-scan path (DC-only content — the AC scans encode pure EOB
    runs — and refinement bits reassemble the DC value losslessly)."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(13)
    for sub in ("444", "420"):
        g = rng.randint(0, 256, (2, 3)).astype(np.uint8)
        gray = g.repeat(8, axis=0).repeat(8, axis=1)
        px = np.stack([gray, gray, gray], axis=2)
        w, h, out = decode_jpeg(encode_jpeg_progressive(px, subsampling=sub))
        assert (w, h) == (24, 16)
        assert (out == px).all(), sub


def test_png_round_trip_all_filters():
    """≥5 rows so the encoder's cycling filter exercises every
    reconstruction path (None/Sub/Up/Average/Paeth), RGB and RGBA."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(11)
    for ch in (3, 4):
        px = rng.randint(0, 256, (7, 6, ch), dtype=np.uint8)
        w, h, out = decode_png(encode_png(px))
        assert (w, h) == (6, 7)
        assert (out == px).all()


def test_png_hand_built_fixture():
    """Decode a byte-level hand-computed PNG (independent of our
    encoder): 2x2 RGB, row 0 filter None, row 1 filter Up — the
    filtered bytes are worked out by hand below."""
    import struct
    import zlib

    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_png,
    )

    # target pixels: row0 = (10,20,30),(40,50,60); row1 = (15,25,35),(45,55,65)
    # row1 with Up filter stores pixel - above = (5,5,5),(5,5,5)
    scan = (
        b"\x00" + bytes([10, 20, 30, 40, 50, 60])
        + b"\x02" + bytes([5, 5, 5, 5, 5, 5])
    )
    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    w, h, out = decode_png(blob)
    want = np.array(
        [[[10, 20, 30], [40, 50, 60]], [[15, 25, 35], [45, 55, 65]]],
        dtype=np.uint8,
    )
    assert (w, h) == (2, 2)
    assert (out == want).all()

    # corrupt one IDAT byte → CRC must catch it
    bad = bytearray(blob)
    idat_at = blob.index(b"IDAT")
    bad[idat_at + 5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))


def test_bmp_top_down_and_padding():
    """Negative height = top-down rows; odd widths exercise the 4-byte
    row padding both directions."""
    import struct

    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    px = np.random.RandomState(7).randint(0, 256, (3, 3, 3), dtype=np.uint8)
    blob = bytearray(encode_bmp(px))
    # flip the height field negative and re-order rows top-down
    (h,) = struct.unpack_from("<i", blob, 22)
    struct.pack_into("<i", blob, 22, -h)
    stride = 3 * 3 + ((-3 * 3) % 4)
    rows = [bytes(blob[54 + i * stride: 54 + (i + 1) * stride]) for i in range(3)]
    blob[54:] = b"".join(reversed(rows))
    w, hh, out = decode_bmp(bytes(blob))
    assert (w, hh) == (3, 3)
    assert (out == px).all()


def test_ppm_header_comments():
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_ppm,
    )

    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    blob = b"P6\n# a comment\n2 2\n# another\n255\n" + px.tobytes()
    w, h, out = decode_ppm(blob)
    assert (w, h) == (2, 2)
    assert (out == px).all()


def test_ppm_truncated_header_fails_fast():
    """A malformed/truncated header must raise, not spin: the old
    unbounded 'scan to whitespace' loop never terminated on b'' (which
    is not .isspace()), wedging the executor task inside mapInPandas."""
    import pytest

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_ppm,
    )

    for blob in (b"P6", b"P6\n2", b"P6\n# only a comment", b"P6\n2 2\n25"):
        with pytest.raises(ValueError):
            decode_ppm(blob)
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 xx\n255\n" + b"\0" * 12)


def test_salted_pairs_null_bucket_keys(spark):
    """NULL bucket keys must route like any other bucket (the old
    struct-isin predicate evaluated to NULL and silently dropped the
    rows from BOTH the cold and hot sides)."""
    from iot_system_plc_data_to_influxdb_spark.operators.skew import (
        salted_self_join_pairs,
    )

    rows = [(i, None if i < 3 else "k") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id int, bucket string")
    # force the hot path: threshold 2 makes BOTH buckets (3 rows each) hot
    got = {
        (r["d1"], r["d2"])
        for r in salted_self_join_pairs(
            df, ["bucket"], "doc_id", hot_threshold=2, n_salts=2
        ).collect()
    }
    want = {(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5)}
    assert got == want
    # cold path too (threshold high enough that nothing is hot)
    got_cold = {
        (r["d1"], r["d2"])
        for r in salted_self_join_pairs(
            df, ["bucket"], "doc_id", hot_threshold=100, n_salts=2
        ).collect()
    }
    assert got_cold == want


def test_wav_chunk_walk_with_extra_chunks():
    """fmt may be followed by LIST/fact chunks (odd-sized → padded)
    before data; the decoder must walk, not assume offsets."""
    import struct

    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    s = (np.arange(33, dtype=np.int64) * 97 % 2048 - 1024).astype(np.int16)
    blob = encode_wav(s, 44100)
    # splice an odd-length LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"  # pad byte
    patched = blob[:fmt_end] + extra + blob[fmt_end:]
    rate, ch, got = decode_wav(patched)
    assert rate == 44100 and ch == 1
    assert (got == s).all()


def test_minhash_finds_planted_neardups(spark):
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import b19_minhash

    pairs = b19_minhash(spark, "/root/testdata/sf0.01")
    rows = pairs.collect()
    assert len(rows) > 0
    assert all(r["jaccard"] >= 0.7 for r in rows)


def test_downsample_merge_property(spark):
    """downsample(a ∪ b) == merge(downsample(a), downsample(b)) for the
    associative aggs (SURVEY.md §5.5) — the map-side-combine invariant
    that makes the 100 TB plan correct."""
    ev = t(spark, SF_DIR, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)

    def ds(df):
        return df.groupBy(
            F.window("ts", "1 hour").start.alias("b"), "event_type"
        ).agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )

    whole = {(r["b"], r["event_type"]): r for r in ds(ev).collect()}
    pa = ds(a).collect()
    pb = ds(b).collect()
    merged = {}
    for r in pa + pb:
        k = (r["b"], r["event_type"])
        if k not in merged:
            merged[k] = dict(n=0, s=0, mn=None, mx=None)
        m = merged[k]
        m["n"] += r["n"]
        m["s"] += r["s"]
        m["mn"] = r["mn"] if m["mn"] is None else min(m["mn"], r["mn"])
        m["mx"] = r["mx"] if m["mx"] is None else max(m["mx"], r["mx"])
    assert set(whole) == set(merged)
    for k, w in whole.items():
        assert merged[k]["n"] == w["n"]
        assert merged[k]["s"] == w["s"]
        assert merged[k]["mn"] == w["mn"]
        assert merged[k]["mx"] == w["mx"]


def test_knn_ivf_recall_vs_bruteforce(spark):
    from iot_system_plc_data_to_influxdb_spark.operators.similarity import knn_ivf

    emb = t(spark, SF_DIR, "embeddings")
    exact = {r["vec_id"] for r in knn_bruteforce(emb, 0, k=10).collect()}
    approx_rows = knn_ivf(emb, 0, k=10, n_probe_cells=3).collect()
    approx = {r["vec_id"] for r in approx_rows}
    assert len(approx_rows) == 10
    # random corpus = hard case; 3/8 cells probed should still catch a
    # meaningful share of the true neighbors
    assert len(approx & exact) >= 3


def test_kmeans_recovers_planted_clusters(spark):
    """The testdata embeddings are isotropic (labels are not geometric),
    so plant 10 well-separated gaussian clusters here and assert
    Lloyd's recovers them perfectly and deterministically."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.clustering import (
        kmeans_assign,
        kmeans_summary,
    )

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(10, 16)) * 10.0
    rows = []
    for i in range(400):
        lab = i % 10
        v = centers[lab] + rng.normal(size=16)
        rows.append((i, [float(x) for x in v], lab))
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )

    assigned = kmeans_assign(emb, k=10, max_iter=10)
    joined = assigned.join(emb.select("vec_id", "label"), "vec_id")
    purity_rows = (
        joined.groupBy("cluster", "label")
        .count()
        .groupBy("cluster")
        .agg(F.max("count").alias("maj"), F.sum("count").alias("tot"))
        .collect()
    )
    maj = sum(r["maj"] for r in purity_rows)
    tot = sum(r["tot"] for r in purity_rows)
    assert tot == 400
    assert maj / tot > 0.95, f"purity {maj/tot:.3f}"
    # summary view covers every vector exactly once
    summ = kmeans_summary(assigned).collect()
    assert sum(r["n_vectors"] for r in summ) == 400
    # determinism: same input -> same assignment
    again = kmeans_assign(emb, k=10, max_iter=10)
    diff = (
        assigned.alias("a")
        .join(again.alias("b"), "vec_id")
        .filter(F.col("a.cluster") != F.col("b.cluster"))
        .count()
    )
    assert diff == 0


def test_connected_components_star_chain(spark):
    """Adversarial 200-node path graph: min-label propagation needs
    O(diameter)=199 supersteps; large-star/small-star must converge in
    O(log n) rounds with every node labeled 0."""
    from iot_system_plc_data_to_influxdb_spark.operators.graph import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "d1 long, d2 long"
    )
    # driver_threshold=0 forces the distributed star rounds — the
    # 100 TB path this test exists to pin
    labels, rounds = connected_components(chain, driver_threshold=0)
    got = {r["node"]: r["component"] for r in labels.collect()}
    assert got == {i: 0 for i in range(200)}
    assert 0 < rounds <= 12  # log-ish, not diameter-ish
    # the adaptive driver path must produce identical labels
    labels2, rounds2 = connected_components(chain)
    got2 = {r["node"]: r["component"] for r in labels2.collect()}
    assert got2 == got
    assert rounds2 == 0  # small edge list took the union-find path


def test_connected_components_random_vs_union_find(spark):
    import random

    from iot_system_plc_data_to_influxdb_spark.operators.graph import (
        connected_components,
    )

    rng = random.Random(13)
    pairs = sorted({
        tuple(sorted(rng.sample(range(300), 2))) for _ in range(220)
    })
    parent = list(range(300))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    want = {}
    nodes_in_pairs = {n for p in pairs for n in p}
    roots = {}
    for n in sorted(nodes_in_pairs):
        r = find(n)
        roots.setdefault(r, n)  # min node per component
        want[n] = roots[r]

    df = spark.createDataFrame(pairs, "d1 long, d2 long")
    for threshold in (0, 2_000_000):  # star rounds AND driver union-find
        labels, _ = connected_components(df, driver_threshold=threshold)
        got = {r["node"]: r["component"] for r in labels.collect()}
        assert got == want


def test_decontaminate_flags_eval_overlap(spark):
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        b21_decontaminate,
    )

    out = {r["doc_id"]: r for r in b21_decontaminate(spark, SF_DIR).collect()}
    # eval docs (doc_id % 50 == 0) are excluded from the output
    assert all(d % 50 != 0 for d in out)
    # flag agrees with the overlap count everywhere
    assert all((r["n_overlap"] > 0) == r["contaminated"] for r in out.values())
    # the synthetic corpus reuses a tiny vocabulary, so some 5-gram
    # collisions with the eval slice must exist
    assert any(r["contaminated"] for r in out.values())


def test_repetition_signals_bounds(spark):
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        b21_repetition_signals,
    )

    rows = b21_repetition_signals(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_distinct"] <= r["n_grams"]
        assert 0 < r["top_gram_frac"] <= 1.0
        assert 0 <= r["dup_gram_frac"] < 1.0
        # dup fraction is exactly 1 - distinct/grams, rounded half-up
        exact = (r["n_grams"] - r["n_distinct"]) / r["n_grams"]
        assert abs(r["dup_gram_frac"] - exact) <= 0.00005 + 1e-12


def test_pii_redaction_scrubs_planted_contacts(spark):
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        b21_pii_redaction,
    )

    rows = b21_pii_redaction(spark, SF_DIR).collect()
    assert len(rows) > 0
    # every doc got exactly one planted email and one planted phone
    assert all(r["n_emails"] == 1 and r["n_phones"] == 1 for r in rows)
    assert all(len(r["redacted_md5"]) == 32 for r in rows)


def test_embedding_quantization_reconstruction(spark):
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        b20_embedding_quantization,
    )

    rows = b20_embedding_quantization(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_dims"] == 64
        # int8 codes: per-dim sums bounded by 255 * n_dims
        assert 0 <= r["q_sum"] <= 255 * 64
        # reconstruction error < one quantization step in the scaled
        # units (err < rng ≤ 255 * rng / 255)
        assert r["max_err_scaled"] >= 0
        assert r["sum_err_scaled"] >= r["max_err_scaled"]


def test_kmeans_parallel_init_beats_pathological_seeding(spark):
    """Order the data so the k lowest vec_ids all sit in ONE planted
    cluster (the worst case for first-k seeding); kmeans|| must still
    recover the 10 planted clusters, deterministically."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.clustering import (
        kmeans_assign,
    )

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(10, 16)) * 12.0
    rows = []
    for i in range(400):
        # first 40 ids → cluster 0, the rest round-robin
        lab = 0 if i < 40 else i % 10
        v = centers[lab] + rng.normal(size=16)
        rows.append((i, [float(x) for x in v], lab))
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )

    assigned = kmeans_assign(emb, k=10, max_iter=15, init="kmeans||")
    joined = assigned.join(emb.select("vec_id", "label"), "vec_id")
    purity_rows = (
        joined.groupBy("cluster", "label")
        .count()
        .groupBy("cluster")
        .agg(F.max("count").alias("maj"), F.sum("count").alias("tot"))
        .collect()
    )
    maj = sum(r["maj"] for r in purity_rows)
    assert maj / 400 > 0.95, f"purity {maj/400:.3f}"
    # deterministic: the sketch uses md5 draws, not an RNG
    again = kmeans_assign(emb, k=10, max_iter=15, init="kmeans||")
    diff = (
        assigned.alias("a")
        .join(again.alias("b"), "vec_id")
        .filter(F.col("a.cluster") != F.col("b.cluster"))
        .count()
    )
    assert diff == 0


def test_sequence_pack_invariants(spark):
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        _PACK_CAPACITY,
        _PACK_SHARD_SPAN,
        b21_sequence_pack,
    )

    rows = b21_sequence_pack(spark, SF_DIR).collect()
    assert len(rows) > 0
    # two-level packing: a bin lives inside ONE (lang, shard) stream
    by_bin = {}
    for r in rows:
        assert r["shard"] == r["doc_id"] // _PACK_SHARD_SPAN
        by_bin.setdefault((r["lang"], r["shard"], r["bin_id"]), []).append(r)
    for (_lang, _sh, _b), docs in by_bin.items():
        fill = sum(r["n_tokens"] for r in docs)
        # a bin only overflows when a single doc exceeds capacity
        assert fill <= _PACK_CAPACITY or len(docs) == 1
    # bins are dense per (lang, shard) stream starting at 0, and the
    # hard group bound holds: a stream never exceeds the shard span
    streams = {(r["lang"], r["shard"]) for r in rows}
    assert len(streams) > len({r["lang"] for r in rows}), (
        "shard boundaries must be exercised at the test SF"
    )
    for lang, sh in streams:
        bins = sorted({b for (l2, s2, b) in by_bin if (l2, s2) == (lang, sh)})
        assert bins == list(range(len(bins)))
        n_docs = sum(
            len(v) for (l2, s2, _b), v in by_bin.items()
            if (l2, s2) == (lang, sh)
        )
        assert n_docs <= _PACK_SHARD_SPAN


def test_product_quantization_roundtrip(spark):
    """PQ on planted clustered vectors: codes stay in range, encoding is
    deterministic, and ADC top-k recovers a solid share of the true
    neighbors (clustered data — the case PQ is built for)."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.pq import (
        pq_encode,
        pq_knn,
        pq_train,
    )

    rng = np.random.default_rng(5)
    centers = rng.normal(size=(8, 32)) * 8.0
    rows = []
    for i in range(320):
        v = centers[i % 8] + rng.normal(size=32)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    books = pq_train(emb, m=4, k=8, max_iter=4)
    assert len(books) == 4 and all(len(b) == 8 for b in books)
    assert all(len(c) == 8 for b in books for c in b)

    codes = pq_encode(emb, books).cache()
    got = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    assert len(got) == 320
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c) for c in got.values())
    # deterministic encode
    again = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, books).collect()}
    assert got == again

    # ADC recall vs exact brute force on the same probe
    probe = 0
    pv = dict(rows)[probe]
    exact = sorted(
        ((sum((a - b) ** 2 for a, b in zip(pv, v)), i) for i, v in rows if i != probe)
    )[:10]
    exact_ids = {i for _, i in exact}
    approx_ids = {r["vec_id"] for r in pq_knn(emb, codes, books, probe, k=10).collect()}
    assert len(approx_ids) == 10
    # 4 coarse codes can't rank WITHIN a cluster, but every retrieved
    # vector must come from the probe's planted cluster, with real
    # overlap against the exact top-10
    assert all(i % 8 == probe % 8 for i in approx_ids), approx_ids
    assert len(approx_ids & exact_ids) >= 3, (approx_ids, exact_ids)


def test_train_val_test_split_deterministic_and_exhaustive(spark):
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        b18_train_val_test_split,
    )

    rows = b18_train_val_test_split(spark, SF_DIR).collect()
    by_split = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    total = sum(by_split.values())
    n_docs = t(spark, SF_DIR, "documents").count()
    # every doc lands in exactly one split; train dominates
    assert total == n_docs
    assert set(by_split) <= {"train", "val", "test"}
    assert by_split["train"] > 0.7 * total
    # pure hash of the key → identical assignment on a second run
    again = {
        (r["split"], r["lang"]): r["n_docs"]
        for r in b18_train_val_test_split(spark, SF_DIR).collect()
    }
    assert again == {(r["split"], r["lang"]): r["n_docs"] for r in rows}


def test_incremental_dedup_verdicts_consistent(spark):
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        b19_incremental_dedup,
    )

    rows = b19_incremental_dedup(spark, SF_DIR).collect()
    docs = t(spark, SF_DIR, "documents")
    n_delta = docs.filter(
        F.substring("source", 4, 10).cast("int") >= 10
    ).count()
    # one verdict per delta doc, delta only
    assert len(rows) == n_delta
    assert {r["verdict"] for r in rows} <= {"exact_dup", "near_dup", "kept"}
    assert all(int(r["source"][3:]) >= 10 for r in rows)
    # every exact_dup really has a byte-identical base twin
    exact_ids = [r["doc_id"] for r in rows if r["verdict"] == "exact_dup"]
    if exact_ids:
        base_hashes = {
            r[0]
            for r in docs.filter(F.substring("source", 4, 10).cast("int") < 10)
            .select(F.md5("text"))
            .collect()
        }
        dup_hashes = {
            r[0]
            for r in docs.filter(F.col("doc_id").isin(exact_ids))
            .select(F.md5("text"))
            .collect()
        }
        assert dup_hashes <= base_hashes


def test_boilerplate_ngrams_bounds(spark):
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        b21_boilerplate_ngrams,
    )

    rows = b21_boilerplate_ngrams(spark, SF_DIR).collect()
    assert len(rows) == t(spark, SF_DIR, "documents").count()
    for r in rows:
        assert 0 < r["n_grams"]
        assert 0 <= r["n_boiler"] <= r["n_grams"]
        assert 0.0 <= r["boiler_frac"] <= 1.0


def test_sample_frames_shapes(spark):
    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        sample_frames,
    )

    rows = [
        (1, b"x" * 300),   # frames at 0,128,256 -> lens 64,64,44
        (2, b"y" * 64),    # one frame, exactly frame_bytes
        (3, b"z" * 10),    # one short frame
        (4, b""),          # empty payload -> no frames
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {
        (r["doc_id"], r["frame_idx"]): (r["offset"], r["frame_len"], bytes(r["frame"]))
        for r in sample_frames(df).collect()
    }
    assert out == {
        (1, 0): (0, 64, b"x" * 64),
        (1, 1): (128, 64, b"x" * 64),
        (1, 2): (256, 44, b"x" * 44),
        (2, 0): (0, 64, b"y" * 64),
        (3, 0): (0, 10, b"z" * 10),
    }


def test_window_stats_shapes(spark):
    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        window_stats,
    )

    rows = [
        (1, bytes(range(10)) * 60),  # 600 bytes -> windows 256,256,88
        (2, b"\x05" * 256),          # exactly one full window
        (3, b"\xff" * 10),           # one short window
        (4, b""),                    # empty payload -> no windows
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {
        (r["doc_id"], r["win_idx"]): (r["n"], r["sum_amp"], r["sum_sq"], r["peak"])
        for r in window_stats(df).collect()
    }
    pat = bytes(range(10)) * 60
    def stats(b):
        return (len(b), sum(b), sum(x * x for x in b), max(b))
    assert out == {
        (1, 0): stats(pat[0:256]),
        (1, 1): stats(pat[256:512]),
        (1, 2): stats(pat[512:600]),
        (2, 0): (256, 5 * 256, 25 * 256, 5),
        (3, 0): (10, 255 * 10, 255 * 255 * 10, 255),
    }


def test_chunk_windows_geometry(spark, monkeypatch, tmp_path):
    """Chunk grid edges: short doc -> one chunk; exactly one window ->
    one chunk; window+1 tokens -> two overlapping chunks covering all."""
    import iot_system_plc_data_to_influxdb_spark.plans.northstar as ns

    rows = [
        (1, " ".join(f"t{i}" for i in range(5))),    # 5 tokens
        (2, " ".join(f"t{i}" for i in range(50))),   # exactly one window
        (3, " ".join(f"t{i}" for i in range(51))),   # spills into chunk 1
        (4, " ".join(f"t{i}" for i in range(130))),  # 0,40,80 -> 3 chunks
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    monkeypatch.setattr(ns, "t", lambda _s, _d, _n: df)
    out = ns.b21_chunk_windows(spark, "ignored")
    got = {
        (r["doc_id"], r["chunk_id"]): (r["start_tok"], r["n_tok"])
        for r in out.collect()
    }
    assert got == {
        (1, 0): (0, 5),
        (2, 0): (0, 50),
        (3, 0): (0, 50),
        (3, 1): (40, 11),
        (4, 0): (0, 50),
        (4, 1): (40, 50),
        (4, 2): (80, 50),
    }


def test_boilerplate_hashed_equals_string_variant(spark):
    """The xxhash64-shuffle variant must be row-identical to the exact
    string-gram twin (the oracle) — hashing narrows the shuffle, never
    the result."""
    import iot_system_plc_data_to_influxdb_spark.plans as plans

    sf = "/root/testdata/sf0.001"
    qs = plans.all_queries()
    a = sorted(map(tuple, qs["b21_boilerplate_ngrams"](spark, sf).collect()))
    b = sorted(map(tuple, qs["b21_boilerplate_hashed"](spark, sf).collect()))
    assert a == b and len(a) > 0


def test_semdedup_drop_set_properties(spark):
    """Dropped rows always point at an earlier same-cluster survivor-or-
    dup (dup_of < vec_id), and survivors ∪ dropped = corpus."""
    import iot_system_plc_data_to_influxdb_spark.plans as plans

    dropped = plans.all_queries()["b19_semdedup"](spark, SF_DIR).collect()
    n_vecs = t(spark, SF_DIR, "embeddings").count()
    drop_ids = {r["vec_id"] for r in dropped}
    assert len(drop_ids) == len(dropped)  # one verdict per dropped vec
    for r in dropped:
        assert r["dup_of"] < r["vec_id"]
        assert 0.0 < r["max_cos"] <= 1.0
    # survivors = everything not dropped; the split is a partition
    assert len(drop_ids) < n_vecs


def test_classifier_score_is_shuffle_free(spark):
    """The linear-classifier scorer must compile to a map-only plan —
    no Exchange anywhere: that IS the operator's 100 TB contract."""
    import contextlib
    import io

    import iot_system_plc_data_to_influxdb_spark.plans as plans

    df = plans.all_queries()["b21_classifier_score"](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    # the single explicit repartition of the one-file input is the only
    # allowed exchange (formatted mode prints each node twice: tree +
    # detail); scoring itself adds none
    assert p.count("Exchange") <= 2, p[:1500]
    labels = {r["label"] for r in df.collect()}
    assert labels <= {"keep", "drop"}


def test_epoch_shuffle_is_permutation(spark):
    """Each shard's positions are 1..n with no gaps; shards partition
    the corpus; re-running is bit-identical (same salt ⇒ same epoch)."""
    import iot_system_plc_data_to_influxdb_spark.plans as plans

    fn = plans.all_queries()["b18_epoch_shuffle"]
    rows = fn(spark, SF_DIR).collect()
    n_docs = t(spark, SF_DIR, "documents").count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    again = {(r["doc_id"], r["shard"], r["pos_in_shard"]) for r in fn(spark, SF_DIR).collect()}
    assert again == {(r["doc_id"], r["shard"], r["pos_in_shard"]) for r in rows}


def test_lm_bigram_fit_terciles_balanced(spark):
    """NTILE(3) buckets differ in size by ≤1 and reference docs (the
    model's own training slice) score at least as well on average."""
    import iot_system_plc_data_to_influxdb_spark.plans as plans

    rows = plans.all_queries()["b21_lm_bigram_fit"](spark, SF_DIR).collect()
    sizes = {}
    for r in rows:
        sizes[r["ppl_bucket"]] = sizes.get(r["ppl_bucket"], 0) + 1
        assert 0 <= r["matched"]
        assert r["n_bigrams"] >= 1
    assert set(sizes) == {1, 2, 3}
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_span_dedup_geometry(spark):
    """Spans are maximal: ≥5 tokens, inside doc bounds, non-overlapping
    and separated by >1 gap per doc (else the islands merge was wrong)."""
    import iot_system_plc_data_to_influxdb_spark.plans as plans

    rows = plans.all_queries()["b19_span_dedup"](spark, SF_DIR).collect()
    assert rows, "synthetic corpus should contain some cross-doc 5-grams"
    lens = {
        r["doc_id"]: r["n"]
        for r in t(spark, SF_DIR, "documents")
        .select("doc_id", F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n"))
        .collect()
    }
    by_doc = {}
    for r in rows:
        assert r["n_tok"] >= 5
        assert r["n_tok"] == r["end_tok"] - r["start_tok"] + 1
        assert 0 <= r["start_tok"] and r["end_tok"] < lens[r["doc_id"]]
        by_doc.setdefault(r["doc_id"], []).append((r["start_tok"], r["end_tok"]))
    for doc, spans in by_doc.items():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            # a gap of ≤ 5 between starts would have merged; post-merge
            # spans must be disjoint with at least one clean token between
            assert s2 > e1 + 1, (doc, spans)


def test_y4m_round_trip_and_parsing():
    """Y4M container: round trip, order-free header tokens, FRAME
    marker parameters, and the C420 per-frame byte budget."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
    )

    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 256, (6, 8), dtype=np.uint8) for _ in range(3)]
    w, h, fps, out = decode_y4m(encode_y4m(frames, fps=30))
    assert (w, h, fps, len(out)) == (8, 6, 30, 3)
    for a, b in zip(frames, out):
        assert (a == b).all()

    # order-free header tokens + FRAME marker parameters
    luma = bytes(range(4)) * 1  # 2x2 luma
    chroma = b"\x80" * 2  # 1x1 Cb + 1x1 Cr
    blob = (
        b"YUV4MPEG2 C420jpeg H2 F24:1 W2 Ip A1:1\n"
        + b"FRAME Xparam\n" + luma + chroma
    )
    w, h, fps, out = decode_y4m(blob)
    assert (w, h, fps, len(out)) == (2, 2, 24, 1)
    assert out[0].tolist() == [[0, 1], [2, 3]]

    import pytest as _pt

    with _pt.raises(ValueError):
        decode_y4m(b"RIFF....")
    with _pt.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W2 H2 C422\nFRAME\n" + b"\x00" * 8)
    with _pt.raises(ValueError):
        encode_y4m([np.zeros((3, 4), dtype=np.uint8)])  # odd height


def test_mixture_epochs_invariants(spark):
    """Repeat-factor semantics: k=1 sources get exactly one epoch of
    every doc; k=0 sources get 2 full epochs + a ~half fractional
    third; k=2 sources get only a ~quarter fractional first epoch;
    epoch populations are deterministic (md5) and non-increasing."""
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        b18_mixture_epochs,
    )

    sf = "/root/testdata/sf0.001"
    rows = b18_mixture_epochs(spark, sf).collect()
    per_source_total = {
        r["source"]: r["cnt"]
        for r in t(spark, sf, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    by = {}
    for r in rows:
        by.setdefault(r["source"], {})[r["epoch"]] = r["n_docs"]
    for source, epochs in by.items():
        k = int(source[3:]) % 3
        total = per_source_total[source]
        if k == 1:
            assert epochs == {1: total}
        elif k == 0:
            assert epochs[1] == total and epochs[2] == total
            assert 0 < epochs.get(3, 0) < total  # ~50% fractional
        else:
            assert set(epochs) == {1} and 0 < epochs[1] < total  # ~25%
        # epoch populations never increase
        seq = [epochs[e] for e in sorted(epochs)]
        assert seq == sorted(seq, reverse=True)
    # determinism: a second run returns the identical multiset
    again = {(r["source"], r["epoch"], r["n_docs"], r["n_shards"])
             for r in b18_mixture_epochs(spark, sf).collect()}
    assert again == {(r["source"], r["epoch"], r["n_docs"], r["n_shards"])
                     for r in rows}


def test_pcm24_roundtrip_full_range():
    """PCM24 encode→decode is the identity over the full 24-bit signed
    range, including both extremes and the sign-bit boundary — a wrong
    byte order, stride, or sign extension fails here before the oracle
    sees it."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_wav,
        encode_wav_pcm24,
    )

    x = np.array(
        [-8388608, -8388607, -1, 0, 1, 0x7FFFFF, -0x800000 + 12345,
         4242424, -4242424],
        dtype=np.int64,
    )
    rate, ch, dec = decode_wav(encode_wav_pcm24(x, 44100))
    assert (rate, ch) == (44100, 1)
    assert dec.dtype == np.int32 and (dec.astype(np.int64) == x).all()
    # out-of-range rejects rather than silently wrapping
    import pytest as _pytest

    with _pytest.raises(ValueError):
        encode_wav_pcm24(np.array([1 << 23]), 8000)
    # empty payload decodes to zero samples
    assert decode_wav(encode_wav_pcm24(np.array([], dtype=np.int64), 8000))[
        2
    ].size == 0


def test_png_palette_roundtrip_all_filters():
    """Indexed-color PNG: encode→decode identity over images tall
    enough to cycle all five scanline filters on the index bytes, plus
    the palette-order invariance (decode returns PIXELS, so any
    palette permutation with remapped indices is equivalent)."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_png,
        encode_png_palette,
    )

    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, size=(200, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 200, size=(11, 13))]
    w, h, dec = decode_png(encode_png_palette(img))
    assert (w, h) == (13, 11) and (dec == img).all()
    import pytest as _pytest

    i = np.arange(257, dtype=np.int64)
    too_many = np.stack(
        [i % 256, i // 256, np.zeros_like(i)], axis=1
    ).reshape(257, 1, 3)
    with _pytest.raises(ValueError):
        encode_png_palette(too_many.astype(np.uint8))


def test_png_gray_roundtrip():
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_png,
        encode_png_gray,
    )

    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, size=(11, 13), dtype=np.uint8)
    w, h, dec = decode_png(encode_png_gray(img))
    assert (w, h) == (13, 11)
    assert (dec == np.repeat(img[:, :, None], 3, axis=2)).all()


def test_float32_wav_roundtrip():
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_wav,
        encode_wav_float32,
    )

    x = np.array([-8388608, -1, 0, 1, 8388607, 424242], dtype=np.int64)
    rate, ch, dec = decode_wav(encode_wav_float32(x, 22050))
    assert (rate, ch) == (22050, 1)
    assert (dec.astype(np.int64) == x).all()


def test_y4m_c444_roundtrip():
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
    )

    frames = [
        (np.arange(35, dtype=np.int64).reshape(5, 7) * k % 256).astype(
            np.uint8
        )
        for k in (1, 3)
    ]
    w, h, fps, dec = decode_y4m(encode_y4m(frames, fps=9, c444=True))
    assert (w, h, fps) == (7, 5, 9)
    assert len(dec) == 2 and all((a == b).all() for a, b in zip(dec, frames))


def test_tiff_roundtrip_both_byte_orders():
    """TIFF encode→decode is exact for both 'II' and 'MM' byte orders,
    single- and multi-strip (RowsPerStrip=4), including the
    inline-vs-offset IFD value rule exercised by the strip tables."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_tiff,
        encode_tiff,
    )

    rng = np.random.default_rng(7)
    for big_endian in (False, True):
        for h, w in ((3, 5), (4, 4), (13, 9)):
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            w2, h2, out = decode_tiff(encode_tiff(px, big_endian=big_endian))
            assert (w2, h2) == (w, h)
            assert (out == px).all()


def test_tiff_compressed_roundtrip():
    """LZW (with and without Predictor=2 horizontal differencing) and
    PackBits strips decode back to the exact pixels in both byte
    orders, multi-strip included."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_tiff,
        encode_tiff,
    )

    rng = np.random.default_rng(11)
    for h, w in ((3, 5), (4, 4), (13, 9)):
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for big_endian in (False, True):
            for comp, pred in ((5, False), (5, True), (32773, False)):
                w2, h2, out = decode_tiff(
                    encode_tiff(
                        px,
                        big_endian=big_endian,
                        compression=comp,
                        predictor=pred,
                    )
                )
                assert (w2, h2) == (w, h)
                assert (out == px).all()


def test_tiff_lzw_early_change_and_clear():
    """The TIFF-variant LZW corner cases: the early-change width bump
    (9→10 at code 511, not 512) and the table clear at 4095 both
    round-trip — a long low-entropy stream forces several clears."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    rng = np.random.default_rng(3)
    long = bytes(rng.integers(0, 256, size=120_000, dtype=np.uint8))
    assert _tiff_lzw_decode(_tiff_lzw_encode(long), len(long)) == long
    runs = bytes(
        np.repeat(rng.integers(0, 3, size=4000), 9).astype(np.uint8)
    )
    assert _tiff_lzw_decode(_tiff_lzw_encode(runs), len(runs)) == runs
    assert _tiff_lzw_decode(_tiff_lzw_encode(b""), 0) == b""


def test_tiff_compressed_gate():
    """Compression codes outside {1, 5, 32773} raise the documented
    NotImplementedError gate instead of silently mis-decoding, and a
    missing required tag raises a descriptive ValueError (not a bare
    KeyError)."""
    import struct

    import numpy as np
    import pytest

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        decode_tiff,
        encode_tiff,
    )

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    payload = bytearray(encode_tiff(px))
    # patch the Compression entry's value (tag 259, SHORT 1) to 7
    # (JPEG-in-TIFF — genuinely out of profile now that 5/32773 decode)
    (ifd_off,) = struct.unpack_from("<I", payload, 4)
    (n,) = struct.unpack_from("<H", payload, ifd_off)
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        (tag,) = struct.unpack_from("<H", payload, base)
        if tag == 259:
            struct.pack_into("<H", payload, base + 8, 7)
    with pytest.raises(NotImplementedError, match="Compression=7"):
        decode_tiff(bytes(payload))

    # retype ImageWidth (tag 256) to RATIONAL so the IFD walk skips it:
    # the decoder must gate with ValueError, not crash with KeyError
    payload = bytearray(encode_tiff(px))
    (ifd_off,) = struct.unpack_from("<I", payload, 4)
    (n,) = struct.unpack_from("<H", payload, ifd_off)
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        (tag,) = struct.unpack_from("<H", payload, base)
        if tag == 256:
            struct.pack_into("<H", payload, base + 2, 5)  # RATIONAL
    with pytest.raises(ValueError, match="required tag"):
        decode_tiff(bytes(payload))


def test_tiff_lzw_packbits_property_roundtrip():
    """Hypothesis: TIFF-variant LZW and PackBits round-trip arbitrary
    byte streams — uniform noise, low-entropy runs, and boundary
    lengths (0, 1, 127, 128, 129 literal/run edges for PackBits; code
    width bumps for LZW)."""
    from hypothesis import given, settings, strategies as st

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        _packbits_decode,
        _packbits_encode,
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=0, max_size=4000))
    def roundtrip(data):
        assert _tiff_lzw_decode(_tiff_lzw_encode(data), len(data)) == data
        assert _packbits_decode(_packbits_encode(data), len(data)) == data

    roundtrip()

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(1, 300)),
            min_size=1,
            max_size=30,
        )
    )
    def runs_roundtrip(spec):
        data = b"".join(bytes([b]) * n for b, n in spec)
        assert _tiff_lzw_decode(_tiff_lzw_encode(data), len(data)) == data
        assert _packbits_decode(_packbits_encode(data), len(data)) == data

    runs_roundtrip()


def test_embedding_audit_catches_ragged_dims(spark, tmp_path):
    """Round-8 verdict #3: a corpus with dim != 64 — including RAGGED
    dims, the exact broken-producer case the audit exists to catch —
    must (a) surface as a min_dim != max_dim anomaly in the audit
    output, and (b) hash-match between the Spark query and the DuckDB
    oracle, whose dim bound is now derived from the data instead of
    the old hardcoded unnest(range(1, 65)) that silently truncated
    wider vectors into a mystery hash mismatch."""
    import duckdb

    import iot_system_plc_data_to_influxdb_spark.plans as plans

    sys_path_dir = "/root/repo/tools"
    import sys

    if sys_path_dir not in sys.path:
        sys.path.insert(0, sys_path_dir)
    from check_oracle import canon

    # ragged corpus: label 'ok' fixed 72-dim (wider than the old 64
    # cap), label 'ragged' mixes 72- and 40-dim vectors
    rows = []
    for i in range(6):
        rows.append((i, "ok", [float((i + j) % 5) / 4 for j in range(72)]))
    for i in range(6, 10):
        d = 72 if i % 2 == 0 else 40
        rows.append((i, "ragged", [float((i * j) % 7) / 8 for j in range(d)]))
    spark.createDataFrame(
        rows, "vec_id bigint, label string, embedding array<float>"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    sdf = plans.all_queries()["b20_embedding_audit"](spark, str(tmp_path))
    srows = [tuple(r) for r in sdf.collect()]
    by_label = {r[0]: r for r in srows}
    # the audit CATCHES the raggedness: dim bounds disagree
    assert by_label["ragged"][2] == 40 and by_label["ragged"][3] == 72
    assert by_label["ok"][2] == by_label["ok"][3] == 72

    con = duckdb.connect()
    # spark wrote a parquet DIRECTORY; duckdb needs the part-file glob
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{tmp_path}/embeddings.parquet/*.parquet'"
    )
    res = con.sql(plans.all_oracles()["b20_embedding_audit"])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    con.close()
    assert sorted(sdf.columns) == sorted(dcols)
    assert canon(sdf.columns, srows) == canon(dcols, drows)


def test_substring_dedup_finds_maximal_shared_spans(spark, tmp_path):
    """b19_substring_dedup on a crafted corpus: two docs share one
    verbatim 9-token span (one maximal island of 5 consecutive
    5-grams) and a separate 5-token span; an unrelated doc shares
    nothing. Expected inventory computed by hand."""
    import iot_system_plc_data_to_influxdb_spark.plans as plans

    span9 = "alpha bravo charlie delta echo foxtrot golf hotel india"
    span5 = "one two three four five"
    rows = [
        (0, f"{span9} xq1 xq2 xq3 {span5} xq4", "en", "s0"),
        (1, f"yq1 yq2 {span9} yq3 yq4 yq5 {span5}", "en", "s0"),
        (2, "zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9 zq10", "en", "s0"),
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        (r["doc_a"], r["doc_b"]): (
            r["n_spans"], r["max_span_tok"], r["total_span_tok"]
        )
        for r in plans.all_queries()["b19_substring_dedup"](
            spark, str(tmp_path)
        ).collect()
    }
    # one pair, two maximal spans: 9 tokens and 5 tokens
    assert got == {(0, 1): (2, 9, 14)}


def test_kcore_matches_pure_python_peel_to_convergence(spark):
    """b19_kcore vs an independent pure-Python peeling reference run to
    FIXPOINT (not a bounded round count): proves (a) the bounded
    R-round Spark peel has converged at this SF, (b) the surviving set
    is exactly the maximal K-core, and (c) the reported degrees are
    the induced-subgraph degrees."""
    import iot_system_plc_data_to_influxdb_spark.plans as plans
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        _KCORE_K,
        _KCORE_PRIMES,
    )

    got = {
        r["doc_id"]: r["core_deg"]
        for r in plans.all_queries()["b19_kcore"](spark, SF_DIR).collect()
    }

    n = t(spark, SF_DIR, "documents").count()
    edges = set()
    for i in range(n):
        for j, p in enumerate(_KCORE_PRIMES, start=1):
            if i % 7 >= j:
                dst = (i * p + j) % n
                if dst != i:
                    edges.add((min(i, dst), max(i, dst)))
    alive = {v for uv in edges for v in uv}
    while True:
        deg: dict = {}
        for u, v in edges:
            if u in alive and v in alive:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
        nxt = {x for x, dg in deg.items() if dg >= _KCORE_K}
        if nxt == alive:
            break
        alive = nxt
    expect = {x: deg[x] for x in alive}
    assert got == expect
    assert all(dg >= _KCORE_K for dg in got.values())


def test_jl_projection_preserves_distance_geometry(spark):
    """b20_jl_projection: the JL statistical property itself (not the
    oracle twin) — for d=16 ±1 projections the d2_proj/(16*d2_orig)
    ratio concentrates near 1, so most sampled pairs land in the
    [0.5, 1.5] band and the mean ratio is close to 1. Also pins the
    exact-arithmetic invariants: d2_proj is a multiple of nothing
    fancy — it's a plain integer, and in_band agrees with the two
    integer comparisons it abbreviates."""
    import iot_system_plc_data_to_influxdb_spark.plans as plans

    rows = plans.all_queries()["b20_jl_projection"](spark, SF_DIR).collect()
    assert len(rows) > 50
    n_band = sum(1 for r in rows if r["in_band"])
    assert n_band / len(rows) >= 0.7
    ratios = [
        float(r["d2_proj"]) / (16.0 * r["d2_orig"])
        for r in rows
        if r["d2_orig"] > 0
    ]
    mean = sum(ratios) / len(ratios)
    assert 0.8 <= mean <= 1.3
    for r in rows[:20]:
        lo = 8 * int(r["d2_orig"]) <= int(r["d2_proj"])
        hi = int(r["d2_proj"]) <= 24 * int(r["d2_orig"])
        assert r["in_band"] == (lo and hi)


def test_xcorr_detects_planted_lag(spark, tmp_path):
    """b23_xcorr on a crafted two-series corpus: series 'bb' is series
    'aa' shifted forward by exactly 2 hours, so for the ordered pair
    (aa, bb) the lag-2 score must strictly dominate every other lag
    (a positive spiky pattern aligns perfectly only at its true
    shift)."""
    import datetime

    import iot_system_plc_data_to_influxdb_spark.plans as plans

    t0 = datetime.datetime(2024, 1, 1, 0, 30)
    # spiky positive pattern — autocorrelation at nonzero shift is low
    pat = [9.0, 1.0, 1.0, 7.0, 1.0, 2.0, 1.0, 8.0, 1.0, 1.0, 5.0, 1.0,
           1.0, 1.0, 6.0, 1.0, 2.0, 1.0, 1.0, 9.0, 1.0, 1.0, 1.0, 4.0]
    rows = []
    for h, v in enumerate(pat):
        rows.append((2 * h, t0 + datetime.timedelta(hours=h), 0, "aa", v, "{}"))
        rows.append(
            (2 * h + 1, t0 + datetime.timedelta(hours=h + 2), 0, "bb", v, "{}")
        )
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = plans.all_queries()["b23_xcorr"](spark, str(tmp_path)).collect()
    scores = {r["lag"]: int(r["score"]) for r in out}
    assert set(scores) == set(range(7))
    best = max(scores, key=lambda L: (scores[L], -L))
    assert best == 2
    assert all(scores[2] > s for L, s in scores.items() if L != 2)


def test_perplexity_bits_matches_pure_python_and_bounds_surprisal(
    spark, tmp_path
):
    """b21_perplexity_bits vs an independent pure-Python replay on a
    crafted corpus, plus the analytic guarantee: the integer bit score
    is within 1 bit PER TERM of the real add-one-smoothed surprisal
    sum (bits(n) = floor(log2 n)+1 brackets log2 n)."""
    import math

    import iot_system_plc_data_to_influxdb_spark.plans as plans

    rows = [
        (0, "the cat sat on the mat", "en", "s0"),
        (1, "the cat ran", "en", "s0"),
        (2, "a dog sat on a log on a bog", "en", "s0"),
        (3, "single", "en", "s0"),  # < 2 tokens: no output row
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    toks = {i: txt.split() for i, txt, _l, _s in rows}
    vocab = {w for ws in toks.values() for w in ws}
    c2: dict = {}
    for ws in toks.values():
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    c1: dict = {}
    for (a, _b), c in c2.items():
        c1[a] = c1.get(a, 0) + c
    V = len(vocab)
    expect = {}
    for i, ws in toks.items():
        if len(ws) < 2:
            continue
        bits = sum(
            (c1[a] + V).bit_length() - (c2[(a, b)] + 1).bit_length()
            for a, b in zip(ws, ws[1:])
        )
        expect[i] = (len(ws) - 1, bits)

    got = {
        r["doc_id"]: (r["n_bigrams"], r["total_bits"])
        for r in plans.all_queries()["b21_perplexity_bits"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == expect

    # the 1-bit-per-term bracket vs the real smoothed surprisal
    for i, ws in toks.items():
        if len(ws) < 2:
            continue
        real = sum(
            math.log2(c1[a] + V) - math.log2(c2[(a, b)] + 1)
            for a, b in zip(ws, ws[1:])
        )
        n_terms = len(ws) - 1
        assert abs(got[i][1] - real) <= 2 * n_terms


def test_label_propagation_matches_pure_python_sync_lpa(spark):
    """b19_label_propagation vs an independent pure-Python synchronous
    LPA run to the same R=4 horizon with the same (count desc, label
    asc) tie-break — label-for-label equality, plus community_size
    consistency with the labeling itself."""
    from collections import Counter, defaultdict

    import iot_system_plc_data_to_influxdb_spark.plans as plans
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        _KCORE_PRIMES,
        _LPA_ROUNDS,
    )

    rows = plans.all_queries()["b19_label_propagation"](
        spark, SF_DIR
    ).collect()
    got = {r["doc_id"]: r["label"] for r in rows}

    n = t(spark, SF_DIR, "documents").count()
    nbr = defaultdict(set)
    for i in range(n):
        for j, p in enumerate(_KCORE_PRIMES, start=1):
            if i % 7 >= j:
                dst = (i * p + j) % n
                if dst != i:
                    nbr[i].add(dst)
                    nbr[dst].add(i)
    lab = {x: x for x in nbr}
    for _ in range(_LPA_ROUNDS):
        nxt = {}
        for x, ys in nbr.items():
            cnt = Counter(lab[y] for y in ys)
            best = min(cnt, key=lambda L: (-cnt[L], L))
            nxt[x] = best
        lab = nxt
    assert got == lab

    sizes = Counter(lab.values())
    for r in rows:
        assert r["community_size"] == sizes[r["label"]]


def test_radius_search_prunes_clustered_cells_and_matches_brute_force(
    spark,
):
    """_radius_search on a planted 3-cluster corpus: the squared
    triangle-inequality bound must PRUNE every cell whose cluster is
    far from the probe (the pruning-power the uniform sf corpus can't
    show), while the hit set still equals a pure-Python brute-force
    scan — pruning is sound AND effective on clustered data."""
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        _radius_search,
    )

    centers = {"A": (0.0, 0.0, 0.0, 0.0),
               "B": (10.0, 0.0, 0.0, 0.0),
               "C": (0.0, 10.0, 0.0, 0.0)}

    def jit(center, k):
        # deterministic small jitter, exactly representable at 7 dp
        return tuple(c + ((k * 13 + d * 7) % 5) * 0.01
                     for d, c in enumerate(center))

    rows = []
    # first 8 ids are the centroids: 0..2 in A (0 is the probe),
    # 3..5 in B, 6..7 in C
    for vid, cl in enumerate(["A", "A", "A", "B", "B", "B", "C", "C"]):
        rows.append((vid, list(jit(centers[cl], vid)), 0))
    vid = 8
    for cl, n in (("A", 20), ("B", 20), ("C", 20)):
        for k in range(n):
            rows.append((vid, list(jit(centers[cl], vid)), 0))
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )

    hits_df, kept_df = _radius_search(emb.select("vec_id", "embedding"))
    kept = {r["cell"] for r in kept_df.collect()}
    hits = {r["vec_id"]: float(r["d2"]) for r in hits_df.collect()}

    # far clusters' cells pruned, probe's cluster kept
    assert 0 in kept
    assert kept <= {0, 1, 2}

    # brute force in pure python (same 7-dp quantization)
    probe = [round(x, 7) for x in rows[0][1]]
    expect = {}
    for r_vid, vec, _l in rows[1:]:
        q = [round(x, 7) for x in vec]
        d2 = sum((a - b) ** 2 for a, b in zip(q, probe))
        if d2 <= 1.6:
            expect[r_vid] = d2
    assert set(hits) == set(expect)
    for v, d2 in hits.items():
        assert abs(d2 - expect[v]) < 1e-9


def test_vad_segments_geometry_and_threshold(spark):
    """operators/multimodal.vad_segments on a crafted waveform: two
    loud bursts separated by true silence, a quiet (sub-threshold but
    nonzero) hiss burst that must NOT open a segment, and a partial
    final frame that must still close the last segment correctly."""
    import numpy as np

    from iot_system_plc_data_to_influxdb_spark.operators.multimodal import (
        encode_wav,
        vad_segments,
    )

    frame = 16
    loud = np.full(frame, 400, dtype=np.int16)     # energy 2.56M
    hiss = np.full(frame, 20, dtype=np.int16)      # energy 6400 < 100k
    silence = np.zeros(frame, dtype=np.int16)
    # frames: loud loud | silence | hiss | silence | loud(partial 8)
    samples = np.concatenate(
        [loud, loud, silence, hiss, silence, np.full(8, 500, dtype=np.int16)]
    )
    payload = encode_wav(samples, 8000)
    df = spark.createDataFrame(
        [(0, bytearray(payload))], "doc_id bigint, payload binary"
    )
    rows = sorted(
        vad_segments(df).collect(), key=lambda r: r["seg_idx"]
    )
    assert [
        (r["seg_idx"], r["start_frame"], r["end_frame"], r["n_frames"])
        for r in rows
    ] == [(0, 0, 1, 2), (1, 5, 5, 1)]
    assert rows[0]["energy_sum"] == 2 * 16 * 400 * 400
    assert rows[0]["peak_energy"] == 16 * 400 * 400
    assert rows[1]["energy_sum"] == 8 * 500 * 500  # padded frame


def test_rake_keywords_degree_frequency_semantics(spark, tmp_path):
    """b21_rake_keywords on a hand-computed document: stopwords split
    candidates, word score = round(100·degree/frequency), phrase score
    sums its words — 'deep neural network' must outrank 'deep
    learning' because its words carry higher collocation degree."""
    import iot_system_plc_data_to_influxdb_spark.plans as plans

    text = "deep learning of the deep neural network and the network"
    spark.createDataFrame(
        [(0, text, "en", "s0")],
        "doc_id bigint, text string, lang string, source string",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    rows = sorted(
        plans.all_queries()["b21_rake_keywords"](
            spark, str(tmp_path)
        ).collect(),
        key=lambda r: r["rank"],
    )
    # deep: freq 2, deg 5 -> 250 | learning: 1,2 -> 200
    # neural: 1,3 -> 300 | network: 2,4 -> 200
    assert [(r["phrase"], r["score"], r["rank"]) for r in rows] == [
        ("deep neural network", 750, 1),
        ("deep learning", 450, 2),
        ("network", 200, 3),
    ]


def test_mmr_rerank_diversifies_near_duplicate_results(spark, tmp_path):
    """b20_mmr_rerank on a planted pool: two near-duplicates of the
    most relevant hit must be DEMOTED below genuinely diverse (if less
    relevant) items — plain relevance order would be [1,2,5,3,4];
    MMR must produce [1,3,4,2,5]."""
    import iot_system_plc_data_to_influxdb_spark.plans as plans

    vecs = [
        (0, [0.0, 0.0, 0.0, 0.0], 0),    # probe
        (1, [1.0, 0.0, 0.0, 0.0], 0),    # most relevant
        (2, [1.01, 0.0, 0.0, 0.0], 0),   # near-dup of 1
        (3, [0.0, 1.2, 0.0, 0.0], 0),    # diverse
        (4, [0.0, 0.0, 1.3, 0.0], 0),    # diverse
        (5, [1.02, 0.0, 0.0, 0.0], 0),   # near-dup of 1
    ]
    spark.createDataFrame(
        vecs, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    rows = sorted(
        plans.all_queries()["b20_mmr_rerank"](spark, str(tmp_path)).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["vec_id"] for r in rows] == [1, 3, 4, 2, 5]


def test_minhash_calibration_estimator_brackets_exact_jaccard(spark):
    """b19_minhash_calibration: on the sf corpus's candidate pairs the
    k=8 sketch estimate (matches/8) must track exact Jaccard — mean
    absolute calibration error under 2000 bp (k=8 has std ~J(1-J)/√8
    per pair; the MEAN over pairs concentrates much tighter), and the
    exact columns must be internally consistent (0 ≤ inter ≤ union,
    jac_bp = round(10000·inter/union))."""
    import iot_system_plc_data_to_influxdb_spark.plans as plans

    rows = plans.all_queries()["b19_minhash_calibration"](
        spark, SF_DIR
    ).collect()
    assert len(rows) >= 10
    errs = []
    for r in rows:
        assert 0 <= r["n_inter"] <= r["n_union"]
        num = 2 * r["n_inter"] * 10000 + r["n_union"]
        assert r["jac_bp"] == (num - num % (2 * r["n_union"])) // (
            2 * r["n_union"]
        )
        errs.append(abs(r["mh_matches"] * 1250 - r["jac_bp"]))
    assert sum(errs) / len(errs) < 2000


def test_cluster_margin_consistency(spark):
    """b20_cluster_margin invariants: margins are non-negative (own
    cluster IS the argmin), min <= max per cluster, member counts sum
    to the corpus, and the tightest vec really attains the cluster's
    min margin (re-derived independently from the score relation)."""
    import iot_system_plc_data_to_influxdb_spark.plans as plans
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        _exact_kmeans_assignments,
    )

    rows = plans.all_queries()["b20_cluster_margin"](spark, SF_DIR).collect()
    assert sum(r["n_members"] for r in rows) == 500
    for r in rows:
        assert 0.0 <= r["min_margin"] <= r["max_margin"]

    _v, a2, s2 = _exact_kmeans_assignments(spark, SF_DIR, K=8)
    scores = {}
    for x in s2.collect():
        scores.setdefault(x["vec_id"], {})[x["cluster"]] = x["r"]
    own = {x["vec_id"]: x["cluster"] for x in a2.collect()}
    for r in rows:
        v = r["tightest_vec"]
        c = own[v]
        assert c == r["cluster"]
        mine = scores[v][c]
        second = min(x for cl, x in scores[v].items() if cl != c)
        assert abs((second - mine) - r["min_margin"]) == 0.0


def test_ann_recall_audit_consistency(spark):
    """b20_ann_recall invariants: every probe row has exactly 10
    ground-truth neighbors, overlap within [0, 10], recall_bp =
    overlap*1000, and the probe panel is exactly the deterministic
    id sample."""
    import iot_system_plc_data_to_influxdb_spark.plans as plans

    rows = plans.all_queries()["b20_ann_recall"](spark, SF_DIR).collect()
    pids = sorted(r["pid"] for r in rows)
    assert pids == [i for i in range(500) if i % 111 == 0]
    for r in rows:
        assert r["n_truth"] == 10
        assert 0 <= r["n_overlap"] <= 10
        assert r["recall_bp"] == r["n_overlap"] * 1000


def test_triplet_mining_semantics(spark):
    """b20_triplet_mining invariants: one triplet per panel anchor,
    positive is strictly more similar than the negative, the negative
    respects the 0.5 ceiling, and neither equals the anchor."""
    import iot_system_plc_data_to_influxdb_spark.plans as plans

    rows = plans.all_queries()["b20_triplet_mining"](spark, SF_DIR).collect()
    anchors = sorted(r["anchor"] for r in rows)
    assert anchors == [i for i in range(500) if i % 37 == 0]
    for r in rows:
        assert r["pos_id"] != r["anchor"] and r["neg_id"] != r["anchor"]
        assert r["pos_id"] != r["neg_id"]
        assert r["neg_cos"] <= 0.5
        assert r["pos_cos"] >= r["neg_cos"]


def test_range_boundaries_balance_and_contiguity(spark):
    """b18_range_boundaries invariants: counts differ by at most 1
    (the NTILE guarantee Spark's sampling RangePartitioner cannot
    give), partitions tile the corpus, and key ranges are contiguous
    and non-overlapping in (n_chars, doc_id) order."""
    import iot_system_plc_data_to_influxdb_spark.plans as plans

    rows = sorted(
        plans.all_queries()["b18_range_boundaries"](
            spark, SF_DIR
        ).collect(),
        key=lambda r: r["part_id"],
    )
    assert [r["part_id"] for r in rows] == list(range(1, 9))
    counts = [r["n_docs"] for r in rows]
    assert sum(counts) == 500
    assert max(counts) - min(counts) <= 1
    for a, b in zip(rows, rows[1:]):
        # ranges ordered; equal keys may straddle a boundary but then
        # the doc-id tie-break keeps (key, id) order
        assert a["hi_chars"] <= b["lo_chars"] or (
            a["hi_chars"] == b["lo_chars"]
        )


def test_pipeline_training_e2e_funnel_invariants(spark):
    """The composed curation funnel must be monotone per lang
    (raw >= gated >= unique), cover the whole corpus in n_raw, and
    report a consistent packing stage: bins exist iff survivors do,
    sum_tokens equals the survivors' token mass, and fill_bp matches
    the exact integer definition."""
    from iot_system_plc_data_to_influxdb_spark.catalog import t
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        _PACK_CAPACITY,
    )
    from iot_system_plc_data_to_influxdb_spark.plans.pipeline import (
        pipeline_training_e2e,
    )

    rows = pipeline_training_e2e(spark, SF_DIR).collect()
    assert rows
    total_raw = sum(r["n_raw"] for r in rows)
    assert total_raw == t(spark, SF_DIR, "documents").count()
    for r in rows:
        assert r["n_raw"] >= r["n_gated"] >= r["n_unique"] >= 0
        if r["n_unique"] == 0:
            assert r["n_bins"] == 0 and r["sum_tokens"] == 0
            assert r["fill_bp"] == 0
        else:
            assert r["n_bins"] >= 1
            assert r["sum_tokens"] > 0
            assert r["fill_bp"] == (
                r["sum_tokens"] * 10000
            ) // (_PACK_CAPACITY * r["n_bins"])


def test_two_level_pack_is_append_stable(spark):
    """The 100-TB incremental property the fixed-width shard buys: in
    an append-only corpus (new doc_ids strictly above the old maximum),
    re-packing the grown corpus NEVER changes the bins of any shard the
    new docs don't touch — growth repacks at most the one boundary
    shard per lang plus the new shards, so a nightly pack job is
    incremental by construction (cost ∝ delta), never a full repack."""
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        _PACK_SHARD_SPAN,
        _packed_bins,
    )

    base = [(i, "en" if i % 2 == 0 else "de", 37 + (i * 13) % 100)
            for i in range(600)]
    delta = [(i, "en" if i % 2 == 0 else "de", 37 + (i * 13) % 100)
             for i in range(600, 900)]
    sch = "doc_id bigint, lang string, n_tokens bigint"
    packed_base = {
        (r["lang"], r["shard"], r["doc_id"]): r["bin_id"]
        for r in _packed_bins(spark.createDataFrame(base, sch)).collect()
    }
    packed_grown = {
        (r["lang"], r["shard"], r["doc_id"]): r["bin_id"]
        for r in _packed_bins(
            spark.createDataFrame(base + delta, sch)
        ).collect()
    }
    # the boundary shard (the one containing max base doc_id) is the
    # ONLY shard whose packing may see new rows; every other base
    # assignment must be byte-identical in the grown corpus
    boundary = max(d for d, _, _ in base) // _PACK_SHARD_SPAN
    for (lang, shard, doc_id), b in packed_base.items():
        if shard == boundary:
            continue
        assert packed_grown[(lang, shard, doc_id)] == b
    # and in fact next-fit is prefix-stable WITHIN the boundary shard
    # too (new docs sort after old ones), so the full base assignment
    # survives — assert the stronger property while documenting the
    # weaker guarantee above as the one the design promises
    for key, b in packed_base.items():
        assert packed_grown[key] == b


def test_rrf_recall_detects_correlated_legs(spark, tmp_path):
    """The sf-corpus b20_rrf_recall numbers (lex ~0.01, hybrid between
    the legs) are a property of THAT data — text and embeddings are
    generated independently. This planted corpus makes the two
    modalities agree (cluster-specific vocabulary AND cluster-aligned
    embeddings): the harness must then report the lexical leg jumping
    to ~perfect recall against semantic truth and fusion holding the
    vector leg's quality — i.e. the evaluation detects correlation,
    and the low production numbers are data, not harness."""
    import os

    clusters = ["alpha beta gamma", "delta epsilon zeta",
                "eta theta iota"]
    docs, embs = [], []
    for i in range(120):
        c = i % 3
        docs.append((i, "en", f"{clusters[c]} doc{i}"))
        vec = [0.0] * 8
        vec[c] = 1.0
        embs.append((i, vec))
    spark.createDataFrame(
        docs, "doc_id bigint, lang string, text string"
    ).write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    spark.createDataFrame(
        embs, "vec_id bigint, embedding array<float>"
    ).write.parquet(os.path.join(str(tmp_path), "embeddings.parquet"))

    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        b20_rrf_recall,
    )

    rows = b20_rrf_recall(spark, str(tmp_path)).collect()
    assert {r["pid"] for r in rows} == {0, 111}  # panel: % 111 of 120
    for r in rows:
        assert r["n_truth"] == 10
        # every system finds the cluster: lexical recall is ~perfect
        # once vocabulary correlates with the embedding space
        assert r["lex_overlap"] == 10
        assert r["ivf_overlap"] == 10
        assert r["hyb_overlap"] == 10
        assert r["lex_recall_bp"] == 10000
        assert r["hyb_recall_bp"] >= r["ivf_recall_bp"]


def test_rrf_recall_correlated_fusion_wins(spark):
    """b20_rrf_recall_correlated (round-11 verdict #4): on the
    text-DERIVED vector space (64-dim idf-smoothed hashed
    bag-of-words, so cosine truth IS weighted tf-profile similarity),
    with the twin's deliberately balanced legs (1-of-16-cell IVF
    pruning; query-tf BM25), RRF fusion must beat-or-match BOTH legs
    in aggregate recall@10 — the r11 work-note caveat ("the harness
    runs, but on uncorrelated data fusion lands between the legs")
    turned into a pinned measurement. Holds at sf0.001 and sf0.01
    here; sf0.1 measured in EVIDENCE.md (hyb .420 >= ivf .415 >=
    lex .207) and hash-pinned by the oracle sweep."""
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        b20_rrf_recall_correlated,
    )

    for sf_dir in (SF_DIR, "/root/testdata/sf0.01"):
        rows = b20_rrf_recall_correlated(spark, sf_dir).collect()
        assert rows
        lex = sum(r["lex_overlap"] for r in rows)
        ivf = sum(r["ivf_overlap"] for r in rows)
        hyb = sum(r["hyb_overlap"] for r in rows)
        assert hyb >= max(lex, ivf), (sf_dir, lex, ivf, hyb)
        # and the legs genuinely differ (fusion had something to fuse)
        assert lex > 0 and ivf > 0


def test_pq_recall_rerank_recovers_compression_loss(spark):
    """b20_pq_recall (round-12): the measured quality story behind
    shipping the two-stage IVF-PQ serve — raw ADC recall@10 pays for
    the ~64× code compression, the exact rerank of the ADC top-50
    recovers most of it, and both sit under the IVF full-precision
    ceiling (same coarse pruning). Aggregate ordering pinned at two
    SFs: rerank >= adc, ivf >= rerank, and rerank recovers a strict
    improvement (the shortlist genuinely helps)."""
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        b20_ann_recall,
        b20_pq_recall,
    )

    for sf_dir in (SF_DIR, "/root/testdata/sf0.01"):
        rows = b20_pq_recall(spark, sf_dir).collect()
        assert rows
        adc = sum(r["adc_recall_bp"] for r in rows)
        rr = sum(r["rerank_recall_bp"] for r in rows)
        ivf = sum(
            r["recall_bp"] for r in b20_ann_recall(spark, sf_dir).collect()
        )
        assert rr > adc, (sf_dir, adc, rr)  # strict: rerank earns its keep
        assert ivf >= rr, (sf_dir, rr, ivf)


def test_pack_fold_seed_is_positional(spark):
    """r11 ADVICE: the pack fold's new-bin test is POSITIONAL (first
    row of a stream always seeds bin 0; every later row uses the pure
    fill test), matching the recursive-CTE oracle's rn>=2 semantics.
    A zero-token head row followed by an oversize doc must open bin 1
    for the oversize doc — the old `if fill and ...` guard kept it in
    bin 0 and would have diverged from the shared hash if any future
    caller produced zero-token rows."""
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        _PACK_CAPACITY,
        _packed_bins,
    )

    d = spark.createDataFrame(
        [(0, "en", 0), (1, "en", _PACK_CAPACITY + 1), (2, "en", 1)],
        "doc_id bigint, lang string, n_tokens bigint",
    )
    got = {
        int(r["doc_id"]): int(r["bin_id"])
        for r in _packed_bins(d).collect()
    }
    # doc 0 seeds bin 0; the oversize doc 1 fails the pure fill test
    # (0 + cap+1 > cap) and opens bin 1; doc 2 fails it again
    # (cap+1 + 1 > cap) and opens bin 2
    assert got == {0: 0, 1: 1, 2: 2}
