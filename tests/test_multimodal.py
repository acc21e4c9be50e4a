"""Real-pixel multimodal decode (operators/multimodal): pure-Python
24bpp BMP and P6 PPM codecs produce actual pixel features
(width/height/mean luminance, canonical-RGB content hash) through the
same mapInPandas plumbing the stubbed formats share, and BMP resize is
a genuine nearest-neighbor downsample, not truncation."""

from __future__ import annotations

import hashlib

import pytest

from kafka_stream_spark.operators.multimodal import (
    _halve_nn,
    decode_bmp,
    decode_ppm,
    encode_bmp,
    extract_features,
    resize_payloads,
)


def _gradient_rgb(w: int, h: int) -> bytes:
    """Deterministic w×h test image: R ramps with x, G with y, B fixed."""
    out = bytearray()
    for y in range(h):
        for x in range(w):
            out += bytes(((x * 255) // max(1, w - 1), (y * 255) // max(1, h - 1), 40))
    return bytes(out)


def _ppm_bytes(w: int, h: int, rgb: bytes) -> bytes:
    return b"P6\n# test comment\n%d %d\n255\n" % (w, h) + rgb


def test_bmp_round_trip_with_row_padding():
    # width 3 → 9-byte rows padded to 12: exercises stride handling
    rgb = _gradient_rgb(3, 2)
    w, h, got = decode_bmp(encode_bmp(3, 2, rgb))
    assert (w, h, got) == (3, 2, rgb)


def test_bmp_and_ppm_same_pixels_same_hash():
    rgb = _gradient_rgb(4, 4)
    bw, bh, brgb = decode_bmp(encode_bmp(4, 4, rgb))
    pw, ph, prgb = decode_ppm(_ppm_bytes(4, 4, rgb))
    assert (bw, bh) == (pw, ph) == (4, 4)
    assert hashlib.md5(brgb).hexdigest() == hashlib.md5(prgb).hexdigest()


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_bmp(b"not a bmp")
    bad_bpp = bytearray(encode_bmp(2, 2, _gradient_rgb(2, 2)))
    bad_bpp[28] = 8  # claim 8bpp
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(bad_bpp))


def test_halve_nn_picks_top_left_samples():
    rgb = _gradient_rgb(4, 4)
    nw, nh, small = _halve_nn(4, 4, rgb)
    assert (nw, nh) == (2, 2)
    # (0,0) sample of output = (0,0) of input; (1,0) = input (2,0)
    assert small[0:3] == rgb[0:3]
    assert small[3:6] == rgb[6:9]


def test_extract_features_decodes_real_pixels(spark):
    rgb = _gradient_rgb(4, 4)
    payloads = [
        (1, encode_bmp(4, 4, rgb), {"mime": "image/bmp"}),
        (2, _ppm_bytes(4, 4, rgb), {"mime": "image/x-portable-pixmap"}),
        (3, b"plain text payload", {"mime": "text/plain"}),
    ]
    df = spark.createDataFrame(
        payloads, "doc_id LONG, payload BINARY, meta MAP<STRING,STRING>"
    )
    rows = {r["doc_id"]: r for r in extract_features(df).collect()}
    bmp, ppm, txt = rows[1], rows[2], rows[3]
    assert bmp["decoder"] == "bmp-rgb24-v1" and ppm["decoder"] == "ppm-p6-v1"
    assert (bmp["width"], bmp["height"]) == (4, 4) == (ppm["width"], ppm["height"])
    # same pixels → same canonical hash regardless of container format
    assert bmp["content_hash"] == ppm["content_hash"]
    assert bmp["mean_lum"] == ppm["mean_lum"]
    # hand-computed Rec.601 mean luminance of the gradient
    n = 16
    lum = (
        0.299 * sum(rgb[0::3]) + 0.587 * sum(rgb[1::3]) + 0.114 * sum(rgb[2::3])
    ) / n
    assert bmp["mean_lum"] == round(lum, 6)
    # non-image payloads keep the byte-level fallback with NULL pixel cols
    assert txt["decoder"] == "stub-decoder-v0"
    assert txt["width"] is None and txt["mean_lum"] is None


def test_resize_really_downsamples_bmp(spark):
    big = encode_bmp(16, 16, _gradient_rgb(16, 16))
    df = spark.createDataFrame(
        [(1, big), (2, b"x" * 500)], "doc_id LONG, payload BINARY"
    )
    rows = {r["doc_id"]: r for r in resize_payloads(df, target_bytes=200).collect()}
    out = rows[1]
    assert out["resizer"] == "bmp-nn-halve-v1"
    assert out["n_bytes"] <= 200
    # the resized payload is itself a valid, smaller BMP
    w, h, rgb = decode_bmp(bytes(out["payload"]))
    assert w < 16 and h < 16 and len(rgb) == w * h * 3
    # non-image path keeps the documented truncation fallback
    assert rows[2]["resizer"] == "stub-truncate-v0" and rows[2]["n_bytes"] == 200


def test_ahash_stable_across_containers_and_noise(spark):
    from kafka_stream_spark.operators.multimodal import ahash64, perceptual_hash

    rgb = _gradient_rgb(16, 16)
    # flip a couple of pixels slightly — perceptually the same image
    noisy = bytearray(rgb)
    noisy[0] = min(255, noisy[0] + 4)
    noisy[100] = max(0, noisy[100] - 4)
    inverted = bytes(255 - b for b in rgb)

    df = spark.createDataFrame(
        [
            (1, encode_bmp(16, 16, rgb)),
            (2, _ppm_bytes(16, 16, rgb)),
            (3, encode_bmp(16, 16, bytes(noisy))),
            (4, encode_bmp(16, 16, inverted)),
            (5, b"not an image"),
        ],
        "doc_id LONG, payload BINARY",
    )
    rows = {r["doc_id"]: r for r in perceptual_hash(df).collect()}
    # same pixels, different container → identical hash
    assert rows[1]["phash"] == rows[2]["phash"] == ahash64(16, 16, rgb)
    # tiny perturbation → small hamming distance
    ham = bin((rows[1]["phash"] ^ rows[3]["phash"]) & ((1 << 64) - 1)).count("1")
    assert ham <= 4
    # inverted image → far away
    ham_inv = bin((rows[1]["phash"] ^ rows[4]["phash"]) & ((1 << 64) - 1)).count("1")
    assert ham_inv >= 32
    # non-image rows carry a null hash, not an error
    assert rows[5]["phash"] is None


def test_wav_roundtrip_and_features(spark):
    import math

    from kafka_stream_spark.operators.multimodal import (
        audio_features,
        decode_wav,
        encode_wav,
    )

    # 440 Hz sine, 0.1s at 8 kHz, amplitude 0.5
    sine = [
        int(16384 * math.sin(2 * math.pi * 440 * t / 8000))
        for t in range(800)
    ]
    wav = encode_wav(sine, sample_rate=8000)
    rate, ch, samples = decode_wav(wav)
    assert (rate, ch) == (8000, 1)
    assert samples == sine

    rows = spark.createDataFrame(
        [(1, bytearray(wav), {"mime": "audio/wav"}),
         (2, bytearray(b"not a wav"), {"mime": "audio/wav"})],
        "doc_id long, payload binary, meta map<string,string>",
    )
    out = {r.doc_id: r for r in audio_features(rows).collect()}
    good = out[1]
    assert good.sample_rate == 8000 and good.n_channels == 1
    assert good.n_samples == 800 and good.duration_ms == 100
    # RMS of a 0.5-amplitude sine ~ 0.5/sqrt(2)
    assert abs(good.rms - 0.5 / math.sqrt(2)) < 0.01
    assert abs(good.peak - 0.5) < 0.01
    # a 440 Hz tone at 8 kHz crosses zero ~2*440 times/sec -> zcr ~ 0.11
    assert abs(good.zcr - 2 * 440 / 8000) < 0.005
    bad = out[2]
    assert bad.sample_rate is None and bad.decoder.startswith("undecodable:")


def test_wav_parser_skips_extra_chunks(spark):
    import struct as st

    from kafka_stream_spark.operators.multimodal import decode_wav, encode_wav

    wav = encode_wav([100, -100, 200], sample_rate=4000)
    # splice a LIST chunk between fmt and data like real writers do
    fmt_end = 12 + 8 + 16
    extra = st.pack("<4sI", b"LIST", 4) + b"INFO"
    spliced = wav[:fmt_end] + extra + wav[fmt_end:]
    rate, ch, samples = decode_wav(spliced)
    assert rate == 4000 and samples == [100, -100, 200]


# ---------------------------------------------------------------------------
# AVI (video) codec — real frames through the RIFF walker
# ---------------------------------------------------------------------------


def test_avi_roundtrip_real_frames():
    from kafka_stream_spark.operators.multimodal import (
        decode_avi_frames,
        encode_avi,
    )

    frames = [_gradient_rgb(6, 4), _gradient_rgb(6, 4)[::-1], b"\x10" * 72]
    payload = encode_avi(6, 4, frames, fps=25)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    w, h, out = decode_avi_frames(payload)
    assert (w, h) == (6, 4)
    assert out == frames  # every frame survives the container bit-for-bit


def test_avi_rejects_compressed_and_non_avi():
    import struct

    import pytest as _pytest

    from kafka_stream_spark.operators.multimodal import (
        decode_avi_frames,
        encode_avi,
    )

    with _pytest.raises(ValueError):
        decode_avi_frames(b"RIFF\x04\x00\x00\x00WAVE")
    # flip biCompression in the strf header → NotImplementedError
    payload = bytearray(encode_avi(4, 4, [b"\x00" * 48]))
    strf = payload.index(b"strf")
    struct.pack_into("<I", payload, strf + 8 + 16, 1)  # biCompression=1
    with _pytest.raises(NotImplementedError):
        decode_avi_frames(bytes(payload))


def test_video_frames_samples_and_hashes(spark):
    from kafka_stream_spark.operators.multimodal import (
        ahash64,
        encode_avi,
        video_frames,
    )

    rgb0, rgb1, rgb2 = (_gradient_rgb(8, 8) for _ in range(3))
    payload = encode_avi(8, 8, [rgb0, rgb1, rgb2])
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"not a video"))],
        "doc_id long, payload binary",
    )
    rows = {
        (r.doc_id, r.frame_idx): r
        for r in video_frames(df, every_n=2).collect()
    }
    assert set(rows) == {(1, 0), (1, 2), (2, None)}
    assert rows[(1, 0)].phash == ahash64(8, 8, rgb0)
    assert rows[(1, 0)].decoder == "avi-dib24-v1"
    assert rows[(2, None)].decoder.startswith("undecodable:")


# ---------------------------------------------------------------------------
# baseline JPEG codec (round 5, X483)
# ---------------------------------------------------------------------------


def _np():
    import numpy as np

    return np


def test_jpeg_constant_blocks_round_trip_exactly():
    """The q_jpeg_pipeline exactness contract: constant-8x8-block
    images at quality=100 survive the full encode->decode path
    bit-for-bit (only DC coefficients exist and they are integers)."""
    np = _np()
    from kafka_stream_spark.operators.jpeg import decode_jpeg, encode_jpeg

    vals = np.random.RandomState(11).randint(0, 256, size=(8, 8))
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
    rgb = np.repeat(img[:, :, None], 3, axis=2).tobytes()
    for sub in ("4:2:0", "4:4:4"):
        payload = encode_jpeg(64, 64, rgb, quality=100, subsampling=sub)
        assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
        w, h, out = decode_jpeg(payload)
        assert (w, h) == (64, 64)
        assert out == rgb, f"lossy round trip under {sub}"


def test_jpeg_q100_error_bound_and_odd_dims():
    """Arbitrary content at quality=100/4:4:4 round-trips within the
    +/-2-level float-DCT rounding bound, including non-MCU-multiple
    dimensions (edge-replication padding + crop)."""
    np = _np()
    from kafka_stream_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(5)
    for w, h in ((40, 24), (13, 9), (8, 8), (17, 32)):
        img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        payload = encode_jpeg(w, h, img.tobytes(), quality=100,
                              subsampling="4:4:4")
        dw, dh, out = decode_jpeg(payload)
        assert (dw, dh) == (w, h)
        got = np.frombuffer(out, dtype=np.uint8).reshape(h, w, 3).astype(int)
        assert np.abs(got - img.astype(int)).max() <= 2


def test_jpeg_lossy_quality_compresses_smooth_content():
    """Real quantization path: a smooth image at q=75/4:2:0 must
    reconstruct above 30 dB PSNR while compressing well below raw
    size — i.e. the huffman/quantizer actually code AC structure."""
    np = _np()
    from kafka_stream_spark.operators.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:48, 0:64]
    img = np.clip(
        np.stack(
            [
                128 + 100 * np.sin(xx / 10),
                128 + 100 * np.cos(yy / 12),
                128 + 80 * np.sin((xx + yy) / 15),
            ],
            axis=2,
        ),
        0,
        255,
    ).astype(np.uint8)
    payload = encode_jpeg(64, 48, img.tobytes(), quality=75,
                          subsampling="4:2:0")
    assert len(payload) < 64 * 48 * 3 // 6
    _, _, out = decode_jpeg(payload)
    got = np.frombuffer(out, dtype=np.uint8).reshape(48, 64, 3).astype(float)
    mse = ((got - img.astype(float)) ** 2).mean()
    assert 10 * np.log10(255.0**2 / mse) > 30.0


def test_jpeg_boundary_and_integration():
    """Progressive JPEG raises the documented NotImplementedError;
    perceptual_hash and _decode_image route JPEG magic through the
    real decoder."""
    np = _np()
    import pytest as _pytest

    from kafka_stream_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from kafka_stream_spark.operators.multimodal import (
        _decode_image,
        ahash64,
    )

    vals = np.random.RandomState(3).randint(0, 256, size=(8, 8))
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
    rgb = np.repeat(img[:, :, None], 3, axis=2).tobytes()
    payload = bytearray(encode_jpeg(64, 64, rgb, quality=100))
    feats = _decode_image(bytes(payload))
    assert feats["decoder"] == "jpeg-baseline-v1"
    assert feats["width"] == 64 and feats["height"] == 64
    w, h, out = decode_jpeg(bytes(payload))
    assert ahash64(w, h, out) == ahash64(64, 64, rgb)
    # progressive (SOF2) decodes for real since round 5 — the boundary
    # is arithmetic coding: flip SOF0 (0xC0) to SOF10 (0xCA)
    sof = payload.index(b"\xff\xc0")
    payload[sof + 1] = 0xCA
    with _pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))


def test_jpeg_progressive_equals_baseline_and_exact():
    """Progressive (SOF2) decode must (a) round-trip constant-block
    images exactly at q=100, (b) reconstruct BIT-IDENTICALLY to the
    baseline decode of the same quantized coefficients at lossy
    quality — the strongest cross-path equivalence — and (c) handle
    non-MCU-multiple dims where padding block columns are coded in the
    interleaved DC scan but not in non-interleaved AC scans."""
    np = _np()
    import pytest as _pytest

    from kafka_stream_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(7)
    vals = rng.randint(0, 256, size=(8, 8))
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
    rgb = np.repeat(img[:, :, None], 3, axis=2).tobytes()
    p = encode_jpeg_progressive(64, 64, rgb, quality=100)
    assert p[:2] == b"\xff\xd8" and b"\xff\xc2" in p
    assert decode_jpeg(p)[2] == rgb

    yy, xx = np.mgrid[0:48, 0:64]
    sm = np.clip(
        np.stack(
            [128 + 100 * np.sin(xx / 10), 128 + 100 * np.cos(yy / 12),
             128 + 80 * np.sin((xx + yy) / 15)],
            axis=2,
        ), 0, 255,
    ).astype(np.uint8)
    for q, sub, wh in ((75, "4:2:0", (64, 48)), (100, "4:4:4", (64, 48))):
        pb = encode_jpeg(wh[0], wh[1], sm.tobytes(), quality=q,
                         subsampling=sub)
        for sa in (False, True):
            pp = encode_jpeg_progressive(wh[0], wh[1], sm.tobytes(),
                                         quality=q, subsampling=sub,
                                         successive=sa)
            assert decode_jpeg(pp) == decode_jpeg(pb), (q, sub, sa)

    im = rng.randint(0, 256, size=(24, 40, 3)).astype(np.uint8)
    for q in (100, 85):
        pb = encode_jpeg(40, 24, im.tobytes(), quality=q,
                         subsampling="4:2:0")
        for sa in (False, True):
            pp = encode_jpeg_progressive(40, 24, im.tobytes(), quality=q,
                                         subsampling="4:2:0", successive=sa)
            assert decode_jpeg(pp) == decode_jpeg(pb), (q, sa)

    # the remaining boundary raises, not garbles: arithmetic-coded
    # progressive (SOF10, 0xCA) is NotImplementedError
    payload = bytearray(
        encode_jpeg_progressive(16, 16, bytes(16 * 16 * 3), quality=100)
    )
    sof = payload.index(b"\xff\xc2")
    payload[sof + 1] = 0xCA
    with _pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))


def test_mjpeg_avi_roundtrip_and_boundary():
    """Motion-JPEG AVI: constant-block frames at q=100 round-trip
    exactly through container walk + per-frame JPEG decode; lossy
    MJPEG reconstructs frame-identically to decoding each JPEG alone;
    inter-frame fourccs still raise."""
    np = _np()
    import struct as _struct

    import pytest as _pytest

    from kafka_stream_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from kafka_stream_spark.operators.multimodal import (
        decode_avi_frames,
        encode_avi_mjpeg,
    )

    rng = np.random.RandomState(5)
    frames = []
    for _ in range(3):
        vals = rng.randint(0, 256, size=(8, 8))
        img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
        frames.append(np.repeat(img[:, :, None], 3, axis=2).tobytes())
    payload = encode_avi_mjpeg(64, 64, frames, quality=100)
    w, h, out = decode_avi_frames(payload)
    assert (w, h) == (64, 64) and out == frames

    # lossy: MJPEG frame decode == standalone JPEG decode
    yy, xx = np.mgrid[0:16, 0:16]
    sm = np.clip(
        np.stack([128 + 90 * np.sin(xx / 3), 128 + 90 * np.cos(yy / 4),
                  xx * 8 % 256], axis=2), 0, 255,
    ).astype(np.uint8)
    pm = encode_avi_mjpeg(16, 16, [sm.tobytes()], quality=75)
    _w, _h, fs = decode_avi_frames(pm)
    assert fs[0] == decode_jpeg(
        encode_jpeg(16, 16, sm.tobytes(), quality=75)
    )[2]

    # inter-frame fourcc (H264) in strf.biCompression still raises
    bad = bytearray(pm)
    strf = bad.index(b"strf")
    _struct.pack_into("<I", bad, strf + 8 + 16, 0x34363248)  # 'H264'
    with _pytest.raises(NotImplementedError):
        decode_avi_frames(bytes(bad))


# ---------------------------------------------------------------------------
# X568 — GIF87a LZW codec
# ---------------------------------------------------------------------------


def _noise_rgb(w, h, ncolors):
    """Deterministic pseudo-random palette image (hash-free arithmetic)."""
    px = []
    for i in range(w * h):
        g = (i * 97 + (i * i) % 251) % ncolors
        px.append(bytes((g, (g * 3) % ncolors, (g * 7) % ncolors)))
    return b"".join(px)


def test_gif_roundtrip_small_and_kwkwk():
    from kafka_stream_spark.operators.gif import decode_gif, encode_gif

    # runs of identical pixels force the KwKwK decoder case
    rgb = (b"\x10\x10\x10" * 9 + b"\x80\x80\x80" * 7) * 4
    payload = encode_gif(8, 8, rgb)
    assert payload[:6] == b"GIF87a" and payload[-1:] == b"\x3b"
    w, h, back = decode_gif(payload)
    assert (w, h, back) == (8, 8, rgb)


def test_gif_roundtrip_width_growth_and_reset():
    from kafka_stream_spark.operators.gif import decode_gif, encode_gif

    # 128x64 @ 256 colors: dictionary passes every width step and the
    # 4096-entry reset at least once
    rgb = _noise_rgb(128, 64, 256)
    payload = encode_gif(128, 64, rgb)
    w, h, back = decode_gif(payload)
    assert (w, h) == (128, 64)
    assert back == rgb


def test_gif_truncation_raises_valueerror_everywhere():
    """Every prefix of a valid GIF (static, animated, interlace-capable
    decoder) must fail with the codec's documented ValueError — never
    IndexError/struct.error — same malformed-input contract as the
    round-5 jpeg.py hardening."""
    import pytest

    from kafka_stream_spark.operators.gif import (
        decode_gif,
        decode_gif_animation,
        decode_gif_frame,
        encode_gif,
        encode_gif_animation,
    )

    rgb = (b"\x10\x10\x10" * 9 + b"\x80\x80\x80" * 7) * 4
    static = encode_gif(8, 8, rgb)
    frames = [rgb, rgb[3:] + rgb[:3]]
    anim = encode_gif_animation(8, 8, frames)
    for payload, fn in (
        (static, decode_gif),
        (static, decode_gif_frame),
        (anim, decode_gif_animation),
    ):
        for cut in range(4, len(payload) - 1):
            try:
                fn(payload[:cut])
            except (ValueError, NotImplementedError):
                pass  # the documented malformed-input contract
            # a prefix that still parses is a structurally complete
            # earlier frame (e.g. animation cut after frame 1) — fine;
            # what must NEVER escape is IndexError / struct.error
    with pytest.raises(ValueError):
        decode_gif_animation(anim[:40])


def test_gif_compresses_flat_images():
    from kafka_stream_spark.operators.gif import encode_gif

    flat = b"\x40\x40\x40" * (64 * 64)
    payload = encode_gif(64, 64, flat)
    # real LZW: a flat 12 KiB image must land far under raw size
    assert len(payload) < 600


def test_perceptual_hash_decodes_gif(spark):
    from kafka_stream_spark.operators.gif import encode_gif
    from kafka_stream_spark.operators.multimodal import (
        ahash64,
        perceptual_hash,
    )

    rgb = bytes(
        b for i in range(64) for b in ((i * 4) % 256,) * 3
    )
    payload = encode_gif(8, 8, rgb)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    row = perceptual_hash(df).collect()[0]
    assert row["decoder"] == "gif-lzw-v1"
    assert row["phash"] == ahash64(8, 8, rgb)


def test_gif_animation_delta_roundtrip_and_partial_transparency():
    """Delta-rect mode: composed frames round-trip exactly, including a
    rect where only SOME pixels changed (the unchanged ones must route
    through the transparent index) and a fully unchanged frame."""
    from kafka_stream_spark.operators.gif import (
        decode_gif_animation,
        encode_gif_animation,
    )

    w, h = 6, 5
    f0 = bytes((i % 7) * 30 for i in range(w * h * 3))
    f1 = bytearray(f0)
    # change two non-adjacent pixels -> bounding rect includes
    # unchanged pixels between them (transparency exercised)
    f1[0:3] = b"\xfa\xfa\xfa"
    f1[3 * (2 * w + 3) : 3 * (2 * w + 3) + 3] = b"\x05\x05\x05"
    f2 = bytes(f1)  # unchanged frame -> 1x1 transparent rect
    frames = [f0, bytes(f1), f2]
    payload = encode_gif_animation(w, h, frames)
    gw, gh, got = decode_gif_animation(payload)
    assert (gw, gh) == (w, h)
    assert got == frames
    # the delta encoding must be smaller than three full frames
    full = encode_gif_animation(w, h, frames, disposals=[1, 1, 1])
    assert len(payload) < len(full)


def test_gif_animation_disposal_semantics():
    """Disposal 2 (restore to background) and 3 (restore to previous)
    change what a following partial frame composites onto."""
    import struct

    from kafka_stream_spark.operators.gif import (
        decode_gif_animation,
        encode_gif_animation,
    )

    w, h = 4, 4
    a = bytes([10, 10, 10] * (w * h))
    b = bytes([20, 20, 20] * (w * h))
    # full frames with explicit disposals; then hand-append a partial
    # 2x2 frame at (1,1) so the canvas state after disposal shows
    payload = bytearray(
        encode_gif_animation(w, h, [a, b], disposals=[3, 0])
    )
    # disposal 3 on frame 0 means: after frame 0 is shown, canvas
    # reverts to the pre-frame canvas (background), so frame 1 paints
    # onto background — full frame, so composed frame 1 is still b
    gw, gh, got = decode_gif_animation(bytes(payload))
    assert got == [a, b]

    # disposal 2 demonstrated with a partial second frame: after frame
    # 0 (full, disposal 2) the canvas is restored to the BACKGROUND
    # color; the partial frame 1 paints only its rect, so everything
    # outside the rect shows background, not frame 0 pixels
    head = encode_gif_animation(w, h, [a], disposals=[2])
    body = bytearray(head[:-1])  # strip trailer
    # GCE: no transparency, disposal 0; then a 2x2 rect at (1,1) of
    # palette color 'a' (index of (10,10,10) in the union palette)
    body += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
    body += b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0)
    from kafka_stream_spark.operators.gif import _lzw_encode

    body.append(2)  # mcs matching the 1-color-palette header (k=0->mcs=2)
    data = _lzw_encode([0, 0, 0, 0], 2)
    body.append(len(data))
    body += data
    body += b"\x00\x3b"
    gw, gh, got = decode_gif_animation(bytes(body))
    assert got[0] == a
    # frame 1: background (black — GCT slot 0 is padded palette color?)
    # background index 0 = first palette color = (10,10,10)'s slot only
    # if it sorts first; compute expected from the decode itself:
    # everything outside the rect must be ONE uniform color, and the
    # rect must be (10,10,10)
    f1 = got[1]
    rect_px = {
        f1[3 * (y * w + x) : 3 * (y * w + x) + 3]
        for y in (1, 2)
        for x in (1, 2)
    }
    assert rect_px == {bytes([10, 10, 10])}
    outside = {
        f1[3 * (y * w + x) : 3 * (y * w + x) + 3]
        for y in range(h)
        for x in range(w)
        if not (1 <= y <= 2 and 1 <= x <= 2)
    }
    assert len(outside) == 1  # uniformly restored to background


def test_gif_animation_rejects_malformed():
    import pytest

    from kafka_stream_spark.operators.gif import (
        decode_gif_animation,
        encode_gif_animation,
    )

    with pytest.raises(ValueError):
        encode_gif_animation(2, 2, [])
    with pytest.raises(ValueError):
        encode_gif_animation(2, 2, [b"\x00" * 5])  # bad length
    good = encode_gif_animation(
        2, 2, [bytes([0, 0, 0] * 4), bytes([9, 9, 9] * 4)]
    )
    with pytest.raises(ValueError):
        decode_gif_animation(b"NOTGIF" + good[6:])
