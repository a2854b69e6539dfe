"""Real stdlib media kernels: WAV PCM + netpbm decode/resize, driven
through the same Arrow mapInPandas plumbing as the fake kernels.
"""

from __future__ import annotations

import io
import math
import struct
import wave

import numpy as np
import pytest

from ccgp_data_wrangling_spark.operators.media_codecs import (
    decode_netpbm,
    decode_wav,
    real_decode,
    resize_netpbm,
)
from ccgp_data_wrangling_spark.operators.multimodal import (
    extract_real_features,
    resize_images,
)


def _wav_bytes(freq=440.0, rate=8000, n=8000, amp=0.5, sampwidth=2):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(sampwidth)
        wf.setframerate(rate)
        samples = [
            int(amp * 32767 * math.sin(2 * math.pi * freq * i / rate))
            for i in range(n)
        ]
        wf.writeframes(struct.pack(f"<{n}h", *samples))
    return buf.getvalue()


def _ppm_bytes(w, h, rgb):
    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[:, :] = rgb
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def test_decode_wav_real_features():
    f = decode_wav(_wav_bytes())
    assert f["sample_rate"] == 8000
    assert f["n_channels"] == 1
    assert f["duration_sec"] == 1.0
    # a 0.5-amplitude sine has RMS ≈ 0.5/√2 and peak ≈ 0.5
    assert abs(f["rms"] - 0.5 / math.sqrt(2)) < 0.01
    assert abs(f["peak"] - 0.5) < 0.01


def test_decode_netpbm_and_comments():
    payload = b"P6\n# a comment\n2 3\n255\n" + bytes(
        [10, 20, 30] * 6
    )
    f = decode_netpbm(payload)
    assert (f["width"], f["height"], f["n_channels"]) == (2, 3, 3)
    assert f["channel_means"] == [10.0, 20.0, 30.0]
    # luma = .299*10 + .587*20 + .114*30
    assert abs(f["luma_mean"] - 18.15) < 1e-9


def test_decode_wav_24bit_pcm():
    """24-bit PCM: little-endian 3-byte two's complement, sign bit
    extended — a constant −0.25 full-scale signal has exact RMS/peak."""
    import io
    import wave

    val = -(1 << 21)  # −2^21 / 2^23 = −0.25 of full scale
    frame = int(val & 0xFFFFFF).to_bytes(3, "little")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(3)
        wf.setframerate(8000)
        wf.writeframes(frame * 800)
    f = decode_wav(buf.getvalue())
    assert f["n_samples"] == 800
    assert abs(f["rms"] - 0.25) < 1e-9
    assert abs(f["peak"] - 0.25) < 1e-9


def test_decode_netpbm_16bit_and_resize():
    """maxval > 255 switches to two-byte big-endian samples (netpbm
    raw spec); decode means are native 16-bit units and resize
    re-emits valid big-endian bytes."""
    import numpy as np

    px = np.array(
        [[[1000, 2000, 3000], [40000, 50000, 60000]]], dtype=">u2"
    )
    payload = b"P6\n2 1\n65535\n" + px.tobytes()
    f = decode_netpbm(payload)
    assert (f["width"], f["height"], f["n_channels"]) == (2, 1, 3)
    assert f["channel_means"] == [20500.0, 26000.0, 31500.0]
    out = resize_netpbm(payload, 4, 2)
    g = decode_netpbm(out)
    assert (g["width"], g["height"]) == (4, 2)
    assert g["channel_means"] == [20500.0, 26000.0, 31500.0]
    # 16-bit P5 grayscale
    gray = b"P5\n1 2\n65535\n" + np.array([[300], [700]], ">u2").tobytes()
    assert decode_netpbm(gray)["channel_means"] == [500.0]
    with pytest.raises(ValueError, match="invalid netpbm maxval"):
        decode_netpbm(b"P5\n1 1\n70000\n" + bytes(2))


def test_resize_netpbm_roundtrips():
    src = _ppm_bytes(4, 4, (100, 150, 200))
    out = resize_netpbm(src, 2, 8)
    f = decode_netpbm(out)
    assert (f["width"], f["height"]) == (2, 8)
    assert f["channel_means"] == [100.0, 150.0, 200.0]  # constant image


def test_real_decode_dispatch_and_honest_gate():
    assert real_decode(_wav_bytes(), "audio/wav")["kind"] == "audio"
    assert real_decode(_ppm_bytes(2, 2, (5, 5, 5)), "image/ppm")["kind"] == "image"
    # JPEG/PNG gained real stdlib decoders; MP4 remains an honest
    # NotImplementedError
    with pytest.raises(NotImplementedError, match="no stdlib decoder"):
        real_decode(b"\x00\x00\x00 ftypmp4", "video/mp4")


def test_extract_real_features_mixed_media(spark):
    rows = [
        (1, bytearray(_wav_bytes(n=4000)), "audio/wav"),
        (2, bytearray(_ppm_bytes(3, 2, (60, 120, 180))), "image/ppm"),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary, media_type string")
    got = {r.id: r for r in extract_real_features(df).collect()}
    assert got[1].kind == "audio"
    assert got[1].sample_rate == 8000
    assert got[1].duration_sec == 0.5
    assert got[1].width is None  # audio rows leave image columns null
    assert got[2].kind == "image"
    assert (got[2].width, got[2].height) == (3, 2)
    assert got[2].sample_rate is None
    assert abs(got[2].luma_mean - (0.299 * 60 + 0.587 * 120 + 0.114 * 180)) < 1e-6


def test_resize_images_netpbm_kernel(spark):
    rows = [(1, bytearray(_ppm_bytes(8, 8, (9, 9, 9))), "image/ppm")]
    df = spark.createDataFrame(rows, "id long, payload binary, media_type string")
    out = resize_images(df, 4, 2, kernel="netpbm").collect()[0]
    f = decode_netpbm(bytes(out.payload))
    assert (f["width"], f["height"]) == (4, 2)
    assert out.n_bytes_out == len(bytes(out.payload))


def _gif_px(h, w, levels=4, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    return (rng.integers(0, levels, (h, w, 3)) * (256 // levels)).astype(
        np.uint8
    )


def test_gif_roundtrip_plain_and_interlaced():
    import numpy as np

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_gif,
        encode_gif,
    )

    for (h, w), interlace in [((13, 17), False), ((32, 9), True)]:
        px = _gif_px(h, w)
        d = decode_gif(encode_gif(px, interlace=interlace))
        means = px.astype(np.float64).mean(axis=(0, 1))
        assert (d["width"], d["height"]) == (w, h)
        assert d["channel_means"] == [round(float(m), 4) for m in means]
        assert d["n_frames"] == 1


def test_gif_full_palette_and_lzw_clear_cycles():
    """A 2560-pixel 256-color image forces multiple CLEAR resets in
    the encoder and exercises every root code in the decoder."""
    import numpy as np

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_gif,
        encode_gif,
    )

    px = np.zeros((10, 256, 3), np.uint8)
    px[:, :, 0] = np.arange(256, dtype=np.uint8)
    d = decode_gif(encode_gif(px))
    assert d["channel_means"][0] == round(float(np.arange(256).mean()), 4)
    assert d["channel_means"][1] == 0.0


def test_gif_rejects_garbage():
    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import decode_gif

    with _pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + bytes(20))


def test_gif_through_real_decode_dispatch():
    from ccgp_data_wrangling_spark.operators.media_codecs import (
        encode_gif,
        real_decode,
    )

    d = real_decode(encode_gif(_gif_px(6, 6)), "image/gif")
    assert d["kind"] == "image" and d["n_channels"] == 3


def _flat_tiles(h, w, base=50, dy=8, dx=4):
    import numpy as np

    px = np.zeros((h, w), np.uint8)
    for ty in range(h // 8):
        for tx in range(w // 8):
            px[ty * 8 : (ty + 1) * 8, tx * 8 : (tx + 1) * 8] = base + dy * ty + dx * tx
    return px


def test_jpeg_flat_tiles_roundtrip_exact():
    """With the all-ones quant table, flat 8x8 tiles carry only a DC
    coefficient, which quantizes losslessly — decode is EXACT."""
    import numpy as np

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_jpeg,
        encode_jpeg,
    )

    px = _flat_tiles(24, 16)
    d = decode_jpeg(encode_jpeg(px))
    assert (d["width"], d["height"], d["n_channels"]) == (16, 24, 1)
    assert d["luma_mean"] == round(float(np.mean(px)), 4)


def test_jpeg_gradient_close_and_ac_path():
    """A noisy gradient exercises AC coefficients (runs, ZRL, EOB) —
    decode must agree with the source within DCT rounding noise."""
    import numpy as np

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(7)
    g = (
        np.linspace(0, 200, 32 * 24).reshape(24, 32)
        + rng.integers(0, 10, (24, 32))
    ).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(g))
    assert abs(d["luma_mean"] - float(g.mean())) < 0.5


def test_jpeg_color_444_420_and_restart():
    """RGB 4:4:4 and subsampled 4:2:0 with restart markers both decode;
    flat color is exact up to the YCbCr<->RGB double rounding (±1)."""
    import numpy as np

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_jpeg,
        encode_jpeg,
    )

    c = np.zeros((16, 16, 3), np.uint8)
    c[..., 0], c[..., 1], c[..., 2] = 100, 150, 200
    for kw in ({}, {"subsample": True, "restart_interval": 1}):
        d = decode_jpeg(encode_jpeg(c, **kw))
        assert d["n_channels"] == 3
        for got, want in zip(d["channel_means"], (100.0, 150.0, 200.0)):
            assert abs(got - want) <= 1.0


def test_jpeg_odd_dimensions_and_dispatch():
    import numpy as np

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        encode_jpeg,
        real_decode,
    )

    o = np.full((10, 13), 77, np.uint8)
    d = real_decode(encode_jpeg(o), "image/jpeg")
    assert (d["width"], d["height"]) == (13, 10)
    assert d["luma_mean"] == 77.0


def _smooth_image(rng, h, w, channels=0):
    """Block-upsampled random grid: smooth enough that quantized DCT
    amplitudes stay inside the fixture Huffman size categories."""
    import numpy as np

    if channels:
        coarse = rng.integers(40, 216, size=(-(-h // 8) + 1, -(-w // 8) + 1, channels))
        return np.stack(
            [np.kron(coarse[..., c], np.ones((8, 8)))[:h, :w] for c in range(channels)],
            axis=-1,
        ).astype(np.uint8)
    coarse = rng.integers(40, 216, size=(-(-h // 8) + 1, -(-w // 8) + 1))
    return np.kron(coarse, np.ones((8, 8)))[:h, :w].astype(np.uint8)


def test_jpeg_progressive_matches_baseline_exactly():
    """Progressive (SOF2) reorganizes the SAME quantized coefficients,
    so its decode must equal the baseline decode bit-for-bit — across
    spectral splits, successive-approximation depths, gray/RGB, and
    odd dimensions (EOB runs, ZRL-in-refinement, correction bits)."""
    import numpy as np

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _decode_jpeg_pixels,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(42)
    for h, w, ch in [(16, 24, 0), (19, 21, 0), (17, 9, 3), (30, 18, 3)]:
        img = _smooth_image(rng, h, w, ch)
        base = _decode_jpeg_pixels(encode_jpeg(img))
        prog = _decode_jpeg_pixels(encode_jpeg_progressive(img))
        assert np.array_equal(base, prog), (h, w, ch)

    g = (np.add.outer(np.arange(24) * 3, np.arange(40) * 2) % 200 + 20).astype(
        np.uint8
    )
    base = _decode_jpeg_pixels(encode_jpeg(g))
    for kw in (
        {"dc_al": 2, "ac_al": 3, "split": 1},
        {"dc_al": 1, "ac_al": 1, "split": 20},
        {"dc_al": 3, "ac_al": 4, "split": 35},
    ):
        assert np.array_equal(
            base, _decode_jpeg_pixels(encode_jpeg_progressive(g, **kw))
        ), kw


def test_jpeg_multiscan_sequential_and_fill_bytes():
    """T.81 allows one SOS per component in a sequential stream, and
    any number of 0xFF fill bytes before a marker — both appear in
    real crawled corpora and must decode identically to the
    single-scan interleaved stream."""
    import numpy as np

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _decode_jpeg_pixels,
        encode_jpeg,
    )

    rng = np.random.default_rng(3)
    img = _smooth_image(rng, 18, 26, 3)
    one_scan = _decode_jpeg_pixels(encode_jpeg(img))
    multi = _decode_jpeg_pixels(encode_jpeg(img, scan_per_component=True))
    assert np.array_equal(one_scan, multi)

    # inject fill bytes before SOF and EOI markers
    blob = bytearray(encode_jpeg(img))
    i = blob.find(b"\xff\xc0")
    blob[i:i] = b"\xff\xff"
    j = blob.rfind(b"\xff\xd9")
    blob[j:j] = b"\xff"
    assert np.array_equal(one_scan, _decode_jpeg_pixels(bytes(blob)))


def test_jpeg_honest_gates():
    import numpy as np
    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_jpeg,
        encode_jpeg,
    )

    with _pytest.raises(ValueError):
        decode_jpeg(b"NOTAJPEG" + bytes(20))
    # arithmetic coding (SOF9) raises NotImplementedError, not garbage
    good = bytearray(encode_jpeg(np.full((8, 8), 9, np.uint8)))
    i = good.find(b"\xff\xc0")
    good[i + 1] = 0xC9
    with _pytest.raises(NotImplementedError):
        decode_jpeg(bytes(good))
    # a baseline stream relabeled SOF2 is an INVALID progressive stream
    # (its single scan mixes the DC and AC bands) — clean ValueError
    bad = bytearray(encode_jpeg(np.full((8, 8), 9, np.uint8)))
    bad[bad.find(b"\xff\xc0") + 1] = 0xC2
    with _pytest.raises(ValueError):
        decode_jpeg(bytes(bad))


def test_png_roundtrip_exact_all_filters():
    """PNG is lossless and the fixture encoder cycles every filter
    type (row % 5): gray, RGB, RGBA, and palette-free paths must all
    reproduce the source pixels exactly."""
    import numpy as np

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(11)
    for shape in [(7, 5), (9, 4, 3), (6, 6, 4), (1, 1), (12, 3, 3)]:
        px = rng.integers(0, 256, shape).astype(np.uint8)
        d = decode_png(encode_png(px))
        want = px if px.ndim == 3 else px[..., None]
        exp = [
            round(float(m), 4)
            for m in want.astype(np.float64).mean(axis=(0, 1))
        ]
        assert d["channel_means"] == exp
        assert (d["width"], d["height"]) == (want.shape[1], want.shape[0])


def test_png_honest_gates():
    import numpy as np
    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_png,
        encode_png,
    )

    with _pytest.raises(ValueError):
        decode_png(b"NOTPNG" + bytes(20))
    good = bytearray(encode_png(np.full((4, 4), 3, np.uint8)))
    # mislabeling an 8-bit stream as 4-bit shrinks the expected
    # scanline budget — fails loudly, never silently reinterprets
    shallow = bytearray(good)
    shallow[8 + 8 + 8] = 4  # IHDR bit-depth byte
    with _pytest.raises(ValueError, match="length mismatch"):
        decode_png(bytes(shallow))
    # spec-invalid depth value
    bad_depth = bytearray(good)
    bad_depth[8 + 8 + 8] = 3
    with _pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(bad_depth))
    # sub-byte depths are grayscale/palette-only per RFC 2083 §4.1.1
    with _pytest.raises(ValueError, match="invalid for 3 channels"):
        encode_png(np.zeros((2, 2, 3), np.uint8), depth=4)
    rgb4 = bytearray(good)
    rgb4[8 + 8 + 8] = 4  # depth 4 ...
    rgb4[8 + 8 + 9] = 2  # ... on truecolor
    with _pytest.raises(ValueError, match="invalid for color type"):
        decode_png(bytes(rgb4))
    # a sequential stream mislabeled as Adam7 fails loudly, not garbage
    laced = bytearray(good)
    laced[8 + 8 + 12] = 1  # IHDR interlace byte
    with _pytest.raises(ValueError, match="length mismatch"):
        decode_png(bytes(laced))


def test_png_16bit_roundtrip_exact_all_filters_and_adam7():
    """Depth-16 PNG (big-endian sample pairs, filter byte-distance =
    bytes-per-pixel) round-trips EXACTLY through both codec
    directions, plain and interlaced, gray/RGB/RGBA, full 0..65535
    range."""
    import numpy as np

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(11)
    for shape in [(13, 7), (16, 16, 3), (3, 2, 4), (1, 9, 3)]:
        px = rng.integers(0, 65536, shape).astype(np.uint16)
        for il in (False, True):
            d = decode_png(encode_png(px, interlace=il))
            want = px if px.ndim == 3 else px[..., None]
            assert d["channel_means"] == [
                round(float(m), 4)
                for m in want.astype(np.float64).mean(axis=(0, 1))
            ], (shape, il)
            assert (d["width"], d["height"]) == (want.shape[1], want.shape[0])


def test_png_subbyte_roundtrip_exact_gray_and_palette():
    """Depths 1/2/4 (MSB-first packed scanlines, filter distance one
    byte, final byte zero-padded per RFC 2083 §2.3) round-trip
    EXACTLY: grayscale in native 0..2^d−1 units and palette indices
    expanded through PLTE — plain and Adam7, widths chosen so packed
    rows land on and off byte boundaries."""
    import numpy as np

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(23)
    for depth in (1, 2, 4):
        for h, w in [(1, 1), (3, 5), (7, 11), (16, 16), (5, 8)]:
            px = rng.integers(0, 1 << depth, (h, w), dtype=np.uint8)
            for il in (False, True):
                d = decode_png(encode_png(px, depth=depth, interlace=il))
                assert (d["width"], d["height"]) == (w, h), (depth, h, w)
                assert d["n_channels"] == 1
                assert d["channel_means"] == [
                    round(float(px.mean()), 4)
                ], (depth, h, w, il)
        # palette at the same depth: indices expand through PLTE
        n = 1 << depth
        pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, (9, 6), dtype=np.uint8)
        for il in (False, True):
            d = decode_png(
                encode_png(idx, depth=depth, palette=pal, interlace=il)
            )
            assert d["n_channels"] == 3
            assert d["channel_means"] == [
                round(float(m), 4)
                for m in pal[idx].astype(np.float64).mean(axis=(0, 1))
            ], (depth, il)
    # out-of-range samples are rejected at encode time, not wrapped
    import pytest as _pytest

    with _pytest.raises(ValueError, match="out of range"):
        encode_png(np.full((2, 2), 4, np.uint8), depth=2)


def test_png_adam7_interlace_roundtrip_exact():
    """Adam7: seven independently-filtered passes reassemble to the
    exact source — including dimensions smaller than the pass grid
    (empty passes) and non-multiple-of-8 sizes."""
    import numpy as np

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(5)
    for shape in [(16, 16, 3), (13, 7), (3, 2, 4), (1, 9), (8, 1, 3)]:
        px = rng.integers(0, 256, shape).astype(np.uint8)
        d = decode_png(encode_png(px, interlace=True))
        want = px if px.ndim == 3 else px[..., None]
        exp = [
            round(float(m), 4)
            for m in want.astype(np.float64).mean(axis=(0, 1))
        ]
        assert d["channel_means"] == exp
        assert (d["width"], d["height"]) == (want.shape[1], want.shape[0])


def test_png_through_real_decode_dispatch():
    import numpy as np

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        encode_png,
        real_decode,
    )

    d = real_decode(encode_png(np.full((3, 3, 3), 10, np.uint8)), "image/png")
    assert d["kind"] == "image" and d["n_channels"] == 3
    assert d["luma_mean"] == 10.0


def test_wav_spectral_features_square_wave_closed_forms():
    """Square wave with half-period m, c cycles: zero crossings are
    2c-1, the FFT dominant bin is the fundamental at sr/(2m), and
    |x| is constant so rms == peak == a/32768."""
    import numpy as np

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        wav_spectral_features,
    )

    def square_wav(a, half, cycles, sr=8000):
        pattern = np.concatenate([np.full(half, a), np.full(half, -a)])
        x = np.tile(pattern, cycles).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(sr)
            wf.writeframes(x.tobytes())
        return buf.getvalue()

    for a, half, cycles in [(5120, 2, 10), (10240, 3, 17), (2560, 11, 13)]:
        f = wav_spectral_features(square_wav(a, half, cycles))
        assert f["n_samples"] == 2 * half * cycles
        assert f["zero_crossings"] == 2 * cycles - 1
        assert f["dominant_freq_hz"] == round(8000 / (2 * half), 4)
        assert f["rms"] == f["peak"] == round(a / 32768.0, 6)

    # stereo: channels average; 8-bit raises honestly
    import pytest as _pytest

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(8000)
        wf.writeframes(bytes([200, 60] * 20))
    with _pytest.raises(NotImplementedError, match="16-bit"):
        wav_spectral_features(buf.getvalue())


def _phash_pattern(c, n=16):
    px_i, px_j = np.mgrid[0:n, 0:n]
    return (
        (c * 7 + px_i * 3 + px_j * 5 + (px_i * px_j * (c % 5)) // 3) % 256
    ).astype(np.uint8)


def test_phash_identity_distinctness_and_invariances():
    """pHash contract the image_phash_dedup oracle leans on: identical
    pixels → identical hash; the 30 fixed gate-query patterns hash
    pairwise DISTINCT (a kernel change colliding classes fails here
    before the driver gate); nearest upscaling is hash-invariant; a
    JPEG re-encode stays within a small Hamming radius (and is
    bit-identical for most patterns — that's the point of perceptual
    over byte hashing)."""
    from ccgp_data_wrangling_spark.operators.media_codecs import (
        encode_jpeg,
        phash64,
        phash_for_payload,
    )

    hashes = [phash64(_phash_pattern(c)) for c in range(30)]
    assert len(set(hashes)) == 30
    assert phash64(_phash_pattern(3)) == hashes[3]
    up = np.repeat(np.repeat(_phash_pattern(7), 2, 0), 2, 1)
    assert phash64(up) == hashes[7]

    exact = 0
    for c in range(30):
        hj = phash_for_payload(encode_jpeg(_phash_pattern(c)), "image/jpeg")
        d = bin(hj ^ hashes[c]).count("1")
        assert d <= 20
        exact += d == 0
    assert exact >= 25  # most classes survive re-encoding bit-identically

    # color input uses BT.601 luma. The weights sum to 1 only up to
    # one ulp, so a pure-gray RGB twin is a ~1e-16 uniform scaling of
    # its grayscale original — sign-stable for spectrum-rich patterns
    # (class 7 has the i·j term) but NOT for degenerate planes whose
    # coefficients are ±1e-14 noise; assert a tight Hamming bound, not
    # bit equality
    g = _phash_pattern(7)
    rgb = np.stack([g, g, g], axis=-1)
    assert bin(phash64(rgb) ^ hashes[7]).count("1") <= 4

    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="no pixel decoder"):
        phash_for_payload(b"GIF89a", "image/gif")


def test_hamming_neardup_pairs_on_real_phashes(spark):
    """The banding Hamming join finds exactly the brute-force pairs —
    fed with REAL pHash fingerprints of base patterns and 1/2-bit
    perturbed twins."""
    import itertools

    from ccgp_data_wrangling_spark.operators.dedup import (
        hamming_neardup_pairs,
    )
    from ccgp_data_wrangling_spark.operators.media_codecs import phash64

    rows = []
    for c in range(12):
        h = phash64(_phash_pattern(c))
        rows.append((c * 10, h))
        if c % 3 == 0:  # planted near-twins: 1 or 2 flipped bits
            rows.append((c * 10 + 1, h ^ (1 << (c % 60))))
            rows.append((c * 10 + 2, h ^ (1 << (c % 60)) ^ (1 << ((c + 9) % 60))))
    df = spark.createDataFrame(rows, "id long, ph long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_neardup_pairs(
            df, "id", "ph", max_hamming=3, n_bands=8, band_width=8
        ).collect()
    }
    want = {}
    for (ia, ha), (ib, hb) in itertools.combinations(rows, 2):
        d = bin(ha ^ hb).count("1")
        if d <= 3:
            want[(min(ia, ib), max(ia, ib))] = d
    assert got == want
    assert want  # planted twins guarantee non-empty ground truth

    import pytest as _pytest

    with _pytest.raises(ValueError, match="completeness"):
        hamming_neardup_pairs(
            df, "id", "ph", max_hamming=8, n_bands=8, band_width=8
        )
    with _pytest.raises(ValueError, match="both n_bands and band_width"):
        hamming_neardup_pairs(df, "id", "ph", max_hamming=3, n_bands=8)


def test_phash_neardup_gate_classes_well_separated():
    """image_phash_neardup_dedup's oracle needs its ten pattern
    classes pairwise >= 20 Hamming bits apart (twins drift <= 3 bits
    from their base, so components can only merge across classes if
    two classes come within 3+3 bits). A phash64 kernel change that
    collapses this margin must fail HERE before the driver gate."""
    import numpy as np

    from ccgp_data_wrangling_spark.operators.media_codecs import phash64
    from ccgp_data_wrangling_spark.queries.llm_scale import (
        _PHASH_ND_CLASSES,
    )

    i, j = np.mgrid[0:16, 0:16]
    hs = []
    for c in _PHASH_ND_CLASSES:
        px = ((c * 7 + i * 3 + j * 5 + (i * j * (c % 5)) // 3) % 256).astype(
            np.uint8
        )
        hs.append(phash64(px))
        # the 2x nearest upscale used for role-1 rows is hash-invariant
        up = np.repeat(np.repeat(px, 2, 0), 2, 1)
        assert phash64(up) == hs[-1]
    dists = [
        bin(a ^ b).count("1") for x, a in enumerate(hs) for b in hs[x + 1 :]
    ]
    assert min(dists) >= 20


def test_gif_animated_roundtrip_compositing_transparency_disposal():
    """Animated GIF: every frame LZW-round-trips exactly; partial
    rects composite onto the canvas; transparent pixels show the
    prior canvas through; disposal 2 restores the rect to background;
    disposal 3 raises honestly."""
    import numpy as np
    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_gif,
        decode_gif_frames,
        encode_gif_animated,
    )

    rng = np.random.default_rng(3)
    frames = [np.full((6, 8, 3), 20 * k + 10, np.uint8) for k in range(4)]
    frames[2] = (rng.integers(0, 4, (6, 8, 3)) * 60).astype(np.uint8)
    got, delays = decode_gif_frames(
        encode_gif_animated(frames, delays_cs=[5, 10, 15, 20])
    )
    assert delays == [5, 10, 15, 20]
    assert all(np.array_equal(a, b) for a, b in zip(frames, got))
    assert decode_gif(encode_gif_animated(frames))["n_frames"] == 4

    base = np.full((5, 7, 3), 100, np.uint8)
    patch = np.full((2, 3, 3), 200, np.uint8)
    got, _ = decode_gif_frames(
        encode_gif_animated([base, patch], offsets=[(0, 0), (2, 1)])
    )
    want = base.copy()
    want[1:3, 2:5] = 200
    assert np.array_equal(got[1], want)

    holey = patch.copy()
    holey[0, 0] = (7, 7, 7)
    got, _ = decode_gif_frames(
        encode_gif_animated(
            [base, holey],
            offsets=[(0, 0), (2, 1)],
            transparent_color=(7, 7, 7),
        )
    )
    want_t = want.copy()
    want_t[1, 2] = 100  # transparent pixel kept the base color
    assert np.array_equal(got[1], want_t)

    got, _ = decode_gif_frames(
        encode_gif_animated(
            [base, patch, patch],
            offsets=[(0, 0), (2, 1), (2, 1)],
            disposals=[0, 2, 0],
        )
    )
    assert np.array_equal(got[2][1:3, 2:5], patch)

    # disposal 3: the patch shows while its frame displays, then the
    # rect reverts to its pre-render content before the next frame
    other = np.full((2, 2, 3), 40, np.uint8)
    got, _ = decode_gif_frames(
        encode_gif_animated(
            [base, patch, other],
            offsets=[(0, 0), (2, 1), (4, 0)],
            disposals=[0, 3, 0],
        )
    )
    assert np.array_equal(got[1][1:3, 2:5], patch)  # visible on display
    want3 = base.copy()
    want3[0:2, 4:6] = 40
    assert np.array_equal(got[2], want3)  # patch rect reverted to base
    # an out-of-spec disposal value fails loudly
    blob = bytearray(
        encode_gif_animated([base, patch], disposals=[0, 0])
    )
    i = blob.find(b"\x21\xf9\x04")
    blob[i + 3] = 4 << 2  # reserved disposal value in the first GCE
    with _pytest.raises(ValueError, match="disposal method 4"):
        decode_gif_frames(bytes(blob))


def test_sample_frames_gif_timeline(spark):
    """The real GIF frame sampler keeps one frame per window using
    the GCE delays: 5 frames at 0.1 s sampled every 0.2 s emit
    indices 0/2/4 with their composited luma."""
    import numpy as np

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        encode_gif_animated,
    )
    from ccgp_data_wrangling_spark.operators.multimodal import (
        sample_frames_gif,
    )

    frames = [np.full((4, 4, 3), 10 + k, np.uint8) for k in range(5)]
    blob = encode_gif_animated(frames, delays_cs=[10] * 5)
    df = spark.createDataFrame([(1, bytearray(blob))], "id long, payload binary")
    rows = sorted(
        (r.frame_idx, r.frame_ts_sec, r.luma_mean)
        for r in sample_frames_gif(df, 0.2).collect()
    )
    assert [r[0] for r in rows] == [0, 2, 4]
    assert [r[1] for r in rows] == [0.0, 0.2, 0.4]
    assert rows[0][2] == 10.0 and rows[2][2] == 14.0


def test_audio_fingerprint_invariances_and_distinctness():
    """audio_fingerprint_dedup's oracle leans on: same pitch class →
    same fingerprint under amplitude/length/phase changes; the nine
    gate classes are pairwise distinct; 8-bit PCM raises."""
    import io
    import wave

    import numpy as np
    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        audio_fingerprint64,
    )

    def square_wav(half, cycles, amp, phase=0, sampwidth=2):
        pattern = np.concatenate([np.full(half, amp), np.full(half, -amp)])
        x = np.roll(np.tile(pattern, cycles), phase).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(sampwidth)
            wf.setframerate(8000)
            wf.writeframes(x.tobytes() if sampwidth == 2 else bytes(len(x)))
        return buf.getvalue()

    fps = {}
    for m in range(2, 11):
        base = audio_fingerprint64(square_wav(m, 30, 8000))
        for variant in (
            square_wav(m, 60, 12000),
            square_wav(m, 30, 8000, phase=3),
            square_wav(m, 45, 3000, phase=7),
        ):
            assert audio_fingerprint64(variant) == base, m
        fps[m] = base
    assert len(set(fps.values())) == 9

    with _pytest.raises(NotImplementedError, match="16-bit"):
        audio_fingerprint64(square_wav(3, 10, 100, sampwidth=1))


def test_audio_constellation_and_clip_match(spark):
    """Constellation landmarks: the 9 gate pitch classes map to 9
    DISTINCT peak bins (the oracle's zero-votes proof needs frame
    classes to be recoverable from bins); matching finds the planted
    (track, offset) with exactly W-1 votes and survives amplitude
    changes; a clip from an unknown track matches nothing."""
    import io
    import wave

    import numpy as np

    from ccgp_data_wrangling_spark.operators.audiomatch import (
        audio_clip_match,
        frame_peak_bins,
    )
    from ccgp_data_wrangling_spark.queries.llm_scale import _square_frame

    def wav_of(sig):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(sig.astype("<i2").tobytes())
        return buf.getvalue()

    # distinct peak bin per class, amplitude-invariant
    bins = [
        frame_peak_bins(wav_of(_square_frame(c, 8000)))[0] for c in range(9)
    ]
    assert len(set(bins)) == 9
    assert bins == [
        frame_peak_bins(wav_of(_square_frame(c, 1700)))[0] for c in range(9)
    ]

    def track_sig(t):
        return np.concatenate(
            [_square_frame((t * 7 + i * i) % 9, 8000) for i in range(12)]
        )

    tracks = spark.createDataFrame(
        [(t, bytearray(wav_of(track_sig(t)))) for t in range(9)],
        "id long, payload binary",
    )
    clips = spark.createDataFrame(
        [
            # clip of track 4 at offset 3, different amplitude
            (100, bytearray(wav_of(np.concatenate(
                [_square_frame((4 * 7 + i * i) % 9, 900) for i in range(3, 9)]
            )))),
            # constant-class clip matching no track's schedule
            (101, bytearray(wav_of(np.concatenate(
                [_square_frame(0, 900) for _ in range(6)]
            )))),
        ],
        "id long, payload binary",
    )
    got = {r.clip_id: (r.track_id, r.offset, r.votes)
           for r in audio_clip_match(tracks, clips).collect()}
    assert got[100] == (4, 3, 5)
    # the constant clip's self-pairs may collide with single track
    # transitions only by luck of the schedule; it must never reach
    # the coherent-vote count of a true match
    assert 101 not in got or got[101][2] < 5


def test_mp4_container_parse_and_honest_gates():
    """ISO-BMFF box walk: brand/duration/tracks/codecs/16.16 dims
    round-trip through the fixture writer; garbage, fragmented, and
    encrypted payloads raise honestly."""
    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        build_mp4,
        parse_mp4_meta,
    )

    blob = build_mp4(
        duration_ms=90500,
        tracks=[
            {"width": 1920, "height": 1080, "codec": "avc1"},
            {"width": 0, "height": 0, "codec": "mp4a"},
        ],
    )
    m = parse_mp4_meta(blob)
    assert m["kind"] == "video" and m["brand"] == "isom"
    assert m["duration_sec"] == 90.5 and m["n_tracks"] == 2
    assert m["tracks"][0] == {
        "width": 1920.0, "height": 1080.0, "codecs": ["avc1"]
    }
    assert m["tracks"][1]["codecs"] == ["mp4a"]

    with _pytest.raises(ValueError, match="no ftyp"):
        parse_mp4_meta(b"\x00\x00\x00\x10free" + bytes(8) + blob[16:])
    # moof presence alone no longer gates: a non-zero mvhd duration
    # stands, and a DASH-style zero duration falls back to mvex/mehd
    frag = blob + (8).to_bytes(4, "big") + b"moof"
    assert parse_mp4_meta(frag)["duration_sec"] == 90.5
    from ccgp_data_wrangling_spark.operators.media_codecs import (
        build_fragmented_mp4,
    )

    fblob = build_fragmented_mp4(
        timescale=1000,
        tracks=[{"track_ID": 1, "width": 640, "height": 360,
                 "codec": "avc1", "media_timescale": 1000}],
        fragments=[{"track_ID": 1, "tfdt": 0,
                    "samples": [{"size": 40, "duration": 250, "sync": True},
                                {"size": 40, "duration": 250, "sync": False}]}],
    )
    assert parse_mp4_meta(fblob)["duration_sec"] == 0.5  # from mehd
    with _pytest.raises(NotImplementedError, match="without mehd"):
        parse_mp4_meta(fblob.replace(b"mehd", b"free"))
    with _pytest.raises(NotImplementedError, match="encrypted"):
        parse_mp4_meta(blob.replace(b"avc1", b"encv"))
    with _pytest.raises(ValueError, match="box size"):
        parse_mp4_meta(blob[:8] + b"\x00\x00\x00\x03bad" + blob[8:])


def test_bmp_roundtrip_and_gates():
    """24-bit + palette BMP, both row directions, honest gates."""
    import numpy as np
    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_bmp,
        encode_bmp,
    )

    px = (
        np.indices((5, 7)).sum(0)[..., None] * np.array([10, 20, 30]) % 256
    ).astype(np.uint8)
    exp = [round(float(px[..., c].mean()), 4) for c in range(3)]
    for td in (False, True):
        m = decode_bmp(encode_bmp(px, top_down=td))
        assert (m["width"], m["height"]) == (7, 5)
        assert m["channel_means"] == exp
    pal = np.array(
        [[i, 2 * i % 256, 3 * i % 256] for i in range(256)], np.uint8
    )
    idx = (np.indices((4, 6)).sum(0) * 9 % 256).astype(np.uint8)
    mp = decode_bmp(encode_bmp(idx, palette=pal))
    want = pal[idx].astype(np.float64).mean(axis=(0, 1))
    assert mp["channel_means"] == [round(float(x), 4) for x in want]

    blob = encode_bmp(px)
    with _pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX" + blob[2:])
    with _pytest.raises(NotImplementedError, match="compression"):
        bad = bytearray(blob)
        bad[30] = 3  # BI_BITFIELDS: still gated
        decode_bmp(bytes(bad))
    with _pytest.raises(ValueError, match="with 24 bpp"):
        bad = bytearray(blob)
        bad[30] = 1  # RLE8 claims 8 bpp; this file is 24
        decode_bmp(bytes(bad))
    with _pytest.raises(ValueError, match="truncated"):
        decode_bmp(blob[:-8])


def test_bmp_low_bpp_and_core_header():
    """4-bit/1-bit packed palette pixels (MSB-first, non-byte widths
    exercising the nibble/bit padding) and the OS/2 1.x
    BITMAPCOREHEADER (16-bit dims, 3-byte palette entries) round-trip;
    16-bit depth still gates."""
    import numpy as np
    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.default_rng(5)
    pal16 = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    pal2 = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    idx4 = rng.integers(0, 16, (7, 9), dtype=np.uint8)  # odd width
    idx1 = rng.integers(0, 2, (5, 13), dtype=np.uint8)  # non-byte width

    def means(idx, pal):
        m = pal[idx].astype(np.float64).mean(axis=(0, 1))
        return [round(float(x), 4) for x in m]

    for idx, pal, bpp in ((idx4, pal16, 4), (idx1, pal2, 1)):
        for td in (False, True):
            got = decode_bmp(
                encode_bmp(idx, palette=pal, bpp=bpp, top_down=td)
            )
            assert got["channel_means"] == means(idx, pal), (bpp, td)
            assert (got["width"], got["height"]) == idx.shape[::-1]
    # the packed row really is sub-byte: 9 4-bit pixels → 5 data bytes
    blob = encode_bmp(idx4, palette=pal16, bpp=4)
    data_off = int.from_bytes(blob[10:14], "little")
    assert len(blob) - data_off == 8 * 7  # ceil(9/2)=5 → padded to 8
    # BITMAPCOREHEADER: palette and truecolor variants
    core = encode_bmp(idx4, palette=pal16, bpp=4, core_header=True)
    assert int.from_bytes(core[14:18], "little") == 12
    assert decode_bmp(core)["channel_means"] == means(idx4, pal16)
    rgb = rng.integers(0, 256, (4, 3, 3), dtype=np.uint8)
    gc = decode_bmp(encode_bmp(rgb, core_header=True))
    assert gc["channel_means"] == [
        round(float(m), 4)
        for m in rgb.astype(np.float64).mean(axis=(0, 1))
    ]
    # gates and guards
    with _pytest.raises(ValueError, match="exceeds 1-bit"):
        encode_bmp(idx4, palette=pal16, bpp=1)
    with _pytest.raises(NotImplementedError, match="16-bit BMP"):
        bad = bytearray(encode_bmp(idx4, palette=pal16, bpp=4))
        bad[28] = 16
        decode_bmp(bytes(bad))
    with _pytest.raises(ValueError, match="uncompressed bottom-up"):
        encode_bmp(idx4, palette=pal16, bpp=4, core_header=True,
                   top_down=True)


def test_bmp_rle_roundtrip_and_escapes():
    """BI_RLE8 / BI_RLE4 (Windows BMP spec): encoded runs, absolute
    mode with word alignment, end-of-line/bitmap and delta escapes
    all decode; fixtures round-trip pixel-exactly against the
    uncompressed baseline."""
    import numpy as np
    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _bmp_rle_decode,
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.default_rng(5)
    pal = np.array(
        [[i, 2 * i % 256, 3 * i % 256] for i in range(256)], np.uint8
    )
    # half smooth runs, half literals: exercises both encoder modes
    idx = np.concatenate(
        [
            np.full((6, 10), 7, np.uint8),
            rng.integers(0, 256, (6, 10), dtype=np.uint8),
        ],
        axis=1,
    )
    ref = decode_bmp(encode_bmp(idx, palette=pal))
    rle8 = encode_bmp(idx, palette=pal, compression=1)
    assert decode_bmp(rle8) == ref
    idx4 = (idx % 16).astype(np.uint8)
    ref4 = decode_bmp(encode_bmp(idx4, palette=pal[:16]))
    rle4 = encode_bmp(idx4, palette=pal[:16], compression=2)
    assert decode_bmp(rle4) == ref4
    # handcrafted stream: alternating-nibble run, delta skip (skipped
    # pixels stay index 0), odd-count absolute run, EOL, EOB
    stream = bytes(
        [5, 0x12, 0, 2, 2, 0, 0, 3, 0x34, 0x50, 0, 0, 4, 0x77, 0, 1]
    )
    img = _bmp_rle_decode(stream, 10, 2, 4)
    assert list(img[1]) == [1, 2, 1, 2, 1, 0, 0, 3, 4, 5]
    assert list(img[0][:4]) == [7, 7, 7, 7]
    # honest guards
    with _pytest.raises(ValueError, match="escapes the bitmap"):
        _bmp_rle_decode(bytes([200, 0x11, 0, 1]), 10, 2, 8)
    with _pytest.raises(ValueError, match="without end-of-bitmap"):
        _bmp_rle_decode(bytes([2, 0x11, 0, 0]), 10, 2, 8)
    with _pytest.raises(ValueError, match="top-down RLE"):
        encode_bmp(idx, palette=pal, compression=1, top_down=True)
    with _pytest.raises(ValueError, match="exceeds 4-bit depth"):
        encode_bmp(idx, palette=pal, compression=2)


def test_tiff_roundtrip_and_gates():
    """Baseline TIFF: gray + RGB, II + MM, single + multi strip;
    compressed/unsupported variants raise."""
    import numpy as np
    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_tiff,
        encode_tiff,
    )

    g = (np.indices((6, 5)).sum(0) * 13 % 256).astype(np.uint8)
    for order in ("II", "MM"):
        for rps in (None, 2):
            t = decode_tiff(
                encode_tiff(g, byte_order=order, rows_per_strip=rps)
            )
            assert (t["width"], t["height"], t["n_channels"]) == (5, 6, 1)
            assert t["luma_mean"] == round(float(g.mean()), 4)
    rgb = (
        np.indices((5, 7)).sum(0)[..., None] * np.array([10, 20, 30]) % 256
    ).astype(np.uint8)
    t = decode_tiff(encode_tiff(rgb, byte_order="MM", rows_per_strip=3))
    assert t["n_channels"] == 3
    assert t["channel_means"] == [
        round(float(rgb[..., c].mean()), 4) for c in range(3)
    ]

    blob = encode_tiff(g)
    with _pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"QQ" + blob[2:])
    comp = bytearray(blob)
    i = blob.find((0x0103).to_bytes(2, "little"))
    # Compression 7 (new-style JPEG) is implemented in r13; retagging
    # RAW strips as JPEG must fail the per-strip SOI validation, and
    # a genuinely unknown compression still gates
    comp[i + 8] = 7
    with _pytest.raises(ValueError, match="SOI"):
        decode_tiff(bytes(comp))
    comp[i + 8] = 6  # old-style JPEG (TIFF 6.0, deprecated): gated
    with _pytest.raises(NotImplementedError, match="compression 6"):
        decode_tiff(bytes(comp))
    with _pytest.raises(ValueError, match="strip byte"):
        decode_tiff(blob[:-4])


def test_tiff_lzw_packbits_predictor_roundtrip():
    """TIFF 6.0 §7 LZW (MSB-first, EARLY width change), §9 PackBits,
    §14 Predictor 2: every combination decodes to the identical image
    as the uncompressed baseline, across byte orders and strip
    layouts; the predictor visibly shrinks LZW output on smooth data;
    unsupported predictors gate."""
    import numpy as np
    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _packbits_decode,
        _packbits_encode,
        _tiff_lzw_decode,
        _tiff_lzw_encode,
        decode_tiff,
        encode_tiff,
    )

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    comp_tags = {"lzw": 5, "deflate": 8, "packbits": 32773}
    for px in (rgb, gray):
        ref = decode_tiff(encode_tiff(px))
        for comp in ("lzw", "deflate", "packbits"):
            for pred in (1, 2):
                for bo, rps in (("II", None), ("MM", 4)):
                    m = decode_tiff(
                        encode_tiff(
                            px, byte_order=bo, rows_per_strip=rps,
                            compression=comp, predictor=pred,
                        )
                    )
                    assert m["channel_means"] == ref["channel_means"]
                    assert m["compression"] == comp_tags[comp]
                    assert m["predictor"] == pred

    # raw codec properties: stream-level vector (CLEAR, 'A', 'B', EOI
    # all 9-bit MSB-first), width-boundary + table-full roundtrips
    enc = _tiff_lzw_encode(b"AB")
    bits = "".join(f"{x:08b}" for x in enc)
    assert [int(bits[i : i + 9], 2) for i in range(0, 36, 9)] == [
        256, 65, 66, 257,
    ]
    blob = bytes(rng.integers(0, 256, 20000, dtype=np.uint8))
    assert _tiff_lzw_decode(_tiff_lzw_encode(blob)) == blob
    runs = bytes(rng.integers(0, 3, 30000, dtype=np.uint8))
    assert _tiff_lzw_decode(_tiff_lzw_encode(runs)) == runs
    assert _packbits_decode(_packbits_encode(blob)) == blob
    assert _packbits_decode(_packbits_encode(b"\x00" * 1000)) == b"\x00" * 1000
    # predictor earns its keep on smooth data
    grad = np.tile(np.arange(256, dtype=np.uint8), (16, 2)).reshape(16, 512)
    assert len(encode_tiff(grad, compression="lzw", predictor=2)) < len(
        encode_tiff(grad, compression="lzw")
    )
    # 16-bit samples (archival/scientific scans): both byte orders,
    # every compression, predictor 2 at the sample width — and the
    # serialized stream really is 2 bytes per sample
    g16 = rng.integers(0, 65536, (6, 9), dtype=np.uint16)
    rgb16 = rng.integers(0, 65536, (4, 5, 3), dtype=np.uint16)
    for px16 in (g16, rgb16):
        want = decode_tiff(encode_tiff(px16))
        assert want["bit_depth"] == 16
        plain = encode_tiff(px16, byte_order="MM")
        for comp16 in ("lzw", "deflate", "packbits"):
            for pred16 in (1, 2):
                m16 = decode_tiff(
                    encode_tiff(
                        px16, byte_order="MM", rows_per_strip=2,
                        compression=comp16, predictor=pred16,
                    )
                )
                assert m16["channel_means"] == want["channel_means"]
                assert m16["bit_depth"] == 16
    spp16 = 1
    assert len(encode_tiff(g16)) - len(encode_tiff(
        (g16 >> 8).astype(np.uint8)
    )) == g16.size * spp16  # exactly one extra byte per sample
    # pre-standard Deflate code 32946 decodes identically to 8 (TIFF
    # TechNote 2 kept both in the wild): rewrite the Compression tag
    # value in-place in the IFD
    dz = bytearray(encode_tiff(gray, compression="deflate"))
    n_entries = int.from_bytes(dz[8:10], "little")
    for i in range(n_entries):
        e = 10 + 12 * i
        if int.from_bytes(dz[e : e + 2], "little") == 0x0103:
            assert int.from_bytes(dz[e + 8 : e + 10], "little") == 8
            dz[e + 8 : e + 10] = (32946).to_bytes(2, "little")
            break
    else:
        raise AssertionError("Compression tag not found")
    m = decode_tiff(bytes(dz))
    assert m["compression"] == 32946
    assert m["channel_means"] == decode_tiff(encode_tiff(gray))[
        "channel_means"
    ]
    # honest gates
    with _pytest.raises(ValueError, match="truncated PackBits"):
        _packbits_decode(b"\x05ab")
    with _pytest.raises(ValueError, match="without EOI"):
        _tiff_lzw_decode(_tiff_lzw_encode(blob)[:-2])
    pb = encode_tiff(gray, compression="packbits")
    i = pb.find((0x013D).to_bytes(2, "little"))
    assert i < 0  # predictor 1 writes no tag
    lz = bytearray(encode_tiff(gray, compression="lzw", predictor=2))
    j = lz.find((0x013D).to_bytes(2, "little"))
    lz[j + 8] = 3  # floating-point predictor: gated
    with _pytest.raises(NotImplementedError, match="predictor 3"):
        decode_tiff(bytes(lz))


def test_mp3_layer3_reservoir_and_scfsi():
    """§2.4.2.7 bit reservoir + scfsi: a stream whose frames' main
    data is packed contiguously across frame regions (nonzero
    main_data_begin) decodes to the IDENTICAL spectra as the same
    granules laid out frame-locally; scfsi band groups make granule 1
    reuse granule 0's scalefactors with no bits in the stream; builder
    validates reuse consistency; the 511-byte pointer cap gates."""
    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _L3_SLEN,
        build_mp3_layer3,
        decode_mp3_layer3_spectrum,
        parse_mp3_layer3_sideinfo,
    )

    def gran(gain, npairs, sf=None):
        return dict(
            global_gain=gain, scalefac_compress=9,
            scalefac=sf or [(gain + b) % 4 for b in range(21)],
            preflag=0, scalefac_scale=0, table=3,
            pairs=[(1, -2), (2, 1), (0, 2), (-1, 0)][:npairs],
            quads=[(1, 0, 0, -1)], count1table="A",
            region0_count=3, region1_count=3,
        )

    # frames of very different main-data sizes → later frames' data
    # starts well inside earlier regions when reservoir-packed; the
    # smallest bitrate keeps the per-frame slack under the 511-byte
    # pointer cap (real encoders stuff ancillary bits for the same
    # reason)
    frames = [
        {"granules": [gran(150, 4), gran(151, 1)]},
        {"granules": [gran(152, 2), gran(153, 4)]},
        {"granules": [gran(154, 1), gran(155, 1)]},
    ]
    flat = build_mp3_layer3(frames=frames, bitrate_kbps=32)
    packed = build_mp3_layer3(
        frames=frames, bitrate_kbps=32, reservoir=True
    )
    assert flat != packed
    si = parse_mp3_layer3_sideinfo(packed)
    mdbs = [s["main_data_begin"] for s in si if s["granule"] == 0]
    assert mdbs[0] == 0 and mdbs[1] > 0 and mdbs[2] > mdbs[1]
    # layout-only: the decoded spectra are identical
    strip = lambda rows: [
        {k: r[k] for k in ("frame", "granule", "sfb", "n_nonzero", "rms")}
        for r in rows
    ]
    assert strip(decode_mp3_layer3_spectrum(packed)) == strip(
        decode_mp3_layer3_spectrum(flat)
    )

    # scfsi: granule 1 reuses groups 0 (sfb 0-5) and 2 (sfb 11-15)
    sf0 = [(2 + b) % 4 for b in range(21)]
    sf1 = list(sf0)
    sf1[6:11] = [(3 * b) % 4 for b in range(6, 11)]  # group 1 differs
    sf1[16:21] = [(b + 1) % 4 for b in range(16, 21)]  # group 3 differs
    shared = {"granules": [gran(150, 3, sf0), gran(160, 2, sf1)],
              "scfsi": 0b1010}
    explicit = {"granules": [gran(150, 3, sf0), gran(160, 2, sf1)]}
    tagged = build_mp3_layer3(frames=[shared])
    plain = build_mp3_layer3(frames=[explicit])
    # the reused groups' bits are genuinely absent from the stream
    si_t = parse_mp3_layer3_sideinfo(tagged)
    si_p = parse_mp3_layer3_sideinfo(plain)
    assert si_t[0]["scfsi"] == 0b1010
    slen1, slen2 = _L3_SLEN[9]
    # reused groups 0 (6 scalefacs × slen1) and 2 (5 × slen2)
    assert (
        si_t[1]["part2_3_length"]
        == si_p[1]["part2_3_length"] - (6 * slen1 + 5 * slen2)
    )
    assert strip(decode_mp3_layer3_spectrum(tagged)) == strip(
        decode_mp3_layer3_spectrum(plain)
    )
    # builder refuses inconsistent reuse
    bad = {"granules": [gran(150, 3, sf0), gran(160, 2, sf1)],
           "scfsi": 0b0100}  # group 1 differs between granules
    with _pytest.raises(ValueError, match="unequal scalefactors"):
        build_mp3_layer3(frames=[bad])
    # 9-bit pointer cap: tiny frames at a fat bitrate accumulate >511
    # bytes of slack
    many = [{"granules": [gran(150, 0), gran(151, 0)]}] * 3
    with _pytest.raises(ValueError, match="9-bit"):
        build_mp3_layer3(
            frames=many, bitrate_kbps=320, reservoir=True
        )


def test_mp3_layer1_subband_decode():
    """Layer I dequantization against hand-computed spec formulas;
    multi-frame walk; honest gates for stereo/layer mismatch and the
    forbidden allocation code."""
    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        build_mp3_layer1,
        decode_mp3_layer1_subbands,
    )

    alloc = [0] * 32
    alloc[3], alloc[10] = 1, 3  # nb = 2 and nb = 4
    scf = [0] * 32
    scf[3], scf[10] = 0, 6  # sf = 2.0 and 2·2⁻² = 0.5
    blob = build_mp3_layer1(
        alloc=alloc, scf_idx=scf,
        codes=lambda t, sb: (t + sb) % (1 << (alloc[sb] + 1)),
        n_frames=2,
    )
    rows = decode_mp3_layer1_subbands(blob)
    assert [(r["frame"], r["subband"]) for r in rows] == [
        (0, 3), (0, 10), (1, 3), (1, 10),
    ]
    r0 = rows[0]
    assert r0["nbits"] == 2 and r0["scf_idx"] == 0
    # replicate the spec arithmetic independently
    import math

    def ref_rms(sb, nb, sfk):
        vals = []
        for t in range(12):
            code = (t + sb) % (1 << nb)
            s3 = code / 2.0 ** (nb - 1) - 1 + 2.0 ** (-(nb - 1))
            s2 = (2.0**nb / (2.0**nb - 1)) * s3
            vals.append(2.0 * 2.0 ** (-sfk) * s2)
        return round(math.sqrt(sum(v * v for v in vals) / 12.0), 6)

    assert r0["rms"] == ref_rms(3, 2, 0)
    assert rows[1]["rms"] == ref_rms(10, 4, 2)

    # the mid-tread code 2^(nb−1) dequantizes to the constant
    # +2^(−nb+1)·2^nb/(2^nb−1) offset (Layer I has no exact zero
    # level) — scaled by sf it is the closed form below
    quiet = decode_mp3_layer1_subbands(
        build_mp3_layer1(alloc=alloc, scf_idx=scf, codes=lambda t, sb: 1 << alloc[sb])
    )
    for r in quiet:
        nb, sfk = r["nbits"], r["scf_idx"] // 3
        want = 2.0 * 2.0 ** (-sfk) * (2.0**nb / (2.0**nb - 1)) * 2.0 ** (
            -(nb - 1)
        )
        assert r["rms"] == round(want, 6), r

    # honest gates
    with _pytest.raises(ValueError, match="forbidden"):
        bad = bytearray(blob)
        bad[4] = 0xFF  # first two allocation codes → 15
        decode_mp3_layer1_subbands(bytes(bad))
    from ccgp_data_wrangling_spark.operators.media_codecs import build_mp3

    with _pytest.raises(NotImplementedError, match="Layer I only"):
        decode_mp3_layer1_subbands(build_mp3(n_frames=1))  # layer III
    stereo = bytearray(blob)
    stereo[3] &= 0b00111111  # channel mode 00 = stereo
    with _pytest.raises(NotImplementedError, match="stereo"):
        decode_mp3_layer1_subbands(bytes(stereo))
    with _pytest.raises(ValueError, match="payload needs"):
        build_mp3_layer1(
            alloc=[14] * 32, scf_idx=[0] * 32, codes=lambda t, sb: 0,
            bitrate_kbps=32,
        )


def test_id3v2_text_frames_roundtrip():
    """ID3v2.3 text frames: all three encodings round-trip, non-text
    frames skipped, padding terminates, the MP3 frame walk still
    skips the real tag, malformations raise."""
    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        build_id3v2,
        build_mp3,
        parse_id3v2,
        parse_mp3_meta,
    )

    frames = {
        "TIT2": "Naïve Song",
        "TPE1": "The Artists",
        "TALB": "Album—One",
        "TYER": "2024",
    }
    for enc in (0, 1, 3):
        use = dict(frames)
        if enc == 0:  # latin-1 cannot carry the em dash
            use["TALB"] = "Album One"
        tag = build_id3v2(use, encoding=enc)
        got = parse_id3v2(tag)
        assert got["frames"] == use, enc
        assert got["tag_bytes"] == len(tag)
    # inside a full MP3: tag parsed here, skipped by the frame walk
    mp3 = build_mp3(id3v2_frames=frames, n_frames=3)
    assert parse_id3v2(mp3)["frames"]["TIT2"] == "Naïve Song"
    m = parse_mp3_meta(mp3)
    assert m["id3v2"] and m["n_frames"] == 3
    # absence is data
    assert parse_id3v2(build_mp3()) == {
        "frames": {}, "tag_bytes": 0, "version": 0,
    }
    # honest gates
    tag = build_id3v2(frames)
    with _pytest.raises(NotImplementedError, match="ID3v2.5"):
        parse_id3v2(b"ID3" + bytes([5, 0, 0]) + tag[6:])
    bad = bytearray(tag)
    bad[14] = 0xFF  # TIT2 frame length grows past the tag
    with _pytest.raises(ValueError, match="escapes the tag"):
        parse_id3v2(bytes(bad))


def test_id3v22_frames_roundtrip():
    """ID3v2.2 (id3v2-00): 6-byte frame headers (3-char id + 3-byte
    size, no flags), id translation to modern spellings, whole-tag
    unsynchronisation with a literal ÿ, the compression-bit gate and
    the encodings the version actually defines."""
    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        build_id3v2,
        build_mp3,
        parse_id3v2,
        parse_mp3_meta,
    )

    frames = {
        "TIT2": "Old Songÿ",
        "TPE1": "Artist ÿ2",
        "TALB": "Album—Two",
        "TYER": "1997",
    }
    for enc in (0, 1):
        use = dict(frames)
        if enc == 0:  # latin-1 cannot carry the em dash
            use["TALB"] = "Album Two"
        for unsync in (False, True):
            tag = build_id3v2(use, encoding=enc, version=2, unsync=unsync)
            assert tag[3] == 2
            if unsync:  # the ÿ bytes force real guard-byte insertions
                assert tag[5] & 0x80
            got = parse_id3v2(tag)
            assert got["version"] == 2
            assert got["frames"] == use, (enc, unsync)
            assert got["tag_bytes"] == len(tag)
    # raw layout: first frame header is 'TT2' + 3-byte size, no flags
    tag = build_id3v2({"TIT2": "abc"}, encoding=0, version=2)
    assert tag[10:13] == b"TT2"
    assert int.from_bytes(tag[13:16], "big") == 4  # enc byte + 'abc'
    # unknown 3-char ids survive untranslated; non-text frames skip
    assert parse_id3v2(tag)["frames"] == {"TIT2": "abc"}
    # inside a full MP3 the frame walk skips the v2.2 tag by its size
    mp3 = build_mp3(
        n_frames=3, id3v2_frames=frames, id3v2_encoding=1, id3v2_version=2
    )
    assert parse_id3v2(mp3)["frames"]["TIT2"] == "Old Songÿ"
    m = parse_mp3_meta(mp3)
    assert m["id3v2"] and m["n_frames"] == 3
    # honest gates: the compression bit has no defined scheme (§3.1
    # says discard); v2.2 defines only encodings 0/1
    with _pytest.raises(NotImplementedError, match="compression bit"):
        parse_id3v2(b"ID3" + bytes([2, 0, 0x40]) + tag[6:])
    with _pytest.raises(ValueError, match="only encodings"):
        build_id3v2(frames, encoding=3, version=2)
    body = b"TT2" + bytes([0, 0, 2]) + bytes([3]) + b"x"
    crafted = (
        b"ID3" + bytes([2, 0, 0])
        + bytes([0, 0, 0, len(body)]) + body
    )
    with _pytest.raises(NotImplementedError, match="ID3v2.2 text encoding"):
        parse_id3v2(crafted)


def test_id3v24_unsync_and_footer():
    """ID3v2.4: syncsafe frame sizes, UTF-16BE (enc 2), per-frame and
    tag-announced unsynchronisation, the '3DI' footer in tag_bytes;
    v2.3 whole-tag unsynchronisation; texts with real 0xFF bytes so
    the guard-byte insertion demonstrably fires."""
    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _unsync_decode,
        _unsync_encode,
        build_id3v2,
        build_mp3,
        parse_id3v2,
        parse_mp3_meta,
    )

    # raw scheme: FF before E0+/00/end gets a guard byte
    raw = b"a\xff\xe3b\xff\x00c\xff"
    enc = _unsync_encode(raw)
    assert enc == b"a\xff\x00\xe3b\xff\x00\x00c\xff\x00"
    assert _unsync_decode(enc) == raw

    # the trailing ÿ of the LAST frame precedes padding zeros (v2.3
    # whole-tag) or the frame end (v2.4 per-frame) — both positions
    # where the spec requires a guard byte
    frames = {"TIT2": "Songÿ", "TPE1": "ÿArtist", "TYER": "1999ÿ"}
    for ver in (3, 4):
        encs = (0, 1, 3) if ver == 3 else (0, 1, 2, 3)
        for e in encs:
            for unsync in (False, True):
                for footer in ((False, True) if ver == 4 else (False,)):
                    tag = build_id3v2(
                        frames, encoding=e, version=ver,
                        unsync=unsync, footer=footer,
                    )
                    got = parse_id3v2(tag + b"\xff\xfbAUDIO")
                    assert got["frames"] == frames, (ver, e, unsync)
                    assert got["version"] == ver
                    assert got["tag_bytes"] == len(tag)
    # unsync flag is actually set and the ÿ byte really was guarded
    t3 = build_id3v2(frames, encoding=0, version=3, unsync=True)
    assert t3[5] & 0x80 and b"\xff\x00" in t3[10:]
    t4 = build_id3v2(frames, encoding=0, version=4, unsync=True)
    assert t4[5] & 0x80
    # the MP3 frame walk skips v2.4 tags (incl. footer) by size
    mp3 = build_mp3(
        id3v2_frames=frames, id3v2_version=4, id3v2_unsync=True,
        id3v2_footer=True, n_frames=3,
    )
    assert parse_id3v2(mp3)["frames"]["TIT2"] == "Songÿ"
    m = parse_mp3_meta(mp3)
    assert m["id3v2"] and m["n_frames"] == 3
    # v2.4 syncsafe frame-size validation
    t = bytearray(build_id3v2(frames, encoding=3, version=4))
    t[14] = 0x80  # high bit in a syncsafe size byte
    with _pytest.raises(ValueError, match="syncsafe frame size"):
        parse_id3v2(bytes(t))
    # writer guards
    with _pytest.raises(ValueError, match="v2.4-only"):
        build_id3v2(frames, encoding=2, version=3)
    with _pytest.raises(ValueError, match="footer is v2.4-only"):
        build_id3v2(frames, version=3, footer=True)


def test_mp4_sample_tables_roundtrip():
    """stts/stsc/stsz/stco/stss expansion: per-sample times, byte
    ranges, and keyframe flags match the fixture construction, and
    the stco offsets really point at the sample bytes in mdat."""
    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _mp4_sample_payload,
        build_mp4,
        mp4_sample_table,
        parse_mp4_meta,
    )

    sizes = [100, 120, 80, 90, 110, 60, 70]
    blob = build_mp4(
        duration_ms=700,
        tracks=[
            {
                "width": 640,
                "height": 480,
                "codec": "avc1",
                "media_timescale": 600,
                "sample_sizes": sizes,
                "sample_deltas": [60, 60, 60, 90, 90, 90, 60],
                "chunks": [3, 3, 1],
                "keyframes": [1, 4, 7],
            }
        ],
    )
    rows = mp4_sample_table(blob)
    assert [r["sample"] for r in rows] == [1, 2, 3, 4, 5, 6, 7]
    assert [r["size"] for r in rows] == sizes
    assert [r["chunk"] for r in rows] == [1, 1, 1, 2, 2, 2, 3]
    # dts accumulates the stts runs; time in mdhd-timescale seconds
    assert [r["dts"] for r in rows] == [0, 60, 120, 180, 270, 360, 450]
    assert rows[3]["time_sec"] == 0.3 and rows[6]["time_sec"] == 0.75
    assert [r["keyframe"] for r in rows] == [
        True, False, False, True, False, False, True,
    ]
    # chunks are contiguous: offsets advance by size inside a chunk
    assert rows[1]["offset"] == rows[0]["offset"] + sizes[0]
    assert rows[0]["mdat_offset"] == 0
    assert rows[3]["mdat_offset"] == sum(sizes[:3])
    # the absolute offsets select the exact payload bytes
    for r in rows:
        assert (
            blob[r["offset"] : r["offset"] + r["size"]]
            == _mp4_sample_payload(r["sample"], r["size"])
        )
    # no stss box → every sample is a sync sample (§8.6.2)
    allsync = build_mp4(
        duration_ms=300,
        tracks=[
            {
                "width": 64, "height": 64, "codec": "avc1",
                "sample_sizes": [10, 20, 30], "sample_delta": 100,
            }
        ],
    )
    assert all(r["keyframe"] for r in mp4_sample_table(allsync))
    # the metadata walk still reads the enriched container
    m = parse_mp4_meta(blob)
    assert m["tracks"][0]["codecs"] == ["avc1"]
    # a metadata-only fixture (no sample_sizes) yields no sample rows
    plain = build_mp4(
        duration_ms=100,
        tracks=[{"width": 1, "height": 1, "codec": "avc1"}],
    )
    assert mp4_sample_table(plain) == []


def test_mp4_sample_tables_fail_loudly_on_inconsistency():
    """Cross-table disagreements raise — a silently wrong offset
    would hand garbage bytes to a downstream decoder."""
    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        build_mp4,
        mp4_sample_table,
    )

    blob = build_mp4(
        duration_ms=300,
        tracks=[
            {
                "width": 64, "height": 64, "codec": "avc1",
                "sample_sizes": [10, 20, 30], "sample_delta": 100,
                "keyframes": [1, 3],
            }
        ],
    )
    # corrupt the stsz sample count (3 → 4): stts no longer covers it
    i = blob.find(b"stsz")
    bad = bytearray(blob)
    bad[i + 12 : i + 16] = (4).to_bytes(4, "big")
    with _pytest.raises(ValueError, match="stts covers"):
        mp4_sample_table(bytes(bad))
    # corrupt a chunk offset to point past mdat
    j = blob.find(b"stco")
    bad = bytearray(blob)
    bad[j + 12 : j + 16] = (len(blob) - 5).to_bytes(4, "big")
    with _pytest.raises(ValueError, match="escapes mdat"):
        mp4_sample_table(bytes(bad))
    # stss naming a sample beyond the count
    k = blob.find(b"stss")
    bad = bytearray(blob)
    bad[k + 16 : k + 20] = (9).to_bytes(4, "big")
    with _pytest.raises(ValueError, match="beyond stsz count"):
        mp4_sample_table(bytes(bad))


def test_mp3_frame_walk_metadata():
    """Every frame header parsed; duration is the exact walked sum of
    samples-per-frame / rate — closed forms per (version, layer)."""
    from ccgp_data_wrangling_spark.operators.media_codecs import (
        build_mp3,
        parse_mp3_meta,
    )

    m = parse_mp3_meta(build_mp3())  # MPEG1 L3 128k 44100 stereo x4
    assert (m["version"], m["layer"], m["sample_rate"]) == ("MPEG1", 3, 44100)
    assert (m["n_channels"], m["n_frames"]) == (2, 4)
    assert m["duration_sec"] == round(4 * 1152 / 44100, 4)
    assert not m["vbr"] and not m["id3v2"]

    # layer I uses 384 samples/frame and 4-byte slots
    m1 = parse_mp3_meta(
        build_mp3(layer=1, bitrate_kbps=384, sample_rate=48000, n_frames=5)
    )
    assert m1["duration_sec"] == round(5 * 384 / 48000, 4)
    assert m1["bitrate_kbps"] == 384

    # MPEG2.5 L3 = 576 samples/frame; padding + CRC + ID3 wrappers
    m2 = parse_mp3_meta(
        build_mp3(
            version="MPEG2.5",
            bitrate_kbps=64,
            sample_rate=8000,
            n_frames=7,
            mono=True,
            pad_every=3,
            id3v2_bytes=50,
            id3v1=True,
            crc=True,
        )
    )
    assert (m2["version"], m2["sample_rate"], m2["n_channels"]) == (
        "MPEG2.5", 8000, 1,
    )
    assert m2["n_frames"] == 7
    assert m2["duration_sec"] == round(7 * 576 / 8000, 4)
    assert m2["id3v2"]

    # layer II MPEG2
    m3 = parse_mp3_meta(
        build_mp3(version="MPEG2", layer=2, bitrate_kbps=80,
                  sample_rate=24000, n_frames=3)
    )
    assert m3["duration_sec"] == round(3 * 1152 / 24000, 4)


def test_mp3_vbr_xing_and_honest_gates():
    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        build_mp3,
        parse_mp3_meta,
    )

    # per-frame bitrate list → vbr, duration still exact
    v = parse_mp3_meta(build_mp3(bitrate_kbps=[128, 160, 192, 128]))
    assert v["vbr"] and v["n_frames"] == 4

    # the walk yields an exact per-frame bitrate histogram
    assert v["bitrate_hist"] == [(128, 2), (160, 1), (192, 1)]
    assert v["n_bitrates"] == 3
    assert v["min_bitrate_kbps"] == 128 and v["max_bitrate_kbps"] == 192
    assert v["avg_bitrate_kbps"] == 152.0  # (128·2+160+192)/4
    c = parse_mp3_meta(build_mp3(n_frames=3))
    assert c["bitrate_hist"] == [(128, 3)] and not c["vbr"]

    # Xing frame count is read and must agree with the walk
    x = parse_mp3_meta(build_mp3(xing=True, n_frames=6))
    assert x["vbr"] and x["n_frames"] == 6

    # Fraunhofer VBRI header: detected at its fixed slot, frame count
    # cross-checked like Xing
    vb = parse_mp3_meta(build_mp3(vbri=True, n_frames=5))
    assert vb["vbr"] and vb["n_frames"] == 5
    blob = bytearray(build_mp3(vbri=True, n_frames=5))
    i = blob.find(b"VBRI")
    blob[i + 17] = 9  # corrupt stored frame count
    with _pytest.raises(ValueError, match="frame count"):
        parse_mp3_meta(bytes(blob))
    blob = bytearray(build_mp3(xing=True, n_frames=6))
    i = blob.find(b"Xing")
    blob[i + 11] = 9  # corrupt the stored frame count
    with _pytest.raises(ValueError, match="Xing frame count"):
        parse_mp3_meta(bytes(blob))

    # free-format bitrate raises honestly; garbage loses sync loudly
    free = bytearray(build_mp3(n_frames=1))
    free[2] &= 0x0F  # zero the bitrate index
    with _pytest.raises(NotImplementedError, match="free-format"):
        parse_mp3_meta(bytes(free))
    with _pytest.raises(ValueError, match="lost MP3 frame sync"):
        parse_mp3_meta(b"\x00\x01\x02\x03" + bytes(40))
    # mid-stream parameter change is an error, not silent drift
    a = build_mp3(sample_rate=44100, n_frames=2)
    b = build_mp3(sample_rate=32000, n_frames=1)
    with _pytest.raises(ValueError, match="parameters change"):
        parse_mp3_meta(a + b)

    # a final frame whose header promises more bytes than remain is
    # truncation, not a shorter full frame (r6 advice: the old walk
    # counted it and overstated duration)
    whole = build_mp3(n_frames=3)
    with _pytest.raises(ValueError, match="truncated final MP3 frame"):
        parse_mp3_meta(whole[:-10])
    # ...but cutting INSIDE the 4-byte header keeps the older
    # truncated-header error
    with _pytest.raises(ValueError, match="truncated MP3 frame header"):
        frame_len = len(build_mp3(n_frames=1))
        parse_mp3_meta(whole[: 2 * frame_len + 2])


def test_mp4_fragmented_sample_tables_roundtrip():
    """moof/traf/tfhd/tfdt/trun expansion (§8.8): every default-sample
    chain (trun per-sample, tfhd default, trex fallback), both base
    modes (explicit 64-bit base-data-offset, default-base-is-moof +
    trun data-offset), first-sample-flags, cross-fragment sample
    numbering and dts accumulation — and the offsets really point at
    the sample bytes in each fragment's mdat."""
    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _mp4_sample_payload,
        build_fragmented_mp4,
        mp4_sample_table,
    )

    frags = [
        {  # per-sample trun fields, moof-relative base
            "track_ID": 1, "tfdt": 0, "explicit_base": False,
            "size_source": "trun", "duration_source": "trun",
            "flags_source": "trun",
            "samples": [
                {"size": 100, "duration": 60, "sync": True},
                {"size": 110, "duration": 60, "sync": False},
                {"size": 120, "duration": 90, "sync": False},
            ],
        },
        {  # tfhd defaults + first-sample-flags, explicit base
            "track_ID": 1, "tfdt": 210, "explicit_base": True,
            "size_source": "tfhd", "duration_source": "tfhd",
            "flags_source": "first",
            "samples": [
                {"size": 90, "duration": 60, "sync": True},
                {"size": 90, "duration": 60, "sync": False},
            ],
        },
        {  # everything falls through to trex; no tfdt → dts cursor
            "track_ID": 1, "explicit_base": False,
            "size_source": "trex", "duration_source": "trex",
            "flags_source": "trex",
            "samples": [
                {"size": 80, "duration": 50, "sync": False},
                {"size": 80, "duration": 50, "sync": False},
            ],
        },
    ]
    blob = build_fragmented_mp4(
        timescale=600,
        tracks=[{
            "track_ID": 1, "width": 320, "height": 240, "codec": "avc1",
            "media_timescale": 600, "trex_duration": 50,
            "trex_size": 80, "trex_flags": 0x10000,
        }],
        fragments=frags,
    )
    rows = mp4_sample_table(blob)
    assert [r["sample"] for r in rows] == [1, 2, 3, 4, 5, 6, 7]
    assert [r["chunk"] for r in rows] == [1, 1, 1, 2, 2, 3, 3]
    assert [r["size"] for r in rows] == [100, 110, 120, 90, 90, 80, 80]
    # dts: tfdt restates (0, 210), third fragment accumulates the cursor
    assert [r["dts"] for r in rows] == [0, 60, 120, 210, 270, 330, 380]
    assert [r["keyframe"] for r in rows] == [
        True, False, False, True, False, False, False,
    ]
    # per-fragment mdat-relative prefix sums
    assert [r["mdat_offset"] for r in rows] == [0, 100, 210, 0, 90, 0, 80]
    # absolute offsets select the exact payload bytes (sample payload
    # indices restart per fragment in the fixture writer)
    within = [1, 2, 3, 1, 2, 1, 2]
    for r, wi in zip(rows, within):
        assert (
            blob[r["offset"] : r["offset"] + r["size"]]
            == _mp4_sample_payload(wi, r["size"])
        )


def test_mp4_fragmented_implicit_traf_chaining():
    """§8.8.7 implicit inter-traf base chaining: a second traf with
    neither base-data-offset nor default-base-is-moof (nor a trun data
    offset) starts its data where the previous traf's data ended —
    the multi-track audio/video interleave real muxers write. Offsets
    byte-verify against the shared mdat."""
    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _mp4_sample_payload,
        build_fragmented_mp4,
        mp4_sample_table,
    )

    blob = build_fragmented_mp4(
        timescale=1000,
        tracks=[
            {"track_ID": 1, "width": 320, "height": 240,
             "codec": "avc1", "media_timescale": 600},
            {"track_ID": 2, "width": 0, "height": 0,
             "codec": "mp4a", "media_timescale": 48000},
        ],
        fragments=[
            {
                "track_ID": 1, "tfdt": 0, "explicit_base": False,
                "samples": [
                    {"size": 100, "duration": 60, "sync": True},
                    {"size": 110, "duration": 60, "sync": False},
                ],
                "chained_trafs": [{
                    "track_ID": 2, "tfdt": 0,
                    "samples": [
                        {"size": 30, "duration": 1024, "sync": True},
                        {"size": 40, "duration": 1024, "sync": True},
                    ],
                }],
            },
            {   # second fragment: chained traf with cursor dts
                "track_ID": 1, "tfdt": 120, "explicit_base": True,
                "samples": [
                    {"size": 90, "duration": 60, "sync": True},
                ],
                "chained_trafs": [{
                    "track_ID": 2,
                    "samples": [
                        {"size": 50, "duration": 1024, "sync": True},
                    ],
                }],
            },
        ],
    )
    rows = mp4_sample_table(blob)
    assert [(r["track"], r["sample"]) for r in rows] == [
        (0, 1), (0, 2), (1, 1), (1, 2), (0, 3), (1, 3),
    ]
    # chained data follows the video data inside each fragment's mdat
    assert [r["mdat_offset"] for r in rows] == [0, 100, 210, 240, 0, 90]
    # audio dts: tfdt 0 then cursor-accumulated 2048
    audio = [r for r in rows if r["track"] == 1]
    assert [r["dts"] for r in audio] == [0, 1024, 2048]
    # absolute offsets select the exact payload bytes (payload index
    # restarts per traf in the fixture writer)
    within = [1, 2, 1, 2, 1, 1]
    for r, wi in zip(rows, within):
        assert (
            blob[r["offset"] : r["offset"] + r["size"]]
            == _mp4_sample_payload(wi, r["size"])
        )


def test_mp4_fragmented_honest_gates():
    """Unknown track_ID, missing size/duration defaults, and
    out-of-mdat ranges raise."""
    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        build_fragmented_mp4,
        mp4_sample_table,
    )

    blob = build_fragmented_mp4(
        timescale=1000,
        tracks=[{"track_ID": 7, "width": 64, "height": 64,
                 "codec": "avc1", "media_timescale": 1000}],
        fragments=[{"track_ID": 7, "tfdt": 0,
                    "samples": [{"size": 40, "duration": 100, "sync": True}]}],
    )
    assert len(mp4_sample_table(blob)) == 1
    # tfhd names a track the moov doesn't declare
    i = blob.find(b"tfhd")
    bad = bytearray(blob)
    bad[i + 8 : i + 12] = (99).to_bytes(4, "big")
    with _pytest.raises(ValueError, match="unknown track_ID"):
        mp4_sample_table(bytes(bad))
    # grow the trun per-sample size past the mdat: byte-range guard
    # (trun layout here: hdr(8) + vf(4) + count(4) + data_offset(4)
    # + duration(4) + SIZE(4) + flags(4))
    j = blob.find(b"trun")
    bad = bytearray(blob)
    bad[j + 20 : j + 24] = (1000).to_bytes(4, "big")
    with _pytest.raises(ValueError, match="escapes every mdat"):
        mp4_sample_table(bytes(bad))


def test_mp4_co64_offsets_roundtrip():
    """64-bit chunk offsets (co64, §8.7.5) parse identically to stco
    and byte-verify against mdat."""
    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _mp4_sample_payload,
        build_mp4,
        mp4_sample_table,
    )

    blob = build_mp4(
        duration_ms=300,
        tracks=[{
            "width": 64, "height": 48, "codec": "avc1",
            "media_timescale": 600, "sample_sizes": [50, 60, 70],
            "sample_delta": 60, "chunks": [2, 1], "keyframes": [1, 3],
            "use_co64": True,
        }],
    )
    assert b"co64" in blob and b"stco" not in blob
    rows = mp4_sample_table(blob)
    assert [r["mdat_offset"] for r in rows] == [0, 50, 110]
    for r in rows:
        assert (
            blob[r["offset"] : r["offset"] + r["size"]]
            == _mp4_sample_payload(r["sample"], r["size"])
        )


def test_mp3_layer3_sideinfo_and_spectrum():
    """Layer III (ISO 11172-3 §2.4.1.7 / §2.4.3.4): side-info fields
    round-trip bit-exactly through the fixture writer; big-value
    pairs (tables 1-3), count1 quads (tables A and B), scalefactors,
    preflag/pretab and both scalefac_scale multipliers requantize to
    the hand-computed spectral envelope; underflow guard for the bit
    reservoir; honest gates for stereo, short blocks and
    untranscribed tables."""
    import math

    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _L3_PRETAB,
        _L3_SFB_LONG,
        build_mp3_layer3,
        decode_mp3_layer3_spectrum,
        parse_mp3_layer3_sideinfo,
    )

    g1 = dict(
        global_gain=160, scalefac_compress=9,
        scalefac=[(3 + b) % 4 for b in range(21)], preflag=1,
        scalefac_scale=0, table=3,
        pairs=[(1, -2), (0, 2), (-1, 1), (2, 0)],
        quads=[(1, 0, -1, 1), (0, 0, 0, -1)],
        count1table="A", region0_count=3, region1_count=3,
    )
    g2 = dict(
        g1, global_gain=170, count1table="B", scalefac_scale=1,
        table=2, pairs=[(2, 2), (-2, -1)], quads=[(1, 1, 1, 1)],
    )
    blob = build_mp3_layer3(granules=[g1, g2], n_frames=2)
    si = parse_mp3_layer3_sideinfo(blob)
    assert len(si) == 4  # 2 frames x 2 granules
    s0, s1 = si[0], si[1]
    assert s0["big_values"] == 4 and s1["big_values"] == 2
    assert s0["global_gain"] == 160 and s1["global_gain"] == 170
    assert s0["count1table_select"] == 0 and s1["count1table_select"] == 1
    assert s0["table_select"] == [3, 3, 3]
    assert s1["table_select"] == [2, 2, 2]
    assert not s0["window_switching"]

    rows = decode_mp3_layer3_spectrum(blob)
    assert len(rows) == 2 * 2 * 22
    bounds = _L3_SFB_LONG[44100]

    def expect(g, gain_db, lines):
        xr = [0.0] * 576
        mult = 0.5 * (g["scalefac_scale"] + 1)
        for i, c in enumerate(lines):
            b = next(
                bb for bb in range(22)
                if bounds[bb] <= i < bounds[bb + 1]
            )
            fac = 2.0 ** (
                -mult
                * ((g["scalefac"][b] if b < 21 else 0)
                   + g["preflag"] * _L3_PRETAB[b])
            )
            v = (abs(c) ** (4.0 / 3.0)) * (
                2.0 ** (0.25 * (gain_db - 210))
            ) * fac
            xr[i] = -v if c < 0 else v
        return xr

    flat1 = [1, -2, 0, 2, -1, 1, 2, 0, 1, 0, -1, 1, 0, 0, 0, -1]
    xr = expect(g1, 160, flat1)
    for r in rows:
        if r["frame"] == 0 and r["granule"] == 0:
            lo, hi = bounds[r["sfb"]], bounds[r["sfb"] + 1]
            exp = round(
                math.sqrt(sum(x * x for x in xr[lo:hi]) / (hi - lo)), 6
            )
            assert r["rms"] == exp, r
            assert r["n_nonzero"] == sum(
                1 for i in range(lo, hi)
                if i < len(flat1) and flat1[i] != 0
            )
    # frame 2 repeats frame 1 exactly
    by_key = {}
    for r in rows:
        by_key.setdefault((r["granule"], r["sfb"]), []).append(r["rms"])
    assert all(len(v) == 2 and v[0] == v[1] for v in by_key.values())

    # honest gates
    bad = bytearray(blob)
    # main_data_begin: first 9 bits after the 4-byte header
    bad[4] = 0x80  # frame 0 claims 256 reservoir bytes that don't exist
    with _pytest.raises(ValueError, match="reservoir underflow"):
        decode_mp3_layer3_spectrum(bytes(bad))
    # stereo PARSES now (r9) — a mono frame re-tagged stereo reads the
    # 32-byte side-info layout and yields 2-channel records (the
    # values are garbage since the bytes were laid out for mono, but
    # the structure walk itself must not raise)
    stereo = bytearray(blob)
    stereo[3] &= 0x3F  # channel mode 00 = stereo
    assert {
        s["channel"] for s in parse_mp3_layer3_sideinfo(bytes(stereo))
    } == {0, 1}
    with _pytest.raises(ValueError, match="need 21"):
        build_mp3_layer3(granules=[dict(g1, scalefac=[0] * 5), g2])
    # an untranscribed Huffman table id in table_select
    big = dict(g1, table=16)
    with _pytest.raises(KeyError):
        build_mp3_layer3(granules=[big, g2])
    # decoder-side gate: patch table_select bits to 16 in side info
    si_patch = bytearray(blob)
    # granule0 table_select starts at bit 9+5+4+12+9+8+4+1 = 52 after
    # side-info start (byte 4): bits 52..56
    def set_bits(buf, bitpos, width, val):
        for i in range(width):
            byte = 4 + (bitpos + i) // 8
            bit = 7 - (bitpos + i) % 8
            if (val >> (width - 1 - i)) & 1:
                buf[byte] |= 1 << bit
            else:
                buf[byte] &= ~(1 << bit)
    set_bits(si_patch, 52, 5, 16)
    with _pytest.raises(NotImplementedError, match="table 16"):
        decode_mp3_layer3_spectrum(bytes(si_patch))


def test_mp4_fragmented_multi_trun_cursor():
    """A traf with MULTIPLE truns: the first sets a data offset, the
    second omits it — per §8.8.8 its data continues immediately after
    the previous run's. Handcrafted moof (the fixture writer emits
    one trun per traf by design)."""
    from ccgp_data_wrangling_spark.operators.media_codecs import (
        build_fragmented_mp4,
        mp4_sample_table,
    )

    base = build_fragmented_mp4(
        timescale=1000,
        tracks=[{"track_ID": 1, "width": 64, "height": 64,
                 "codec": "avc1", "media_timescale": 1000}],
        fragments=[{"track_ID": 1, "tfdt": 0,
                    "samples": [{"size": 30, "duration": 100, "sync": True},
                                {"size": 40, "duration": 100, "sync": False}]}],
    )
    rows1 = mp4_sample_table(base)
    assert [r["mdat_offset"] for r in rows1] == [0, 30]

    def box(typ, body):
        return (8 + len(body)).to_bytes(4, "big") + typ + body

    def full(typ, flags, body):
        return box(typ, bytes([0]) + flags.to_bytes(3, "big") + body)

    # rebuild the moof with the trun split in two; second has no
    # data-offset field -> cursor continues
    tfhd = full(b"tfhd", 0x020000, (1).to_bytes(4, "big"))
    tfdt = box(b"tfdt", bytes([1, 0, 0, 0]) + (0).to_bytes(8, "big"))
    mfhd = full(b"mfhd", 0, (1).to_bytes(4, "big"))

    def trun(n, doff, sizes):
        flags = 0x300 | (0x1 if doff is not None else 0)
        body = n.to_bytes(4, "big")
        if doff is not None:
            body += doff.to_bytes(4, "big", signed=True)
        for s in sizes:
            body += (100).to_bytes(4, "big") + s.to_bytes(4, "big")
        return full(b"trun", flags, body)

    # layout: moof size depends on trun sizes only — compute with a
    # probe, then patch the real data offset (= moof size + 8)
    def moof_with(doff):
        t1 = trun(1, doff, [30])
        t2 = trun(1, None, [40])
        return box(b"moof", mfhd + box(b"traf", tfhd + tfdt + t1 + t2))

    probe = moof_with(0)
    moof = moof_with(len(probe) + 8)
    assert len(moof) == len(probe)
    # splice: header (ftyp+moov) from the builder's file + new tail
    mdat_body = bytes(70)
    i = base.find(b"moof") - 4
    blob = base[:i] + moof + box(b"mdat", mdat_body)
    rows = mp4_sample_table(blob)
    assert [(r["sample"], r["size"], r["mdat_offset"]) for r in rows] == [
        (1, 30, 0), (2, 40, 30),
    ]
    assert [r["dts"] for r in rows] == [0, 100]


def test_ccitt_g4_roundtrip_and_modes():
    """T.6 MMR codec: round-trip over patterns that force every mode
    (pass / all seven vertical offsets / horizontal with terminating,
    makeup and extended-makeup runs), plus degenerate all-white /
    all-black rows and >2560-pixel runs chained through repeated max
    makeups."""
    import numpy as np

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_ccitt_g4,
        encode_ccitt_g4,
    )

    rng = np.random.default_rng(41)
    cases = [
        np.zeros((3, 10), bool),
        np.ones((3, 10), bool),
    ]
    bar = np.zeros((4, 16), bool)
    bar[:, 4:9] = True
    cases.append(bar)  # pure V0 after row 1
    stair = np.zeros((8, 32), bool)
    for y in range(8):
        stair[y, y : y + 9] = True  # VR/VL offsets ±1
    cases.append(stair)
    jump = np.zeros((6, 64), bool)
    for y in range(6):
        jump[y, 10 * y : 10 * y + 4] = True  # forces horizontal mode
    cases.append(jump)
    wide = np.zeros((3, 6000), bool)
    wide[:, 100:5900] = True  # extended makeups + 2560-chaining
    cases.append(wide)
    dots = np.zeros((5, 40), bool)
    dots[::2, ::2] = True  # dense change elements, pass mode
    cases.append(dots)
    for _ in range(8):  # adversarial noise
        h, w = int(rng.integers(1, 20)), int(rng.integers(1, 90))
        cases.append(rng.random((h, w)) < rng.random())
    for i, img in enumerate(cases):
        enc = encode_ccitt_g4(img)
        dec = decode_ccitt_g4(enc, img.shape[1], img.shape[0])
        assert (dec == img).all(), f"case {i}"
    # a mostly-white page compresses by orders of magnitude
    page = np.zeros((200, 1728), bool)
    page[50:60, 100:1600] = True
    assert len(encode_ccitt_g4(page)) < 200 * 1728 // 8 / 100


def test_ccitt_g4_honest_gates():
    import numpy as np
    import pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_ccitt_g4,
    )

    # the 2-D extension escape (T.6 §2.2.4) gates honestly
    with pytest.raises(NotImplementedError, match="extension"):
        decode_ccitt_g4(bytes([0b00000010, 0]), 8, 1)
    # garbage that matches no mode code fails loudly
    with pytest.raises(ValueError, match="mode code"):
        decode_ccitt_g4(bytes([0b00000000, 0]), 8, 1)


def test_tiff_g4_bilevel_roundtrip():
    """TIFF Compression=4: bilevel strips decode with an all-white
    reference at STRIP starts (TIFF 6.0 §11), in both byte orders,
    surfacing 0/255 grayscale luma."""
    import numpy as np

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_tiff,
        encode_tiff,
    )

    img = np.zeros((18, 40), bool)
    img[2:9, 5:30] = True
    img[12:17, 0:40:2] = True
    want = round(float(np.where(img, 0, 255).mean()), 4)
    for bo in ("II", "MM"):
        for rps in (None, 4, 7):
            m = decode_tiff(
                encode_tiff(
                    img, byte_order=bo, rows_per_strip=rps,
                    compression="g4",
                )
            )
            assert (
                m["width"], m["height"], m["n_channels"],
                m["bit_depth"], m["compression"], m["luma_mean"],
            ) == (40, 18, 1, 1, 4, want), (bo, rps)


def test_pdf_g4_image_extraction():
    """CCITTFaxDecode (/K -1) image XObjects: embed → extract →
    black-fraction luma; G3 (/K 0) and /EncodedByteAlign gate."""
    import numpy as np
    import pytest

    from ccgp_data_wrangling_spark.sources.pdf import (
        build_pdf,
        extract_pdf_pages,
        pdf_images,
    )

    mask = np.zeros((10, 30), bool)
    mask[2:8, 5:25] = True
    blob = build_pdf(
        [["scan caption"]], page_images=[[("g4", mask)]]
    )
    assert extract_pdf_pages(blob) == ["scan caption"]
    got = pdf_images(blob)
    want = round(float(np.where(mask, 0.0, 255.0).mean()), 4)
    assert [(g["codec"], g["width"], g["height"], g["n_channels"],
             g["luma_mean"]) for g in got] == [("g4", 30, 10, 1, want)]
    # Group 3 ONE-dimensional decodes (plain and byte-aligned rows);
    # /K > 0 carries T.4 MIXED rows (EOL + 1-D/2-D tag bit per row)
    for spec in ("g3", "g3a", "g3_2d"):
        g3got = pdf_images(
            build_pdf([["scan"]], page_images=[[(spec, mask)]])
        )
        assert [(g["codec"], g["luma_mean"]) for g in g3got] == [
            ("g3_2d" if spec == "g3_2d" else "g3", want)
        ], spec
    # a /K > 0 stream without EOL framing fails loudly, not silently
    with pytest.raises(ValueError, match="EOL"):
        pdf_images(
            build_pdf(
                [["s"]], page_images=[[("g3", mask)]]
            ).replace(b"/K 0 ", b"/K 2 ", 1)
        )
    with pytest.raises(NotImplementedError, match="EncodedByteAlign"):
        pdf_images(
            blob.replace(
                b"/K -1", b"/K -1 /EncodedByteAlign true", 1
            )
        )


def test_ccitt_g3_mixed_roundtrip():
    """T.4 §4.2 mixed one/two-dimensional G3: EOL + tag bit per row,
    1-D rows bounding each K-group, 2-D rows reusing the T.6 mode
    machinery against the previous row — TIFF Compression 3 with
    T4Options bit 0 and PDF /K > 0."""
    import numpy as np
    import pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_ccitt_g3_mixed,
        decode_tiff,
        encode_ccitt_g3_mixed,
        encode_tiff,
    )

    rng = np.random.default_rng(41)
    cases = [
        np.zeros((3, 10), bool),
        np.ones((5, 9), bool),
    ]
    a = np.zeros((9, 40), bool)
    a[:, 3:17] = True
    a[4:, 25:] = True
    cases.append(a)
    for _ in range(6):
        h, w = int(rng.integers(1, 16)), int(rng.integers(1, 100))
        cases.append(rng.random((h, w)) < rng.random())
    for k in (1, 2, 4, 8):
        for ba in (False, True):
            for i, img in enumerate(cases):
                enc = encode_ccitt_g3_mixed(img, k=k, byte_align=ba)
                dec = decode_ccitt_g3_mixed(
                    enc, img.shape[1], img.shape[0], byte_align=ba
                )
                assert (dec == img).all(), (k, ba, i)
    # the tag bits really alternate: k=4 writes a 1-D row then three
    # 2-D rows — flipping row 0's tag to 2-D must fail (no reference)
    img = cases[2]
    enc = encode_ccitt_g3_mixed(img, k=4)
    first_tag_bit = 12  # after the leading 12-bit EOL
    flipped = bytearray(enc)
    flipped[first_tag_bit // 8] &= ~(1 << (7 - first_tag_bit % 8))
    with pytest.raises(ValueError, match="first row"):
        decode_ccitt_g3_mixed(bytes(flipped), img.shape[1], img.shape[0])
    # TIFF Compression 3 + T4Options bit 0 decodes through the same
    # path, multi-strip and both fill orders
    for fo in (1, 2):
        blob = encode_tiff(
            img, compression="g3_2d", fill_order=fo, rows_per_strip=4
        )
        m = decode_tiff(blob)
        want = round(float(np.where(img, 0, 255).mean()), 4)
        assert (m["compression"], m["luma_mean"]) == (3, want), fo


def test_mp3_layer3_stereo_and_ms():
    """Two-channel Layer III: the 32-byte side-info layout parses per
    (granule, channel); plain stereo requantizes the channels
    independently; joint stereo applies the full-spectrum M/S matrix
    L=(M+S)/√2, R=(M−S)/√2 (§2.4.3.4.9.2); intensity stereo gates."""
    import math

    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        build_mp3_layer3,
        decode_mp3_layer3_spectrum,
        parse_mp3_layer3_sideinfo,
    )

    def long_g(gg, sfv, pairs, quads, **kw):
        return dict(
            global_gain=gg, scalefac_compress=9, scalefac=[sfv] * 21,
            preflag=0, scalefac_scale=0, table=3, pairs=pairs,
            quads=quads, count1table="A", **kw,
        )

    gl = long_g(160, 1, [(1, -2), (0, 2)], [(1, 0, -1, 1)])
    gr_ = long_g(150, 2, [(2, 1)], [(0, 1, 1, 0)])
    blob = build_mp3_layer3(granules=[[gl, gr_], [gl, gr_]], mode="stereo")
    si = parse_mp3_layer3_sideinfo(blob)
    assert {(s["granule"], s["channel"]) for s in si} == {
        (0, 0), (0, 1), (1, 0), (1, 1),
    }
    assert all(s["mode"] == 0 for s in si)
    rows = decode_mp3_layer3_spectrum(blob)
    assert len(rows) == 2 * 2 * 22

    def xr(v, gg, sf):
        return (abs(v) ** (4 / 3)) * 2.0 ** (0.25 * (gg - 210)) \
            * 2.0 ** (-0.5 * sf)

    vals0, vals1 = [1, -2, 0, 2], [2, 1, 0, 1]
    r0 = next(
        r for r in rows
        if (r["granule"], r["channel"], r["sfb"]) == (0, 0, 0)
    )
    assert r0["rms"] == round(
        math.sqrt(sum(xr(v, 160, 1) ** 2 for v in vals0) / 4), 6
    )
    assert r0["n_nonzero"] == 3 and r0["window"] == -1
    r1 = next(
        r for r in rows
        if (r["granule"], r["channel"], r["sfb"]) == (0, 1, 0)
    )
    assert r1["rms"] == round(
        math.sqrt(sum(xr(v, 150, 2) ** 2 for v in vals1) / 4), 6
    )

    # M/S: left channel of the matrixed output
    ms = build_mp3_layer3(granules=[[gl, gr_], [gl, gr_]], mode="joint_ms")
    mrows = decode_mp3_layer3_spectrum(ms)
    m = [xr(v, 160, 1) * (1 if v >= 0 else -1) for v in vals0]
    s_ = [xr(v, 150, 2) * (1 if v >= 0 else -1) for v in vals1]
    left = [(a + b) * 2.0 ** -0.5 for a, b in zip(m, s_)]
    rl = next(
        r for r in mrows
        if (r["granule"], r["channel"], r["sfb"]) == (0, 0, 0)
    )
    assert rl["rms"] == round(
        math.sqrt(sum(x * x for x in left) / 4), 6
    )
    # mode_extension bit 0 (intensity) now decodes — the full
    # semantics are covered in test_mp3_layer3_intensity_stereo
    patched = bytearray(ms)
    patched[3] |= 0x10
    assert len(decode_mp3_layer3_spectrum(bytes(patched))) == len(mrows)


def test_mp3_layer3_short_blocks():
    """block_type 2: short scalefactors (12 bands × 3 windows, slen1/
    slen2 halves), window-interleaved spectrum, per-window
    subblock_gain in the requant exponent, no preemphasis; scfsi over
    a short granule raises; rows carry (sfb, window) at short-band
    granularity."""
    import math

    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _L3_SFB_SHORT,
        build_mp3_layer3,
        decode_mp3_layer3_spectrum,
    )

    gsh = dict(
        global_gain=170, scalefac_compress=9,
        scalefac_short=[[1, 2, 0]] * 6 + [[0, 1, 2]] * 6,
        block_type=2, subblock_gain=[0, 1, 2], table=3,
        pairs=[(1, -1), (2, 0), (0, -2)], quads=[(1, -1, 0, 1)],
        scalefac_scale=0, count1table="A",
    )
    blob = build_mp3_layer3(granules=[gsh, gsh])
    rows = decode_mp3_layer3_spectrum(blob)
    short0 = [r for r in rows if r["granule"] == 0]
    assert len(short0) == 13 * 3  # 13 short bands × 3 windows
    assert _L3_SFB_SHORT[44100][-1] == 192
    vals = [1, -1, 2, 0, 0, -2, 1, -1, 0, 1] + [0] * 26

    def xr(v, sfw, sbg):
        return (abs(v) ** (4 / 3)) \
            * 2.0 ** (0.25 * (170 - 210 - 8 * sbg)) \
            * 2.0 ** (-0.5 * sfw)

    # band 0 (width 4) interleaves: win0 lines 0-3, win1 4-7, win2 8-11
    for win, sfw, sbg, seg in (
        (0, 1, 0, vals[0:4]), (1, 2, 1, vals[4:8]), (2, 0, 2, vals[8:12]),
    ):
        r = next(
            x for x in short0 if x["sfb"] == 0 and x["window"] == win
        )
        assert r["rms"] == round(
            math.sqrt(sum(xr(v, sfw, sbg) ** 2 for v in seg) / 4), 6
        ), win
        assert r["width"] == 4
    # scfsi over a short granule is refused by the writer (and would
    # raise in the decoder too — the spec forbids the combination)
    with _pytest.raises(ValueError, match="scfsi"):
        build_mp3_layer3(
            frames=[{"granules": [gsh, gsh], "scfsi": 8}]
        )


def test_mp3_layer3_stereo_short_reservoir_compose():
    """The three r9 features compose: a stereo stream whose granules
    mix short- and long-block channels, packed through the bit
    reservoir across two frames, decodes frame-identically."""
    from ccgp_data_wrangling_spark.operators.media_codecs import (
        build_mp3_layer3,
        decode_mp3_layer3_spectrum,
    )

    gl = dict(
        global_gain=160, scalefac_compress=9, scalefac=[1] * 21,
        preflag=0, scalefac_scale=0, table=3,
        pairs=[(1, -2), (0, 2)], quads=[(1, 0, -1, 1)],
        count1table="A",
    )
    gsh = dict(
        global_gain=170, scalefac_compress=9,
        scalefac_short=[[1, 2, 0]] * 6 + [[0, 1, 2]] * 6,
        block_type=2, subblock_gain=[0, 1, 2], table=3,
        pairs=[(1, -1)], quads=[(0, 1, 0, -1)],
        scalefac_scale=1, count1table="B",
    )
    blob = build_mp3_layer3(
        frames=[{"granules": [[gsh, gl], [gl, gsh]]}] * 2,
        bitrate_kbps=64, reservoir=True, mode="stereo",
    )
    rows = decode_mp3_layer3_spectrum(blob)
    key = lambda r: (r["granule"], r["channel"], r["sfb"], r["window"])  # noqa: E731
    f0 = sorted(
        ((key(r), r["rms"]) for r in rows if r["frame"] == 0)
    )
    f1 = sorted(
        ((key(r), r["rms"]) for r in rows if r["frame"] == 1)
    )
    assert f0 == f1 and len(f0) == 2 * (13 * 3 + 22)


def test_webm_container_walk():
    """EBML walk (RFC 8794 + Matroska): header/doctype, Info
    (timestamp scale, duration), TrackEntry fields, and per-block
    rows from both carriage forms — SimpleBlock (0x80 keyframe flag)
    and BlockGroup (keyframe = no ReferenceBlock) — with byte ranges
    verified against the actual payload bytes."""
    from ccgp_data_wrangling_spark.operators.media_codecs import (
        build_webm,
        parse_webm,
        webm_blocks,
    )

    blob = build_webm(
        tracks=[
            {"number": 1, "type": "video", "codec": "V_VP9",
             "width": 640, "height": 360},
            {"number": 2, "type": "audio", "codec": "A_OPUS"},
        ],
        clusters=[
            {"timestamp": 0, "blocks": [
                (1, 0, True, b"kf0data"), (2, 5, True, b"aud"),
                (1, 33, False, b"p1"),
            ]},
            {"timestamp": 1000, "blocks": [
                {"track": 1, "rel_ts": 0, "keyframe": True,
                 "payload": b"kf1", "group": True},
                {"track": 1, "rel_ts": 33, "keyframe": False,
                 "payload": b"p2", "group": True},
            ]},
        ],
        duration_ticks=2000.0,
    )
    m = parse_webm(blob)
    assert m["doctype"] == "webm"
    assert m["timestamp_scale"] == 1_000_000
    assert m["duration_sec"] == 2.0
    assert m["tracks"][0] == {
        "number": 1, "type": "video", "codec": "V_VP9",
        "width": 640, "height": 360,
    }
    assert m["tracks"][1]["type"] == "audio"
    rows = webm_blocks(blob)
    assert [
        (r["track"], r["cluster"], r["ts_ticks"], r["keyframe"],
         r["size"]) for r in rows
    ] == [
        (1, 0, 0, True, 7), (2, 0, 5, True, 3), (1, 0, 33, False, 2),
        (1, 1, 1000, True, 3), (1, 1, 1033, False, 2),
    ]
    # byte ranges slice the real frame payloads
    assert blob[rows[0]["offset"]:][: rows[0]["size"]] == b"kf0data"
    assert blob[rows[3]["offset"]:][: rows[3]["size"]] == b"kf1"
    assert rows[3]["time_sec"] == 1.0  # 1000 ticks × 1 ms/tick


def test_webm_honest_gates():
    import pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _EBML_IDS,
        _ebml_el,
        _ebml_encode_vint,
        build_webm,
        parse_webm,
        webm_blocks,
    )

    with pytest.raises(ValueError, match="varint"):
        parse_webm(b"\x00\x00\x00\x00")  # 0x00 first byte: >8-byte VINT
    with pytest.raises(ValueError, match="not an EBML"):
        parse_webm(_ebml_el(0x1A45DFA4, b""))  # wrong top-level id
    blob = build_webm(
        tracks=[{"number": 1, "type": "video", "codec": "V_VP8",
                 "width": 8, "height": 8}],
        clusters=[{"timestamp": 0, "blocks": [(1, 0, True, b"xy")]}],
    )
    # all three lacing modes expand to one row per frame, byte-exact
    atr = [{"number": 1, "type": "audio", "codec": "A_OPUS"}]
    for mode in ("xiph", "ebml", "fixed"):
        pls = (
            [b"a" * 10, b"b" * 10, b"c" * 10]
            if mode == "fixed"
            else [b"a" * 300, b"bb", b"c" * 7]  # >255 Xiph run, deltas
        )
        lblob = build_webm(
            tracks=atr,
            clusters=[{"timestamp": 0, "blocks": [
                {"track": 1, "rel_ts": 0, "keyframe": True,
                 "lacing": mode, "payloads": pls},
            ]}],
        )
        lrows = webm_blocks(lblob)
        assert [r["size"] for r in lrows] == [len(p) for p in pls], mode
        assert [r["lace"] for r in lrows] == [0, 1, 2]
        for r, p in zip(lrows, pls):
            assert lblob[r["offset"]:][: r["size"]] == p, mode
    # malformed lacing fails loudly: fixed split that doesn't divide
    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _webm_block_frames,
    )

    # track 0x81, rel 0, flags fixed-lacing, count byte 1 (2 frames),
    # 5 payload bytes — not divisible by 2
    bad = bytes([0x81, 0, 0, 0x04, 0x01]) + b"aaabb"
    with pytest.raises(ValueError, match="divide evenly"):
        _webm_block_frames(bad, 0, len(bad))
    # an unknown-size SEGMENT now terminates at EOF (RFC 8794 §6.2,
    # covered in test_webm_unknown_size_elements) — but unknown size
    # on an element with no schema termination still gates honestly
    unk = (
        _ebml_el(_EBML_IDS["ebml"], b"")
        + _EBML_IDS["segment"].to_bytes(4, "big") + b"\xff"
        + _EBML_IDS["tracks"].to_bytes(4, "big") + b"\xff"
    )
    with pytest.raises(NotImplementedError, match="unknown-size"):
        parse_webm(unk)
    empty_stream = (
        _ebml_el(_EBML_IDS["ebml"], b"")
        + _EBML_IDS["segment"].to_bytes(4, "big") + b"\xff"
    )
    assert parse_webm(empty_stream)["tracks"] == []
    # a child escaping its parent fails loudly
    bad = bytearray(blob)
    i = bad.find(bytes([0xA3]))  # SimpleBlock id
    bad[i + 1] = _ebml_encode_vint(200)[0]  # size beyond the cluster
    with pytest.raises(ValueError, match="escapes its parent"):
        webm_blocks(bytes(bad))


def test_ccitt_mh_and_g3_roundtrip():
    """T.4 one-dimensional (MH) codec: alternating white/black run
    codes per row (white-0 leads a black-starting row), long runs
    through makeups, EOL framing with fill bits, and byte-aligned
    rows — both PDF /K 0 framings and the TIFF Compression 2/3
    strips."""
    import numpy as np

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_ccitt_mh,
        decode_tiff,
        encode_ccitt_mh,
        encode_tiff,
    )

    rng = np.random.default_rng(13)
    cases = [
        np.zeros((3, 10), bool),
        np.ones((3, 10), bool),
    ]
    a = np.zeros((4, 20), bool)
    a[:, 0:5] = True  # black-starting rows (white-0 lead)
    cases.append(a)
    b = np.zeros((2, 5000), bool)
    b[:, 10:4900] = True  # makeup + extended-makeup runs
    cases.append(b)
    for _ in range(6):
        h, w = int(rng.integers(1, 15)), int(rng.integers(1, 90))
        cases.append(rng.random((h, w)) < rng.random())
    for ba in (False, True):
        for eol in (False, True):
            for i, img in enumerate(cases):
                enc = encode_ccitt_mh(img, byte_align=ba, eol=eol)
                dec = decode_ccitt_mh(
                    enc, img.shape[1], img.shape[0],
                    byte_align=ba, eol=eol,
                )
                assert (dec == img).all(), (ba, eol, i)
    # TIFF Compression 2 (MH RLE) and 3 (G3 + EOL) strips round-trip
    img = cases[2]
    want = round(float(np.where(img, 0, 255).mean()), 4)
    for comp, tag in (("mh", 2), ("g3", 3)):
        m = decode_tiff(
            encode_tiff(img, compression=comp, rows_per_strip=2)
        )
        assert (m["compression"], m["bit_depth"], m["luma_mean"]) == (
            tag, 1, want,
        ), comp


def test_tiff_fill_order_2():
    """FillOrder 2 (LSB-first bits within bytes — the native order of
    fax hardware, common in scanned TIFFs): CCITT strips bit-reverse
    per byte before the MSB-first walk, for all three compressions."""
    import numpy as np

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_tiff,
        encode_tiff,
    )

    img = np.zeros((12, 30), bool)
    img[3:9, 4:20] = True
    want = round(float(np.where(img, 0, 255).mean()), 4)
    for comp in ("g4", "mh", "g3"):
        blob1 = encode_tiff(img, compression=comp, fill_order=1)
        blob2 = encode_tiff(img, compression=comp, fill_order=2)
        assert blob1 != blob2  # the bits really are reversed
        for blob in (blob1, blob2):
            assert decode_tiff(blob)["luma_mean"] == want, comp


def test_mp3_layer3_mixed_blocks():
    """block_type 2 with mixed_block_flag: lines 0-35 long-coded
    (sfb 0-7 slen1 scalefactors, preemphasis applies), short
    interleave from band 3 (3·sbounds[3] == 36 at every rate), short
    tail under per-window subblock_gain; rows = 8 long + 10×3 short."""
    import math

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _L3_SFB_LONG,
        _L3_SFB_SHORT,
        build_mp3_layer3,
        decode_mp3_layer3_spectrum,
    )

    gmx = dict(
        global_gain=165, scalefac_compress=9,
        scalefac=[1, 2, 3, 0, 1, 2, 3, 0],
        scalefac_short=[[1, 0, 2]] * 3 + [[0, 1, 2]] * 6,
        block_type=2, mixed=True, subblock_gain=[0, 1, 2], table=3,
        pairs=[(1, -1)] * 20, quads=[(1, 0, -1, 1)],
        preflag=1, scalefac_scale=0, count1table="A",
    )
    rows = decode_mp3_layer3_spectrum(
        build_mp3_layer3(granules=[gmx, gmx])
    )
    g0 = [r for r in rows if r["granule"] == 0]
    assert len(g0) == 8 + 10 * 3
    bounds, sb = _L3_SFB_LONG[44100], _L3_SFB_SHORT[44100]
    pretab = [0] * 8
    vals = []
    for _ in range(20):
        vals += [1, -1]
    vals += [1, 0, -1, 1]
    vals += [0] * (576 - len(vals))
    lsf = [1, 2, 3, 0, 1, 2, 3, 0]
    ssf = [[0] * 3] * 3 + [[1, 0, 2]] * 3 + [[0, 1, 2]] * 6 + [[0] * 3]

    def xr(i):
        v = vals[i]
        sign, av = (-1 if v < 0 else 1), abs(v)
        if i < 36:
            b = next(
                b for b in range(8) if bounds[b] <= i < bounds[b + 1]
            )
            return sign * av ** (4 / 3) \
                * 2.0 ** (0.25 * (165 - 210)) \
                * 2.0 ** (-0.5 * (lsf[b] + pretab[b]))
        b = next(
            b for b in range(13) if 3 * sb[b] <= i < 3 * sb[b + 1]
        )
        ln = sb[b + 1] - sb[b]
        win = (i - 3 * sb[b]) // ln
        return sign * av ** (4 / 3) \
            * 2.0 ** (0.25 * (165 - 210 - 8 * [0, 1, 2][win])) \
            * 2.0 ** (-0.5 * ssf[b][win])

    for r in g0:
        if r["window"] == -1:
            lo, hi = bounds[r["sfb"]], bounds[r["sfb"] + 1]
        else:
            ln = sb[r["sfb"] + 1] - sb[r["sfb"]]
            lo = 3 * sb[r["sfb"]] + r["window"] * ln
            hi = lo + ln
        exp = round(
            math.sqrt(sum(xr(i) ** 2 for i in range(lo, hi)) / (hi - lo)),
            6,
        )
        assert r["rms"] == exp, r


def test_mp3_layer3_lsf_sideinfo_and_spectrum():
    """LSF (MPEG-2/2.5) Layer III: one 576-line granule per frame,
    9-byte mono side info with 8-bit main_data_begin and no scfsi, a
    9-bit scalefac_compress driving the §2.4.3.2 slen/nr_of_sfb/
    preflag derivation, and LSF band tables (13818-3 Table B.2)."""
    import pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _l3_lsf_slens,
        build_mp3_layer3,
        decode_mp3_layer3_spectrum,
        parse_mp3_layer3_sideinfo,
    )

    # §2.4.3.2 derivation branches
    assert _l3_lsf_slens(77) == ([0, 4, 3, 1], 0, 0)
    assert _l3_lsf_slens(436) == ([1, 4, 0, 0], 0, 1)
    assert _l3_lsf_slens(505) == ([1, 2, 0, 0], 1, 2)
    with pytest.raises(ValueError):
        _l3_lsf_slens(512)

    g = dict(
        global_gain=160,
        scalefac_compress=77,
        scalefac=[0] * 6
        + [i % 16 for i in range(5)]
        + [i % 8 for i in range(5)]
        + [i % 2 for i in range(5)],
        table=3,
        pairs=[(1, -2), (0, 2), (-1, 1)],
        quads=[(1, 0, -1, 1)],
        count1table="A",
        region0_count=4,
        region1_count=5,
    )
    for ver, rate, width0 in (
        ("MPEG2", 22050, 6),
        ("MPEG2", 24000, 6),
        ("MPEG2.5", 8000, 12),
    ):
        blob = build_mp3_layer3(
            granules=[g], version=ver, sample_rate=rate, bitrate_kbps=64
        )
        si = parse_mp3_layer3_sideinfo(blob)
        assert len(si) == 1
        assert si[0]["version"] == ver
        assert si[0]["n_granules"] == 1
        assert si[0]["scalefac_compress"] == 77
        assert si[0]["preflag"] == 0
        rows = decode_mp3_layer3_spectrum(blob)
        assert len(rows) == 22 and rows[0]["width"] == width0
        assert sum(r["n_nonzero"] for r in rows) == 8  # 5 pair + 3 quad

    # implied preflag: sc >= 500 requantizes WITH pretab and parses
    # preflag 1 although no bit exists; an explicit mismatch raises
    gp = dict(
        g,
        scalefac_compress=505,
        scalefac=[i % 2 for i in range(11)] + [i % 4 for i in range(10)],
        pairs=[(1, 0)] * 60,  # reach band 11+ where pretab is nonzero
        quads=[],
    )
    blob_pre = build_mp3_layer3(
        granules=[gp], version="MPEG2", sample_rate=22050, bitrate_kbps=64
    )
    assert parse_mp3_layer3_sideinfo(blob_pre)[0]["preflag"] == 1
    no_pre = decode_mp3_layer3_spectrum(blob_pre)
    # isolate the implied preemphasis: sc=500 (slens [0,0] → all
    # scalefactors zero, preflag 1) vs sc=0 (same zeros, preflag 0) —
    # any spectral difference in bands ≥ 11 is pretab alone
    pre_on = decode_mp3_layer3_spectrum(
        build_mp3_layer3(
            granules=[dict(gp, scalefac_compress=500, scalefac=[0] * 21)],
            version="MPEG2",
            sample_rate=22050,
            bitrate_kbps=64,
        )
    )
    pre_off = decode_mp3_layer3_spectrum(
        build_mp3_layer3(
            granules=[dict(gp, scalefac_compress=0, scalefac=[0] * 21)],
            version="MPEG2",
            sample_rate=22050,
            bitrate_kbps=64,
        )
    )
    assert no_pre[12]["rms"] != pre_on[12]["rms"]  # scalefactors act
    assert [r["rms"] for r in pre_on[:11]] == [
        r["rms"] for r in pre_off[:11]
    ]
    assert pre_on[12]["rms"] < pre_off[12]["rms"]  # pretab attenuates
    with pytest.raises(ValueError, match="implied"):
        build_mp3_layer3(
            granules=[dict(gp, preflag=0)],
            version="MPEG2",
            sample_rate=22050,
            bitrate_kbps=64,
        )

    # LSF frames carry exactly one granule; scfsi does not exist
    with pytest.raises(ValueError, match="1 granule"):
        build_mp3_layer3(
            granules=[g, g], version="MPEG2", sample_rate=22050,
            bitrate_kbps=64,
        )
    with pytest.raises(ValueError, match="scfsi"):
        build_mp3_layer3(
            frames=[{"granules": [g], "scfsi": 8}],
            version="MPEG2.5",
            sample_rate=8000,
            bitrate_kbps=32,
        )


def test_mp3_layer3_lsf_short_mixed_and_reservoir():
    """LSF short/mixed blocks use the nr_of_sfb group partition (9/9/
    9/9 and 6/9/9/9 for blocktypenumber 0) and a 6-band long head;
    the 8-bit reservoir packs across frames like MPEG-1's 9-bit one."""
    import pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        build_mp3_layer3,
        decode_mp3_layer3_spectrum,
        parse_mp3_layer3_sideinfo,
    )

    gs = dict(
        global_gain=170,
        scalefac_compress=36,  # slens [0,2,1,0], blocktypenumber 0
        block_type=2,
        scalefac_short=[[0] * 3] * 3
        + [[(b + w) % 4 for w in range(3)] for b in range(3)]
        + [[(b * w) % 2 for w in range(3)] for b in range(3)]
        + [[0] * 3] * 3,
        subblock_gain=[0, 1, 2],
        table=2,
        pairs=[(1, 2), (2, 0)],
        quads=[(0, 1, 1, 0)],
        count1table="B",
    )
    rows = decode_mp3_layer3_spectrum(
        build_mp3_layer3(
            granules=[gs], version="MPEG2", sample_rate=24000,
            bitrate_kbps=64,
        )
    )
    assert len(rows) == 39  # 13 bands × 3 windows
    assert {r["window"] for r in rows} == {0, 1, 2}

    gm = dict(
        global_gain=165,
        scalefac_compress=36,
        block_type=2,
        mixed=True,
        scalefac=[0] * 6,  # 6-band long head (MPEG-1 mixed has 8)
        scalefac_short=[[(b + w) % 2 for w in range(3)] for b in range(6)]
        + [[0] * 3] * 3,
        subblock_gain=[1, 0, 1],
        table=3,
        pairs=[(2, 1), (0, -2), (1, 1)],
        quads=[],
        count1table="A",
    )
    rows = decode_mp3_layer3_spectrum(
        build_mp3_layer3(
            granules=[gm], version="MPEG2.5", sample_rate=8000,
            bitrate_kbps=32,
        )
    )
    # 6 long head bands (window −1) + bands 3-12 × 3 windows
    assert len(rows) == 36
    assert sum(1 for r in rows if r["window"] == -1) == 6
    with pytest.raises(ValueError, match="6 long"):
        build_mp3_layer3(
            granules=[dict(gm, scalefac=[0] * 8)],
            version="MPEG2.5",
            sample_rate=8000,
            bitrate_kbps=32,
        )

    # two-channel LSF joint MS through the 8-bit reservoir: packed ≡
    # flat spectra, nonzero main_data_begin actually exercised
    gl = dict(
        global_gain=160, scalefac_compress=0, scalefac=[0] * 21,
        table=3, pairs=[(1, 1), (2, -1)], quads=[], count1table="A",
        region0_count=4, region1_count=4,
    )
    gr_ = dict(gl, pairs=[(1, -1), (0, 2)])
    packed = build_mp3_layer3(
        frames=[{"granules": [[gl, gr_]]}] * 3,
        version="MPEG2",
        sample_rate=22050,
        bitrate_kbps=16,
        mode="joint_ms",
        reservoir=True,
    )
    flat = build_mp3_layer3(
        frames=[{"granules": [[gl, gr_]]}] * 3,
        version="MPEG2",
        sample_rate=22050,
        bitrate_kbps=16,
        mode="joint_ms",
    )
    si = parse_mp3_layer3_sideinfo(packed)
    assert any(s["main_data_begin"] for s in si)

    def strip(rows):
        return [tuple(sorted(r.items())) for r in rows]

    assert strip(decode_mp3_layer3_spectrum(packed)) == strip(
        decode_mp3_layer3_spectrum(flat)
    )


def test_mp3_layer3_intensity_stereo():
    """§2.4.3.4.9.3: bands in the right channel's zero part split the
    carrier by tan(is_pos·π/12); is_pos 7 is forbidden and falls back
    to M/S (mode_extension 3) or plain L/R (mode_extension 1)."""
    import math

    import pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        build_mp3_layer3,
        decode_mp3_layer3_spectrum,
    )

    # left: 25 pairs reach band 9; right: 3 pairs end inside band 2,
    # so bands ≥ 3 are intensity-coded with is_pos from its scalefacs
    gl = dict(
        global_gain=160, scalefac_compress=9,
        scalefac=[b % 4 for b in range(21)], preflag=0,
        scalefac_scale=0, table=3,
        pairs=[(1, -1)] * 25, quads=[], count1table="A",
        region0_count=4, region1_count=5,
    )
    is_pos = [0, 0, 0, 0, 3, 6, 7, 1, 2, 4, 5] + [0] * 10
    gr_ = dict(
        gl,
        scalefac_compress=13,  # slens (3,3): values up to 7
        scalefac=is_pos,
        pairs=[(1, -1), (0, 2), (1, 0)],
    )
    rows = decode_mp3_layer3_spectrum(
        build_mp3_layer3(granules=[[gl, gr_], [gl, gr_]], mode="joint_is")
    )
    by = {
        (r["granule"], r["channel"], r["sfb"]): r
        for r in rows if r["frame"] == 0
    }

    def carrier_rms(sfb, lo, hi):
        # left channel's own requantized band RMS (plain L/R would
        # emit exactly this on channel 0)
        plain = decode_mp3_layer3_spectrum(
            build_mp3_layer3(granules=[[gl, gr_], [gl, gr_]], mode="stereo")
        )
        return [
            r for r in plain
            if r["frame"] == 0 and r["granule"] == 0
            and r["channel"] == 0 and r["sfb"] == sfb
        ][0]["rms"]

    # is_pos 3 → ratio 1: both channels get xr/2 → equal rms
    assert by[(0, 0, 4)]["rms"] == by[(0, 1, 4)]["rms"] > 0
    # is_pos 0 → ratio 0: all energy to the RIGHT channel
    assert by[(0, 0, 3)]["rms"] == 0.0 and by[(0, 1, 3)]["rms"] > 0
    # is_pos 6 → ratio tan(π/2): numerically all energy LEFT
    assert by[(0, 0, 5)]["rms"] > 0
    assert by[(0, 1, 5)]["rms"] == 0.0  # 6e-17·xr rounds to 0 at 6 dp
    # forbidden is_pos 7 (band 6): joint_is keeps plain L/R — right
    # channel has no data there, left keeps its carrier energy
    assert by[(0, 0, 6)]["rms"] == pytest.approx(
        carrier_rms(6, 24, 30), abs=1e-6
    )
    assert by[(0, 1, 6)]["rms"] == 0.0
    # ratio algebra on is_pos 4: L/R = tan(4π/12) (rms is rounded to
    # 6 dp at ~1e-4 magnitude, so only ~2 significant digits survive)
    l_, r_ = by[(0, 0, 9)]["rms"], by[(0, 1, 9)]["rms"]
    assert l_ / r_ == pytest.approx(math.tan(4 * math.pi / 12), rel=0.05)

    # mode_extension 3: is_pos-7 band now M/S-matrixes instead
    rows_ms = decode_mp3_layer3_spectrum(
        build_mp3_layer3(
            granules=[[gl, gr_], [gl, gr_]], mode="joint_is_ms"
        )
    )
    by_ms = {
        (r["granule"], r["channel"], r["sfb"]): r
        for r in rows_ms if r["frame"] == 0
    }
    ms_expected = carrier_rms(6, 24, 30) * 2 ** -0.5
    assert by_ms[(0, 0, 6)]["rms"] == pytest.approx(ms_expected, abs=1e-6)
    assert by_ms[(0, 1, 6)]["rms"] == pytest.approx(ms_expected, abs=1e-6)
    # intensity bands identical under both joint modes
    assert by_ms[(0, 0, 9)]["rms"] == by[(0, 0, 9)]["rms"]

    # window-switched granules gate honestly
    gshort = dict(
        global_gain=160, scalefac_compress=0, block_type=2,
        scalefac_short=[[0] * 3] * 12, subblock_gain=[0, 0, 0],
        table=3, pairs=[(1, 1)], quads=[], count1table="A",
    )
    with pytest.raises(NotImplementedError, match="intensity"):
        decode_mp3_layer3_spectrum(
            build_mp3_layer3(
                granules=[[gshort, gshort], [gshort, gshort]],
                mode="joint_is",
            )
        )
    # LSF intensity stereo (ISO 13818-3 §2.4.3.2): the intensity
    # channel's scalefac_compress LSB is intensity_scale (io base);
    # int_sfc = sc>>1 = 126 → slens (3,3,0,0), btn 3 → long groups
    # (7,7,7,0); odd positions scale LEFT by io^((p+1)/2), even ones
    # RIGHT by io^(p/2); all-ones of the band's slen (7) is illegal
    gl_lsf = dict(
        global_gain=160, scalefac_compress=77,  # slens [0,4,3,1]
        scalefac=[0] * 6 + [i % 16 for i in range(5)]
        + [i % 8 for i in range(5)] + [i % 2 for i in range(5)],
        scalefac_scale=0, table=3,
        pairs=[(1, -1)] * 25, quads=[], count1table="A",
        region0_count=4, region1_count=5,
    )
    lsf_pos = [0, 0, 3, 6, 7, 1, 2, 4, 0, 0, 0, 0, 0, 0] + [0] * 7
    for int_scale in (0, 1):
        gr_lsf = dict(
            gl_lsf,
            scalefac_compress=252 + int_scale,
            scalefac=lsf_pos,
            pairs=[(1, -1), (0, 2), (1, 0)],  # 6 lines → band 0 only
        )
        rows_lsf = decode_mp3_layer3_spectrum(
            build_mp3_layer3(
                granules=[[gl_lsf, gr_lsf]], version="MPEG2",
                sample_rate=22050, bitrate_kbps=64, mode="joint_is_ms",
            )
        )
        carrier = decode_mp3_layer3_spectrum(
            build_mp3_layer3(
                granules=[[gl_lsf, gl_lsf]], version="MPEG2",
                sample_rate=22050, bitrate_kbps=64, mode="stereo",
            )
        )
        c = {
            r["sfb"]: r["rms"] for r in carrier if r["channel"] == 0
        }
        bl = {
            (r["channel"], r["sfb"]): r["rms"] for r in rows_lsf
        }
        io = 2.0 ** (-0.25 * (int_scale + 1))
        # p = 0 (band 1): both channels pass the carrier at unity
        assert bl[(0, 1)] == pytest.approx(c[1], abs=1e-6)
        assert bl[(1, 1)] == pytest.approx(c[1], abs=1e-6)
        # p = 3 (band 2, odd): left = io^2 · carrier, right = carrier
        assert bl[(0, 2)] == pytest.approx(c[2] * io ** 2, abs=1e-6)
        assert bl[(1, 2)] == pytest.approx(c[2], abs=1e-6)
        # p = 6 (band 3, even): right = io^3 · carrier, left = carrier
        assert bl[(0, 3)] == pytest.approx(c[3], abs=1e-6)
        assert bl[(1, 3)] == pytest.approx(c[3] * io ** 3, abs=1e-6)
        # p = 7 = (1<<3)-1 (band 4): illegal → falls back to M/S
        ms = c[4] * 2 ** -0.5
        assert bl[(0, 4)] == pytest.approx(ms, abs=1e-6)
        assert bl[(1, 4)] == pytest.approx(ms, abs=1e-6)
        # p = 1 (band 5, odd): left = io · carrier
        assert bl[(0, 5)] == pytest.approx(c[5] * io, abs=1e-6)
        assert bl[(1, 5)] == pytest.approx(c[5], abs=1e-6)
    # the io ladder differs between the two intensity_scale readings
    assert 2.0 ** -0.25 != 2.0 ** -0.5


def test_webm_unknown_size_elements():
    """RFC 8794 §6.2: a live-remuxed WebM writes an unknown-size
    Segment (all-ones size) ended by EOF and often unknown-size
    Clusters ended by the next non-child element; the walk must
    produce the same block rows as the sized layout. Unknown size
    anywhere else still gates."""
    import pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        build_webm,
        parse_webm,
        webm_blocks,
    )

    tracks = [
        {
            "number": 1, "type": "video", "codec": "V_VP9",
            "width": 640, "height": 360,
        },
        {"number": 2, "type": "audio", "codec": "A_OPUS"},
    ]
    clusters = [
        {
            "timestamp": 0,
            "blocks": [(1, 0, True, b"abcdef"), (2, 5, False, b"xy")],
        },
        {
            "timestamp": 1000,
            "blocks": [
                {
                    "track": 1, "rel_ts": 2, "keyframe": False,
                    "group": True, "payload": b"ppp",
                },
                (1, 9, True, b"qrstu"),
                {
                    "track": 1, "rel_ts": 20, "keyframe": True,
                    "lacing": "xiph", "payloads": [b"aa", b"bbb", b"c"],
                },
            ],
        },
    ]

    def rows_no_offset(blob):
        return [
            {k: v for k, v in r.items() if k != "offset"}
            for r in webm_blocks(blob)
        ]

    sized = build_webm(tracks=tracks, clusters=clusters, duration_ticks=2e3)
    want = rows_no_offset(sized)
    assert len(want) == 7  # 2 + (1 group + 1 simple + 3 laced)
    for kw in (
        {"unknown_size_segment": True},
        {"unknown_size_clusters": True},
        {"unknown_size_segment": True, "unknown_size_clusters": True},
    ):
        blob = build_webm(
            tracks=tracks, clusters=clusters, duration_ticks=2e3, **kw
        )
        assert parse_webm(blob)["tracks"] == parse_webm(sized)["tracks"]
        assert rows_no_offset(blob) == want, kw
        # byte ranges still verified in-file by webm_blocks itself

    # an unknown-size element that is neither Segment nor Cluster
    # has no schema termination here — honest gate
    bad = bytearray(
        build_webm(tracks=tracks, clusters=clusters, duration_ticks=2e3)
    )
    # rewrite the Tracks element's size vint (4-byte id 0x1654AE6B)
    idx = bytes(bad).find(bytes.fromhex("1654AE6B"))
    assert idx > 0
    size_w = 9 - bad[idx + 4].bit_length()
    assert size_w == 1
    saved = bad[idx + 4]
    bad[idx + 4] = 0xFF
    # keep total length parseable: an unknown-size Tracks must raise
    with pytest.raises(NotImplementedError, match="unknown-size"):
        webm_blocks(bytes(bad))
    bad[idx + 4] = saved
    assert rows_no_offset(bytes(bad)) == want


def test_mp3_layer2_subband_decode():
    """Layer II dequantization against independently-computed spec
    formulas: grouped 3/5/9-level degrouping, scfsi scalefactor
    sharing across the three 12-sample parts, table selection, and
    honest gates."""
    import math

    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _l2_select_table,
        build_mp3_layer2,
        decode_mp3_layer2_subbands,
    )

    # table selection (§2.4.2.6)
    assert _l2_select_table(44100, 48) == "c"
    assert _l2_select_table(32000, 32) == "d"
    assert _l2_select_table(44100, 64) == "a"
    assert _l2_select_table(48000, 128) == "a"
    assert _l2_select_table(44100, 128) == "b"
    assert _l2_select_table(32000, 96) == "b"
    with _pytest.raises(ValueError, match="per-channel bitrate"):
        _l2_select_table(44100, 224)

    # 96 kbps @ 44.1 kHz mono → table b, sblimit 30
    alloc = [0] * 30
    alloc[0] = 1   # steps 3 (grouped, k=2)
    alloc[1] = 3   # steps 15 (ungrouped, k=4)
    alloc[3] = 2   # steps 5 (grouped, k=3)
    alloc[23] = 2  # steps 5 (grouped)
    scfsi = [0] * 30
    scfsi[0], scfsi[1], scfsi[3], scfsi[23] = 0, 1, 2, 3
    scf_sent = {0: [0, 3, 6], 1: [6, 9], 3: [12], 23: [0, 3]}
    steps_of = {0: 3, 1: 15, 3: 5, 23: 5}

    def codes(t, sb):
        return (t * (sb + 1) + 1) % steps_of[sb]

    blob = build_mp3_layer2(
        sample_rate=44100, bitrate_kbps=96,
        alloc_idx=alloc, scfsi=scfsi,
        scf_idx=lambda sb, j: scf_sent[sb][j],
        codes=codes, n_frames=2,
    )
    rows = decode_mp3_layer2_subbands(blob)
    assert [(r["frame"], r["subband"]) for r in rows] == [
        (0, 0), (0, 1), (0, 3), (0, 23),
        (1, 0), (1, 1), (1, 3), (1, 23),
    ]
    assert [r["steps"] for r in rows[:4]] == [3, 15, 5, 5]
    assert [r["scfsi"] for r in rows[:4]] == [0, 1, 2, 3]

    parts = {0: (0, 1, 2), 1: (0, 0, 1), 2: (0, 0, 0), 3: (0, 1, 1)}

    def ref_rms(sb):
        steps = steps_of[sb]
        grouped = steps in (3, 5, 9)
        k = {3: 2, 5: 3, 9: 4, 15: 4}[steps]
        d = 0.5 if grouped else 2.0 ** (1 - k)
        acc = 0.0
        for t in range(36):
            idx = scf_sent[sb][parts[scfsi[sb]][t // 12]]
            sf = (2.0 * 2.0 ** (-(idx // 3)) if idx % 3 == 0
                  else 2.0 * 2.0 ** (-idx / 3.0))
            s = codes(t, sb)
            x = sf * ((2.0**k / steps) * (s / 2.0 ** (k - 1) - 1 + d))
            acc += x * x
        return round(math.sqrt(acc / 36.0), 6)

    for r in rows[:4]:
        assert r["rms"] == ref_rms(r["subband"]), r

    # low-rate table c path round-trips too
    alloc_c = [0] * 8
    alloc_c[0], alloc_c[7] = 1, 7  # steps 5 grouped / 127 ungrouped
    blob_c = build_mp3_layer2(
        sample_rate=44100, bitrate_kbps=48,
        alloc_idx=alloc_c, scfsi=[0] * 8,
        scf_idx=lambda sb, j: 3 * j,
        codes=lambda t, sb: (t + sb) % (5 if sb == 0 else 127),
    )
    rows_c = decode_mp3_layer2_subbands(blob_c)
    assert [(r["subband"], r["steps"]) for r in rows_c] == [
        (0, 5), (7, 127),
    ]

    # honest gates
    from ccgp_data_wrangling_spark.operators.media_codecs import (
        build_mp3,
        build_mp3_layer1,
    )

    with _pytest.raises(NotImplementedError, match="Layer II only"):
        decode_mp3_layer2_subbands(build_mp3(n_frames=1))
    with _pytest.raises(NotImplementedError, match="Layer II only"):
        decode_mp3_layer2_subbands(
            build_mp3_layer1(
                alloc=[0] * 32, scf_idx=[0] * 32, codes=lambda t, sb: 0
            )
        )
    # stereo DECODES now (r12): re-tagging the 96 kbps mono frame as
    # stereo makes 48 kbps/channel select the 8-band table 3-B.2c,
    # so the mono payload misparses instead of gating
    stereo = bytearray(blob)
    stereo[3] &= 0b00111111
    with _pytest.raises(ValueError):
        decode_mp3_layer2_subbands(bytes(stereo))
    with _pytest.raises(ValueError, match="must cover sblimit"):
        build_mp3_layer2(
            sample_rate=44100, bitrate_kbps=96,
            alloc_idx=[0] * 8, scfsi=[0] * 8,
            scf_idx=lambda sb, j: 0, codes=lambda t, sb: 0,
        )
    with _pytest.raises(ValueError, match="out of range"):
        build_mp3_layer2(
            sample_rate=44100, bitrate_kbps=96,
            alloc_idx=alloc, scfsi=scfsi,
            scf_idx=lambda sb, j: scf_sent[sb][j],
            codes=lambda t, sb: steps_of[sb],  # == steps: invalid
        )


def test_mp3_layer2_reserved_scalefactor_rejected():
    # ISO 11172-3 Table 3-B.1: scalefactor index 63 is reserved. The
    # encoder refuses to emit it, so bit-patch the first transmitted
    # scalefactor of an otherwise-valid frame to 63 (r11 ADVICE fix).
    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _L2_TABLES,
        _l2_select_table,
        build_mp3_layer2,
        decode_mp3_layer2_subbands,
    )

    table = _l2_select_table(44100, 96)
    rows = _L2_TABLES[table]
    sblimit = len(rows)
    alloc = [1] + [0] * (sblimit - 1)
    blob = bytearray(
        build_mp3_layer2(
            sample_rate=44100,
            bitrate_kbps=96,
            alloc_idx=alloc,
            scfsi=[2] + [0] * (sblimit - 1),
            scf_idx=lambda sb, j: 10,
            codes=lambda t, sb: 1,
        )
    )
    # bit offset of the first 6-bit scalefactor: 32 header bits +
    # all allocation fields + one 2-bit scfsi
    off = 32 + sum(nbal for nbal, _ in rows) + 2
    for i in range(6):
        b, bit = divmod(off + i, 8)
        blob[b] |= 0x80 >> bit  # 63 = all ones
    with _pytest.raises(ValueError, match="reserved"):
        decode_mp3_layer2_subbands(bytes(blob))


def test_mp3_layer2_stereo_modes():
    # r12: stereo / dual / joint (intensity) and MPEG-2 LSF Layer II.
    import math

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _L2_TABLES,
        build_mp3_layer2,
        decode_mp3_layer2_subbands,
    )

    # stereo MPEG-1: channel-interleaved fields, independent alloc
    sbl = len(_L2_TABLES["a"])  # 128 kbps stereo -> 64/ch -> table a
    a0 = [0] * sbl
    a1 = [0] * sbl
    a0[0], a0[5] = 3, 1
    a1[0], a1[7] = 2, 1
    blob = build_mp3_layer2(
        sample_rate=44100, bitrate_kbps=128, mode="stereo",
        alloc_idx=[a0, a1],
        scfsi=[[2 if a else 0 for a in a0], [0] * sbl],
        scf_idx=lambda ch, sb, j: 3 * (ch + 1) + sb + j,
        codes=lambda ch, t, sb: (t + sb + ch) % 3,
    )
    rows = decode_mp3_layer2_subbands(blob)
    assert [(r["channel"], r["subband"], r["steps"]) for r in rows] == [
        (0, 0, 15), (1, 0, 7), (0, 5, 3), (1, 7, 3),
    ]

    # joint stereo: above bound=8 (mode_ext=1) codes are SHARED and
    # each channel applies its own scalefactor — with scf indices 3
    # apart the rms ratio is exactly 2 (sf halves every 3 indices)
    aj0 = [0] * sbl
    aj1 = [0] * sbl
    aj0[2] = 1
    aj1[3] = 1
    aj0[10] = aj1[10] = 1
    blob = build_mp3_layer2(
        sample_rate=44100, bitrate_kbps=128, mode="joint", mode_ext=1,
        alloc_idx=[aj0, aj1], scfsi=[[0] * sbl, [0] * sbl],
        scf_idx=lambda ch, sb, j: 9 + 3 * ch,
        codes=lambda ch, t, sb: (t + sb + ch) % 3,
    )
    rows = decode_mp3_layer2_subbands(blob)
    r10 = {r["channel"]: r["rms"] for r in rows if r["subband"] == 10}
    assert math.isclose(r10[0] / r10[1], 2.0, rel_tol=1e-4)
    # below the bound the channels are independent
    assert {(r["channel"], r["subband"]) for r in rows} == {
        (0, 2), (1, 3), (0, 10), (1, 10),
    }

    # joint stereo requires equal allocation above the bound
    bad1 = [0] * sbl
    bad2 = [0] * sbl
    bad1[10], bad2[10] = 1, 2
    with pytest.raises(ValueError, match="equal allocation"):
        build_mp3_layer2(
            sample_rate=44100, bitrate_kbps=128, mode="joint",
            mode_ext=1, alloc_idx=[bad1, bad2],
            scfsi=[[0] * sbl, [0] * sbl],
            scf_idx=lambda ch, sb, j: 0,
            codes=lambda ch, t, sb: 0,
        )

    # MPEG-2 LSF dual channel: single 13818-3 table, sblimit 30,
    # 144-coefficient frame length, multi-frame walk
    sbl = len(_L2_TABLES["lsf"])
    assert sbl == 30
    l0 = [0] * sbl
    l1 = [0] * sbl
    l0[0], l0[6], l0[20] = 5, 2, 1
    l1[0], l1[6], l1[20] = 4, 2, 2
    blob = build_mp3_layer2(
        sample_rate=22050, bitrate_kbps=64, version="MPEG2",
        mode="dual",
        alloc_idx=[l0, l1],
        scfsi=[[3 if a else 0 for a in l0],
               [1 if a else 0 for a in l1]],
        scf_idx=lambda ch, sb, j: 12 + ch + sb + j,
        codes=lambda ch, t, sb: (t * (sb + 1) + ch) % 3,
        n_frames=2,
    )
    rows = decode_mp3_layer2_subbands(blob)
    assert sorted({r["frame"] for r in rows}) == [0, 1]
    assert len(rows) == 12
    got = {
        (r["channel"], r["subband"]): r["steps"]
        for r in rows if r["frame"] == 0
    }
    assert got == {
        (0, 0): 15, (1, 0): 9, (0, 6): 5, (1, 6): 5,
        (0, 20): 3, (1, 20): 5,
    }

    # LSF mono also decodes (single table regardless of bitrate)
    lm = [0] * sbl
    lm[4] = 1
    blob = build_mp3_layer2(
        sample_rate=24000, bitrate_kbps=32, version="MPEG2",
        alloc_idx=lm, scfsi=[0] * sbl,
        scf_idx=lambda sb, j: 20, codes=lambda t, sb: t % 3,
    )
    rows = decode_mp3_layer2_subbands(blob)
    assert [(r["channel"], r["subband"], r["steps"]) for r in rows] == [
        (0, 4, 3)
    ]


def test_tiff_lzw_final_code_on_width_boundary():
    # r12 regression: the decoder adds a table entry for the FINAL
    # data code before reading EOI, so the encoder must early-change
    # with next_code + 1 at flush. 253 incompressible bytes put the
    # final code exactly on the 511 (9->10 bit) boundary; the old
    # encoder emitted EOI at 9 bits and the stream desynced.
    import numpy as np

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    rng = np.random.default_rng(1234)
    for n in (252, 253, 254, 764, 765, 766, 1788, 1789, 1790):
        b = bytes(rng.integers(0, 256, n).astype(np.uint8))
        assert _tiff_lzw_decode(_tiff_lzw_encode(b)) == b, n


def test_tiff_tiled_organization():
    # TIFF 6.0 §15: TileWidth/TileLength/TileOffsets/TileByteCounts;
    # edge tiles padded to full extent, each tile an independent
    # compression block (predictor included).
    import numpy as np
    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_tiff,
        encode_tiff,
    )

    rng = np.random.default_rng(77)
    px = rng.integers(0, 256, (33, 47, 3)).astype(np.uint8)
    exp = [
        round(float(m), 4)
        for m in px.astype(np.float64).mean(axis=(0, 1))
    ]
    for comp in ("none", "lzw", "deflate", "packbits"):
        for pred in (1, 2):
            t = decode_tiff(
                encode_tiff(
                    px, compression=comp, predictor=pred,
                    tile_wh=(16, 16), byte_order="MM",
                )
            )
            assert t["tiled"] and t["channel_means"] == exp, (
                comp, pred,
            )
    # 16-bit tiled
    px16 = rng.integers(0, 65536, (20, 34)).astype(np.uint16)
    t = decode_tiff(
        encode_tiff(px16, compression="deflate", predictor=2,
                    tile_wh=(16, 16))
    )
    assert t["channel_means"] == [
        round(float(px16.astype(np.float64).mean()), 4)
    ]
    # bilevel CCITT tiles
    mask = rng.random((45, 70)) < 0.3
    lum = round(float(np.where(mask, 0, 255).mean()), 4)
    for comp in ("g4", "mh", "g3", "g3_2d"):
        t = decode_tiff(
            encode_tiff(mask, compression=comp, tile_wh=(32, 16),
                        fill_order=2)
        )
        assert t["tiled"] and t["luma_mean"] == lum, comp
    # validation: non-multiple-of-16 tile dims; strips+tiles clash
    with _pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff(px, tile_wh=(20, 16))
    with _pytest.raises(ValueError, match="exclusive"):
        encode_tiff(px, tile_wh=(16, 16), rows_per_strip=8)
    blob = bytearray(encode_tiff(px, tile_wh=(16, 16)))
    # flip TileWidth tag 0x0142 to 0x0111 (StripOffsets) -> both
    # organizations present -> rejected
    idx = blob.find((0x0142).to_bytes(2, "little"))
    blob[idx : idx + 2] = (0x0111).to_bytes(2, "little")
    with _pytest.raises(ValueError, match="both strip and tile"):
        decode_tiff(bytes(blob))
    # r13 regression: short TileByteCounts must error, not let zip()
    # silently decode the missing tiles as all-zero blocks — patch the
    # 0x0145 IFD entry's count dword (tag 2 + type 2, count at +4)
    blob = bytearray(encode_tiff(px, tile_wh=(16, 16)))
    idx = blob.find((0x0145).to_bytes(2, "little"))
    n_tiles = int.from_bytes(blob[idx + 4 : idx + 8], "little")
    assert n_tiles == 9  # ceil(47/16) * ceil(33/16)
    blob[idx + 4 : idx + 8] = (n_tiles - 1).to_bytes(4, "little")
    with _pytest.raises(ValueError, match="TileByteCounts"):
        decode_tiff(bytes(blob))
    # a tile organization missing TileWidth is a clear ValueError,
    # never a KeyError — retag 0x0142 to an unknown private tag
    blob = bytearray(encode_tiff(px, tile_wh=(16, 16)))
    idx = blob.find((0x0142).to_bytes(2, "little"))
    blob[idx : idx + 2] = (0x9999).to_bytes(2, "little")
    with _pytest.raises(ValueError, match="missing one of"):
        decode_tiff(bytes(blob))


def test_mp3_layer2_free_format():
    # ISO 11172-3 §2.4.2.3: bitrate index 0 = free format. The frame
    # length comes from scanning for the next matching sync (last
    # frame runs to the stream end) and the quantization table from
    # the implied bitrate — decode must equal the standard-header
    # twin bit for bit.
    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _L2_TABLES,
        build_mp3_layer2,
        decode_mp3_layer2_subbands,
    )

    sbl = len(_L2_TABLES["b"])
    alloc = [0] * sbl
    alloc[0], alloc[3] = 1, 2
    kw = dict(
        sample_rate=44100, bitrate_kbps=96, alloc_idx=alloc,
        scfsi=[1 if a else 0 for a in alloc],
        scf_idx=lambda sb, j: 6 + sb + j,
        codes=lambda t, sb: (t + sb) % 3, n_frames=3,
    )
    std = decode_mp3_layer2_subbands(build_mp3_layer2(**kw))
    ff_blob = build_mp3_layer2(**kw, free_format=True)
    ff = decode_mp3_layer2_subbands(ff_blob)
    assert std == ff and len(ff) == 6
    # r13 regression: a FALSE sync inside the sample-code bytes (4
    # bytes that replicate the header) must not truncate the frame —
    # the scanner requires a second consistent sync one frame length
    # on before accepting a candidate. Only frame 0's codes are
    # corrupted; framing and the later frames survive.
    frame_len = len(ff_blob) // 3
    assert frame_len * 3 == len(ff_blob)
    bad = bytearray(ff_blob)
    at = frame_len - 8  # inside frame 0's sample codes
    bad[at : at + 4] = ff_blob[:4]
    got = decode_mp3_layer2_subbands(bytes(bad))
    assert len(got) == len(std)
    per_frame = len(std) // 3
    assert got[per_frame:] == std[per_frame:]


def test_tiff_planar_configuration_2():
    # PlanarConfiguration 2: all plane-0 strips first; horizontal
    # differencing applies per plane
    import numpy as np
    import pytest as _pytest

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        decode_tiff,
        encode_tiff,
    )

    rng = np.random.default_rng(91)
    px = rng.integers(0, 256, (33, 47, 3)).astype(np.uint8)
    exp = [
        round(float(m), 4)
        for m in px.astype(np.float64).mean(axis=(0, 1))
    ]
    for comp in ("none", "lzw", "deflate", "packbits"):
        for pred in (1, 2):
            t = decode_tiff(encode_tiff(
                px, compression=comp, predictor=pred, planar=2,
                rows_per_strip=8, byte_order="MM",
            ))
            assert t["channel_means"] == exp, (comp, pred)
    # 16-bit planar
    px16 = rng.integers(0, 65536, (20, 34, 3)).astype(np.uint16)
    t = decode_tiff(encode_tiff(px16, compression="deflate",
                                predictor=2, planar=2,
                                rows_per_strip=6))
    assert t["channel_means"] == [
        round(float(m), 4)
        for m in px16.astype(np.float64).mean(axis=(0, 1))
    ]
    with _pytest.raises(ValueError, match="multiple channels"):
        encode_tiff(px[..., 0], planar=2)
    with _pytest.raises(ValueError, match="strip organization"):
        encode_tiff(px, planar=2, tile_wh=(16, 16))


def test_tiff_jpeg_compression_7():
    # new-style JPEG-in-TIFF (TechNote 2): per-strip/tile interchange
    # streams, optionally abbreviated via the JPEGTables tag
    import numpy as np

    from ccgp_data_wrangling_spark.operators.media_codecs import (
        _decode_jpeg_pixels,
        decode_tiff,
        encode_jpeg,
        encode_tiff,
    )

    rng = np.random.default_rng(93)
    # flat gray: no color transform, all-ones quant -> exact
    flat = np.full((24, 40), 137, np.uint8)
    for tables in (False, True):
        t = decode_tiff(encode_tiff(flat, compression="jpeg",
                                    rows_per_strip=8,
                                    jpeg_tables=tables))
        assert t["compression"] == 7
        assert t["channel_means"] == [137.0], tables
    # RGB strips: exact consistency with the JPEG layer per strip
    px = rng.integers(0, 256, (33, 47, 3)).astype(np.uint8)
    for tables in (False, True):
        t = decode_tiff(encode_tiff(px, compression="jpeg",
                                    rows_per_strip=8,
                                    jpeg_tables=tables))
        acc = np.zeros((33, 47, 3))
        for r in range(0, 33, 8):
            blk = _decode_jpeg_pixels(encode_jpeg(px[r:r + 8]))
            acc[r:r + blk.shape[0]] = blk[:min(8, 33 - r)]
        exp = [round(float(m), 4) for m in acc.mean(axis=(0, 1))]
        assert t["channel_means"] == exp, tables
    # gray tiles with externalized tables; edge tiles edge-padded
    g = rng.integers(0, 256, (33, 47)).astype(np.uint8)
    t = decode_tiff(encode_tiff(g, compression="jpeg",
                                tile_wh=(16, 16), jpeg_tables=True))
    assert t["tiled"] and t["n_channels"] == 1
    acc = np.zeros((33, 47))
    for ty in range(0, 33, 16):
        for tx in range(0, 47, 16):
            sub = g[ty:ty + 16, tx:tx + 16]
            pad = np.pad(
                sub,
                ((0, 16 - sub.shape[0]), (0, 16 - sub.shape[1])),
                mode="edge",
            )
            blk = _decode_jpeg_pixels(encode_jpeg(pad))[:, :, 0]
            acc[ty:ty + sub.shape[0], tx:tx + sub.shape[1]] = blk[
                :sub.shape[0], :sub.shape[1]
            ]
    assert t["channel_means"] == [round(float(acc.mean()), 4)]
