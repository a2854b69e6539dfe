"""Property tests for the round-6 codec/source surface: randomized
inputs through full encode→decode round trips. No Spark jobs here —
pure kernels — so examples can be plentiful."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ccgp_data_wrangling_spark.operators.media_codecs import (
    _decode_jpeg_pixels,
    decode_gif_frames,
    decode_png,
    encode_gif_animated,
    encode_jpeg,
    encode_jpeg_progressive,
    encode_png,
)
from ccgp_data_wrangling_spark.sources.pdf import build_pdf, extract_pdf_pages
from ccgp_data_wrangling_spark.sources.webdataset import (
    build_wds_shard,
    iter_wds_samples,
)

FAST = settings(max_examples=25, deadline=None)
SLOW = settings(max_examples=10, deadline=None)

# printable ASCII incl. the chars the PDF writer must escape
_PDF_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0,
    max_size=40,
)


@FAST
@given(st.lists(st.lists(_PDF_TEXT, min_size=1, max_size=4), min_size=1, max_size=3))
def test_pdf_roundtrip_random_strings(pages):
    """Any printable-ASCII page content survives build→extract with
    segments joined by newlines — parens, backslashes and all."""
    pdf = build_pdf([list(p) for p in pages])
    assert extract_pdf_pages(pdf) == ["\n".join(p) for p in pages]


_KEY = st.text(alphabet="abcdefghij0123456789-_", min_size=1, max_size=12)
_EXT = st.sampled_from(["jpg", "cls", "txt", "json", "seg.png"])


@FAST
@given(
    st.lists(
        st.tuples(
            _KEY,
            st.dictionaries(_EXT, st.binary(max_size=64), min_size=1, max_size=4),
        ),
        min_size=1,
        max_size=6,
        unique_by=lambda kv: kv[0],
    )
)
def test_wds_roundtrip_random_samples(samples):
    got = list(iter_wds_samples(build_wds_shard(samples)))
    assert got == [(k, parts) for k, parts in samples]


@SLOW
@given(
    st.integers(2, 30),
    st.integers(2, 30),
    st.integers(0, 3),
    st.booleans(),
    st.randoms(use_true_random=False),
)
def test_png_16bit_roundtrip_random(h, w, ch_kind, interlace, rnd):
    rng = np.random.default_rng(rnd.randrange(2**32))
    shape = (h, w) if ch_kind == 0 else (h, w, (3, 4, 1)[ch_kind - 1])
    px = rng.integers(0, 65536, shape).astype(np.uint16)
    d = decode_png(encode_png(px, interlace=interlace))
    want = px if px.ndim == 3 else px[..., None]
    assert d["channel_means"] == [
        round(float(m), 4) for m in want.astype(np.float64).mean(axis=(0, 1))
    ]


@SLOW
@given(
    st.integers(1, 3),
    st.integers(1, 4),
    st.integers(1, 40),
    st.booleans(),
    st.randoms(use_true_random=False),
)
def test_jpeg_progressive_equals_baseline_random(dc_al, ac_al, split, color, rnd):
    """For ANY scan script the progressive stream reorganizes the same
    quantized coefficients, so its decode must equal baseline decode
    bit-for-bit — randomized smooth content, dims, and Al/split."""
    rng = np.random.default_rng(rnd.randrange(2**32))
    h, w = int(rng.integers(8, 33)), int(rng.integers(8, 33))
    gh, gw = -(-h // 8) + 1, -(-w // 8) + 1
    if color:
        coarse = rng.integers(40, 216, (gh, gw, 3))
        px = np.stack(
            [np.kron(coarse[..., c], np.ones((8, 8)))[:h, :w] for c in range(3)],
            axis=-1,
        ).astype(np.uint8)
    else:
        px = np.kron(rng.integers(40, 216, (gh, gw)), np.ones((8, 8)))[
            :h, :w
        ].astype(np.uint8)
    base = _decode_jpeg_pixels(encode_jpeg(px))
    prog = _decode_jpeg_pixels(
        encode_jpeg_progressive(px, dc_al=dc_al, ac_al=ac_al, split=split)
    )
    assert np.array_equal(base, prog)


@SLOW
@given(
    st.integers(1, 5),
    st.integers(2, 14),
    st.integers(2, 14),
    st.randoms(use_true_random=False),
)
def test_gif_animated_roundtrip_random(n_frames, h, w, rnd):
    rng = np.random.default_rng(rnd.randrange(2**32))
    frames = [
        (rng.integers(0, 5, (h, w, 3)) * 50).astype(np.uint8)
        for _ in range(n_frames)
    ]
    delays = [int(rng.integers(1, 50)) for _ in range(n_frames)]
    got, gdel = decode_gif_frames(encode_gif_animated(frames, delays_cs=delays))
    assert gdel == delays
    assert all(np.array_equal(a, b) for a, b in zip(frames, got))


@FAST
@given(
    st.lists(
        st.lists(
            st.one_of(
                _PDF_TEXT,
                st.integers(min_value=-500, max_value=-101),
                st.integers(min_value=-100, max_value=0),
            ),
            min_size=1,
            max_size=6,
        ).filter(lambda seg: any(isinstance(e, str) for e in seg)),
        min_size=1,
        max_size=3,
    )
)
def test_pdf_tj_arrays_random(segments):
    """Random TJ arrays (strings mixed with kern amounts): strings
    concatenate, kerns < -100 become spaces, anything milder glues —
    regardless of brackets/parens/operator names inside the data."""
    pdf = build_pdf([[list(seg) for seg in segments]])
    want_lines = []
    for seg in segments:
        parts = []
        for el in seg:
            if isinstance(el, str):
                parts.append(el)
            elif el < -100:
                parts.append(" ")
        want_lines.append("".join(parts))
    assert extract_pdf_pages(pdf) == ["\n".join(want_lines)]
