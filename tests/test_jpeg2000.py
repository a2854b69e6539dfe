"""JPEG 2000 Part 1: T1 EBCOT round-trips, tag trees, 5/3 wavelet,
RCT, codestream/JP2 walk, and the honest gates. The encoder exists
for fixtures, so every decode test is a true round-trip through a
real codestream."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ccgp_data_wrangling_spark.operators.jpeg2000 import (
    TagTree,
    _fdwt53,
    _idwt53,
    _PkBitReader,
    _PkBitWriter,
    decode_jpx,
    encode_jpx,
)


class TestWavelet:
    @pytest.mark.parametrize("shape", [(8, 8), (13, 17), (1, 9),
                                       (9, 1), (2, 3), (31, 30)])
    @pytest.mark.parametrize("levels", [1, 2, 3])
    def test_53_perfect_reconstruction(self, shape, levels):
        rng = np.random.default_rng(shape[0] * 7 + levels)
        img = rng.integers(-300, 300, shape, dtype=np.int64)
        bands = _fdwt53(img, levels)
        assert np.array_equal(_idwt53(bands), img)

    def test_dc_band_tracks_mean(self):
        img = np.full((16, 16), 200, np.int64)
        bands = _fdwt53(img, 2)
        assert (bands[0]["LL"] == 200).all()
        for triple in bands[1:]:
            for name in ("HL", "LH", "HH"):
                assert (triple[name] == 0).all()


class TestTagTree:
    def test_multi_leaf_grid(self):
        vals = np.array([[0, 2], [1, 3], [2, 0]])
        t = TagTree(2, 3)
        t.set_leaves(vals)
        w = _PkBitWriter()
        for y in range(3):
            for x in range(2):
                t.encode(w, x, y, int(vals[y, x]) + 1)
        data = w.flush()
        r = _PkBitReader(data)
        t2 = TagTree(2, 3)
        for y in range(3):
            for x in range(2):
                thr = 1
                while not t2.decode(r, x, y, thr):
                    thr += 1
                assert t2.leaf_value(x, y) == vals[y, x]

    def test_bit_stuffing_after_ff(self):
        w = _PkBitWriter()
        for _ in range(16):
            w.bit(1)  # produces 0xFF then stuffing kicks in
        data = w.flush()
        assert data[0] == 0xFF
        assert data[1] & 0x80 == 0  # stuffed bit
        r = _PkBitReader(data)
        assert [r.bit() for _ in range(16)] == [1] * 16


class TestRoundTrip:
    def test_gray_random(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (13, 17), dtype=np.int64)
        out = decode_jpx(encode_jpx(img, levels=2))
        assert (out["width"], out["height"]) == (17, 13)
        assert out["n_channels"] == 1 and out["bit_depth"] == 8
        assert (out["samples"][..., 0] == img).all()

    def test_rgb_rct_lossless(self):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (21, 19, 3), dtype=np.int64)
        out = decode_jpx(encode_jpx(img, levels=3))
        assert out["n_channels"] == 3
        assert (out["samples"] == img).all()

    def test_zero_bitplane_slack(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (16, 16), dtype=np.int64)
        blob = encode_jpx(img, levels=1, eps_slack=3)
        assert (decode_jpx(blob)["samples"][..., 0] == img).all()

    def test_jp2_container(self):
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (12, 10), dtype=np.int64)
        blob = encode_jpx(img, levels=2, jp2_container=True)
        assert blob[4:8] == b"jP  "
        assert (decode_jpx(blob)["samples"][..., 0] == img).all()

    def test_smooth_gradient_sparse_bands(self):
        yy, xx = np.mgrid[0:32, 0:32]
        img = ((yy + xx) * 4 % 256).astype(np.int64)
        assert (decode_jpx(encode_jpx(img, levels=2))["samples"][..., 0]
                == img).all()

    def test_flat_image_empty_blocks(self):
        img = np.full((9, 9), 128, np.int64)
        assert (decode_jpx(encode_jpx(img, levels=2))["samples"][..., 0]
                == img).all()

    def test_16_bit_depth(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 65536, (8, 12), dtype=np.int64)
        out = decode_jpx(encode_jpx(img, bit_depth=16, levels=1))
        assert out["bit_depth"] == 16
        assert (out["samples"][..., 0] == img).all()

    @pytest.mark.parametrize(
        "shape", [(1, 1), (1, 7), (5, 1), (2, 2), (3, 3)]
    )
    def test_tiny_images(self, shape):
        rng = np.random.default_rng(sum(shape))
        img = rng.integers(0, 256, shape, dtype=np.int64)
        out = decode_jpx(encode_jpx(img, levels=1))
        assert (out["samples"][..., 0] == img).all()

    def test_random_matrix(self):
        rng = np.random.default_rng(13)
        for _ in range(12):
            h = int(rng.integers(1, 40))
            w = int(rng.integers(1, 40))
            lv = int(rng.integers(1, 4))
            if rng.random() < 0.5:
                img = rng.integers(0, 256, (h, w), dtype=np.int64)
            else:
                img = rng.integers(0, 256, (h, w, 3), dtype=np.int64)
            out = decode_jpx(
                encode_jpx(img, levels=lv,
                           eps_slack=int(rng.integers(0, 3)))
            )
            got = out["samples"][..., 0] if img.ndim == 2 else out["samples"]
            assert (got == img).all(), (img.shape, lv)


class TestGates:
    def _blob(self) -> bytes:
        img = np.arange(64, dtype=np.int64).reshape(8, 8) * 3
        return encode_jpx(img, levels=1)

    def _patch(self, blob: bytes, marker: int, off: int,
               val: int) -> bytes:
        pos = blob.index(struct.pack(">H", marker))
        b = bytearray(blob)
        b[pos + 4 + off] = val
        return bytes(b)

    def test_97_transform_gates(self):
        # SPcod transform byte: offset 9 into the COD segment body
        bad = self._patch(self._blob(), 0xFF52, 9, 0)
        with pytest.raises(NotImplementedError, match="9/7"):
            decode_jpx(bad)

    def test_progression_gates(self):
        bad = self._patch(self._blob(), 0xFF52, 1, 2)  # RPCL
        with pytest.raises(NotImplementedError, match="progression"):
            decode_jpx(bad)

    def test_precinct_flag_gates(self):
        bad = self._patch(self._blob(), 0xFF52, 0, 1)
        with pytest.raises(NotImplementedError, match="precinct"):
            decode_jpx(bad)

    def test_quantization_style_gates(self):
        bad = self._patch(self._blob(), 0xFF5C, 0, 0x42)
        with pytest.raises(NotImplementedError, match="quantization"):
            decode_jpx(bad)

    def test_not_a_codestream(self):
        with pytest.raises(ValueError, match="SOC"):
            decode_jpx(b"\x00" * 16)

    def test_jp2_without_codestream(self):
        box = struct.pack(">I", 12) + b"jP  " + b"\x0d\x0a\x87\x0a"
        with pytest.raises(ValueError, match="jp2c"):
            decode_jpx(box)


class TestPdfIntegration:
    def test_pdf_jpx_gray_and_rgb(self):
        from ccgp_data_wrangling_spark.sources.pdf import (
            build_pdf,
            pdf_images,
        )

        rng = np.random.default_rng(2)
        gray = rng.integers(0, 256, (12, 18), dtype=np.int64)
        rgb = rng.integers(0, 256, (10, 14, 3), dtype=np.int64)
        blob = build_pdf(
            [["jpx page"]],
            page_images=[[
                ("jpx", gray, {"levels": 2}),
                ("jpx", rgb, {"levels": 1, "jp2_container": True}),
            ]],
        )
        rows = pdf_images(blob)
        assert [r["codec"] for r in rows] == ["jpx", "jpx"]
        assert rows[0]["n_channels"] == 1
        assert rows[0]["luma_mean"] == round(float(gray.mean()), 4)
        assert rows[1]["n_channels"] == 3
        m = rgb.astype(float).mean(axis=(0, 1))
        assert rows[1]["luma_mean"] == round(
            float(m @ np.array([0.299, 0.587, 0.114])), 4
        )

    def test_pdf_jpx_dimension_mismatch(self):
        from ccgp_data_wrangling_spark.sources.pdf import (
            build_pdf,
            pdf_images,
        )

        arr = np.zeros((6, 6), np.int64)
        blob = build_pdf([["x"]], page_images=[[("jpx", arr)]])
        blob = blob.replace(b"/Width 6", b"/Width 7")
        with pytest.raises(ValueError, match="disagree"):
            pdf_images(blob)


class TestMultiCodeBlock:
    def test_grid_lossless(self):
        rng = np.random.default_rng(17)
        img = rng.integers(0, 256, (140, 150), dtype=np.int64)
        out = decode_jpx(encode_jpx(img, levels=2))
        assert (out["samples"][..., 0] == img).all()

    def test_sparse_grid_skips_empty_blocks(self):
        img = np.zeros((130, 130), np.int64)
        img[5:20, 100:120] = 200
        blob = encode_jpx(img, levels=1)
        out = decode_jpx(blob)
        assert (out["samples"][..., 0] == img).all()
        # empty blocks must shrink the stream vs a dense image
        dense = encode_jpx(
            np.full((130, 130), 200, np.int64) - img, levels=1
        )
        assert len(blob) < len(dense)

    def test_rgb_grid(self):
        rng = np.random.default_rng(19)
        img = rng.integers(0, 256, (70, 80, 3), dtype=np.int64)
        out = decode_jpx(encode_jpx(img, levels=1))
        assert (out["samples"] == img).all()

    def test_block_boundary_exact_multiple(self):
        rng = np.random.default_rng(23)
        img = rng.integers(0, 256, (128, 64), dtype=np.int64)
        out = decode_jpx(encode_jpx(img, levels=1))
        assert (out["samples"][..., 0] == img).all()
