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

    def test_transform_byte_validated(self):
        # SPcod transform byte: offset 9 into the COD segment body.
        # 0 (9/7) is implemented now but requires scalar-expounded
        # QCD; a reversible stream claiming 9/7 is inconsistent
        bad = self._patch(self._blob(), 0xFF52, 9, 0)
        with pytest.raises(ValueError, match="mismatch"):
            decode_jpx(bad)
        bad2 = self._patch(self._blob(), 0xFF52, 9, 2)
        with pytest.raises(ValueError, match="transform"):
            decode_jpx(bad2)

    def test_progression_byte_validated(self):
        # all five T.800 orders decode now; 5 is not an order at all
        bad = self._patch(self._blob(), 0xFF52, 1, 5)
        with pytest.raises(ValueError, match="progression"):
            decode_jpx(bad)

    def test_truncated_precinct_bytes_rejected(self):
        # Scod bit 0 claims per-resolution precinct bytes the
        # segment does not carry
        bad = self._patch(self._blob(), 0xFF52, 0, 1)
        with pytest.raises(ValueError, match="precinct bytes"):
            decode_jpx(bad)

    def test_quantization_style_gates(self):
        # style 1 (scalar derived) must carry exactly ONE pair; this
        # patched stream carries the expounded per-band layout
        bad = self._patch(self._blob(), 0xFF5C, 0, 0x41)
        with pytest.raises(ValueError, match="exactly one"):
            decode_jpx(bad)
        # style 3 is not a T.800 value at all
        bad2 = self._patch(self._blob(), 0xFF5C, 0, 0x43)
        with pytest.raises(ValueError, match="Sqcd"):
            decode_jpx(bad2)
        # style 2 on a 5/3 stream is inconsistent
        bad3 = self._patch(self._blob(), 0xFF5C, 0, 0x42)
        with pytest.raises(ValueError, match="mismatch"):
            decode_jpx(bad3)

    def test_poc_gates(self):
        # splice a POC marker segment after COD
        blob = self._blob()
        pos = blob.index(struct.pack(">H", 0xFF5C))
        poc = struct.pack(">HH", 0xFF5F, 9) + bytes(7)
        bad = blob[:pos] + poc + blob[pos:]
        with pytest.raises(NotImplementedError, match="POC"):
            decode_jpx(bad)

    def test_explicit_rgn_style_gates(self):
        # Srgn != 0 (explicit ROI) gates; only implicit maxshift
        blob = self._blob()
        pos = blob.index(struct.pack(">H", 0xFF5C))
        rgn = struct.pack(">HH", 0xFF5E, 5) + bytes([0, 1, 3])
        bad = blob[:pos] + rgn + blob[pos:]
        with pytest.raises(NotImplementedError, match="maxshift"):
            decode_jpx(bad)

    def test_unaligned_tile_grid_gates(self):
        img = np.arange(240, dtype=np.int64).reshape(12, 20) % 256
        # XTsiz=10 is not a multiple of 2^levels=4
        with pytest.raises(ValueError, match="multiple of"):
            encode_jpx(img, levels=2, tiles=(10, 12))
        # decoder side: patch a valid multi-tile stream's XTsiz to an
        # odd value (5 is not a multiple of 2^levels=2)
        blob = bytearray(encode_jpx(img, levels=1, tiles=(10, 12)))
        pos = blob.index(struct.pack(">H", 0xFF51))
        # SIZ body: Rsiz(2) Xsiz(4) Ysiz(4) XOsiz(4) YOsiz(4) XTsiz
        struct.pack_into(">I", blob, pos + 4 + 18, 5)
        with pytest.raises(NotImplementedError, match="aligned"):
            decode_jpx(bytes(blob))

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


class TestIrreversible97:
    """9/7 float path: normalization pinned against the PUBLISHED
    T.800 Table F.4 analysis filter taps (an external anchor the
    lifting cannot game), perfect reconstruction, and codestream
    round trips checked elementwise against the straight-line
    jpx97_reference_decode replay — which verifies the marker/
    Tier-2/Tier-1/MQ layer round-trips quantizer indices exactly."""

    # T.800 Table F.4 (public): 9/7 analysis filter taps
    _H_LOW = {0: 0.602949018236, 1: 0.266864118443,
              2: -0.078223266529, 3: -0.016864118443,
              4: 0.026748757411}
    _G_HIGH = {0: 1.115087052457, 1: -0.591271763114,
               2: -0.057543526229, 3: 0.091271763114}

    def test_lifting_matches_table_f4_taps(self):
        from ccgp_data_wrangling_spark.operators.jpeg2000 import (
            _fsd97_1d,
        )

        n = 64
        for j in range(n):
            x = np.zeros(n)
            x[j] = 1.0
            y = _fsd97_1d(x)
            # lowpass tap at distance |j-32| feeds y[32] (even)
            d = abs(j - 32)
            exp_l = self._H_LOW.get(d, 0.0)
            assert abs(y[32] - exp_l) < 1e-9, (j, y[32], exp_l)
            # highpass tap at distance |j-33| feeds y[33] (odd)
            d = abs(j - 33)
            exp_h = self._G_HIGH.get(d, 0.0)
            assert abs(y[33] - exp_h) < 1e-9, (j, y[33], exp_h)

    def test_perfect_reconstruction(self):
        from ccgp_data_wrangling_spark.operators.jpeg2000 import (
            _fdwt97, _fsd97_1d, _idwt97, _isr97_1d,
        )

        rng = np.random.default_rng(31)
        for n in (2, 3, 5, 8, 17, 64):
            x = rng.normal(size=n) * 100
            assert np.abs(_isr97_1d(_fsd97_1d(x)) - x).max() < 1e-9
        img = rng.normal(size=(23, 31)) * 100
        assert np.abs(_idwt97(_fdwt97(img, 3)) - img).max() < 1e-8

    @pytest.mark.parametrize(
        "h,w,lv,qp,depth",
        [(16, 12, 2, 9, 8), (10, 10, 1, 7, 8), (33, 17, 2, 10, 8),
         (8, 8, 1, 9, 12), (70, 66, 2, 9, 8)],
    )
    def test_gray_roundtrip_matches_replay(self, h, w, lv, qp, depth):
        from ccgp_data_wrangling_spark.operators.jpeg2000 import (
            jpx97_reference_decode,
        )

        rng = np.random.default_rng(h * 1000 + w)
        px = rng.integers(0, 1 << depth, (h, w)).astype(np.int64)
        blob = encode_jpx(px, bit_depth=depth, levels=lv,
                          irreversible=True, q_planes=qp)
        m = decode_jpx(blob)
        ref = jpx97_reference_decode(
            px, bit_depth=depth, levels=lv, q_planes=qp
        )
        assert m["transform"] == "9/7"
        assert (m["samples"] == ref).all()
        # quantization error through synthesis stays tiny at these
        # plane budgets (empirical regression bound, not a theorem)
        assert np.abs(m["samples"][..., 0] - px).max() <= 4

    def test_rgb_ict_jp2_roundtrip(self):
        from ccgp_data_wrangling_spark.operators.jpeg2000 import (
            jpx97_reference_decode,
        )

        rng = np.random.default_rng(37)
        px = rng.integers(0, 256, (14, 18, 3)).astype(np.int64)
        blob = encode_jpx(px, levels=2, irreversible=True,
                          q_planes=9, jp2_container=True)
        m = decode_jpx(blob)
        ref = jpx97_reference_decode(px, levels=2, q_planes=9)
        assert m["n_channels"] == 3
        assert (m["samples"] == ref).all()
        assert np.abs(m["samples"] - px).max() <= 4

    def test_transform_key_and_53_unchanged(self):
        rng = np.random.default_rng(41)
        px = rng.integers(0, 256, (16, 12)).astype(np.int64)
        m = decode_jpx(encode_jpx(px, levels=2))
        assert m["transform"] == "5/3"
        assert (m["samples"][..., 0] == px).all()

    def test_gates(self):
        rng = np.random.default_rng(43)
        px = rng.integers(0, 256, (16, 12)).astype(np.int64)
        # eps_slack is a reversible-path knob
        with pytest.raises(ValueError, match="eps_slack"):
            encode_jpx(px, irreversible=True, eps_slack=2)
        # too many levels -> 1-sample subsignal gate
        with pytest.raises(NotImplementedError, match="1-sample"):
            encode_jpx(px, levels=5, irreversible=True)
        # scalar derived must carry exactly one (ε, μ) pair — this
        # patched stream keeps the expounded per-band layout
        blob = bytearray(encode_jpx(px, levels=1, irreversible=True))
        qpos = blob.find(struct.pack(">H", 0xFF5C))
        assert qpos > 0
        sqcd = blob[qpos + 4]
        blob[qpos + 4] = (sqcd & 0xE0) | 1  # style 2 -> 1 (derived)
        with pytest.raises(ValueError, match="exactly one"):
            decode_jpx(bytes(blob))
        # COD transform / QCD style mismatch
        blob2 = bytearray(encode_jpx(px, levels=1))  # reversible
        cpos = blob2.find(struct.pack(">H", 0xFF52))
        (clen,) = struct.unpack_from(">H", blob2, cpos + 2)
        blob2[cpos + 2 + clen - 1] = 0  # claim 9/7
        with pytest.raises(ValueError, match="mismatch"):
            decode_jpx(bytes(blob2))

    def test_constant_image_highpass_quantizes_away(self):
        # constant input: float highpass coefficients are ~1e-13 of
        # the signal, so every non-LL block quantizes to zero and the
        # stream stays small
        px = np.full((32, 32), 200, np.int64)
        blob = encode_jpx(px, levels=2, irreversible=True)
        m = decode_jpx(blob)
        assert np.abs(m["samples"][..., 0] - px).max() <= 1


class TestSubsampling:
    """4:2:0-style chroma subsampling on the 9/7 path (SIZ
    XRsiz/YRsiz): per-component band extents, block-mean downsample
    in the encoder, replication upsample before the inverse ICT."""

    @pytest.mark.parametrize(
        "h,w,lv,sub",
        [(14, 18, 1, (2, 2)), (15, 17, 2, (2, 2)),
         (12, 16, 1, (2, 1)), (10, 10, 1, (4, 4))],
    )
    def test_roundtrip_matches_replay(self, h, w, lv, sub):
        from ccgp_data_wrangling_spark.operators.jpeg2000 import (
            jpx97_reference_decode,
        )

        rng = np.random.default_rng(h * 100 + w)
        px = rng.integers(0, 256, (h, w, 3)).astype(np.int64)
        blob = encode_jpx(px, levels=lv, irreversible=True,
                          q_planes=9, subsample=sub)
        m = decode_jpx(blob)
        ref = jpx97_reference_decode(px, levels=lv, q_planes=9,
                                     subsample=sub)
        assert m["samples"].shape == (h, w, 3)
        assert (m["samples"] == ref).all()

    def test_block_constant_chroma_is_quantization_only(self):
        # channels constant on the 2x2 grid: block-mean + replication
        # are exact, so error reduces to the quantization bound
        yy, xx = np.mgrid[0:12, 0:14]
        bx, by = xx // 2, yy // 2
        px = np.stack(
            [((bx + 1) * (by + 2)) % 256,
             (bx * 3 + by * 5 + 1) % 256,
             (bx * 7 + by * 2 + 2) % 256],
            axis=-1,
        ).astype(np.int64)
        m = decode_jpx(encode_jpx(px, levels=1, irreversible=True,
                                  q_planes=9, subsample=(2, 2)))
        assert np.abs(m["samples"] - px).max() <= 4

    def test_gates(self):
        rng = np.random.default_rng(51)
        px = rng.integers(0, 256, (12, 14, 3)).astype(np.int64)
        with pytest.raises(ValueError, match="irreversible"):
            encode_jpx(px, levels=1, subsample=(2, 2))
        with pytest.raises(ValueError, match="RGB"):
            encode_jpx(px[..., 0], levels=1, irreversible=True,
                       subsample=(2, 2))
        # 5/3 stream claiming subsampling gates in the decoder
        blob = bytearray(encode_jpx(px, levels=1))
        spos = blob.find(struct.pack(">H", 0xFF51))
        # XRsiz of component 1: SIZ body offset 36 + 3 + 1
        blob[spos + 4 + 36 + 4] = 2
        with pytest.raises(NotImplementedError, match="5/3"):
            decode_jpx(bytes(blob))


class TestStructuralR13:
    """Round-13 structural closure: tile grids, quality layers with
    pass truncation, all five progression orders, precincts +
    SOP/EPH, scalar DERIVED quantization, COC/QCC overrides, and
    implicit maxshift ROI. Lossy paths compare elementwise against
    the shared-front-end replay; reversible paths are exact."""

    def test_multi_tile_reversible_exact(self):
        rng = np.random.default_rng(101)
        for shape, tiles, lv in [
            ((40, 56), (16, 24), 2),
            ((33, 47), (16, 16), 2),   # partial edge tiles
            ((64, 64, 3), (32, 32), 1),
        ]:
            img = rng.integers(0, 256, shape, dtype=np.int64)
            m = decode_jpx(encode_jpx(img, levels=lv, tiles=tiles))
            got = m["samples"][..., 0] if img.ndim == 2 else m["samples"]
            assert (got == img).all(), (shape, tiles)

    def test_multi_tile_97_matches_replay(self):
        from ccgp_data_wrangling_spark.operators.jpeg2000 import (
            jpx97_reference_decode,
        )

        rng = np.random.default_rng(103)
        img = rng.integers(0, 256, (40, 56), dtype=np.int64)
        m = decode_jpx(encode_jpx(img, levels=2, irreversible=True,
                                  q_planes=9, tiles=(16, 24)))
        ref = jpx97_reference_decode(img, levels=2, q_planes=9,
                                     tiles=(16, 24))
        assert (m["samples"] == ref).all()
        assert np.abs(m["samples"][..., 0] - img).max() <= 4

    def test_derived_quantization(self):
        from ccgp_data_wrangling_spark.operators.jpeg2000 import (
            jpx97_reference_decode,
        )

        rng = np.random.default_rng(107)
        for shape, lv in [((33, 17), 2), ((24, 20, 3), 1)]:
            img = rng.integers(0, 256, shape, dtype=np.int64)
            blob = encode_jpx(img, levels=lv, irreversible=True,
                              q_planes=9, derived=True)
            # the QCD body is 1 + one 16-bit pair (style 1)
            qpos = blob.index(struct.pack(">H", 0xFF5C))
            (qlen,) = struct.unpack_from(">H", blob, qpos + 2)
            assert qlen == 2 + 1 + 2
            m = decode_jpx(blob)
            ref = jpx97_reference_decode(img, levels=lv, q_planes=9,
                                         derived=True)
            assert (m["samples"] == ref).all(), shape

    def test_truncated_passes_whole_plane(self):
        from ccgp_data_wrangling_spark.operators.jpeg2000 import (
            jpx97_reference_decode,
        )

        rng = np.random.default_rng(109)
        img = rng.integers(0, 256, (40, 56), dtype=np.int64)
        prev_err = -1.0
        for k in (0, 1, 2, 3):
            m = decode_jpx(encode_jpx(img, levels=2, irreversible=True,
                                      q_planes=10, truncate_planes=k))
            ref = jpx97_reference_decode(img, levels=2, q_planes=10,
                                         truncate_planes=k)
            assert (m["samples"] == ref).all(), k
            err = float(np.abs(m["samples"][..., 0] - img).max())
            assert err >= prev_err  # coarser planes, larger error
            prev_err = err
        assert prev_err > 0  # truncation really did bite

    def test_layers_reassemble_exactly(self):
        from ccgp_data_wrangling_spark.operators.jpeg2000 import (
            jpx97_reference_decode,
        )

        rng = np.random.default_rng(113)
        img = rng.integers(0, 256, (40, 56), dtype=np.int64)
        ref = jpx97_reference_decode(img, levels=2, q_planes=9)
        one = decode_jpx(encode_jpx(img, levels=2, irreversible=True,
                                    q_planes=9))["samples"]
        assert (one == ref).all()
        for lay in (2, 3, 5):
            m = decode_jpx(encode_jpx(img, levels=2, irreversible=True,
                                      q_planes=9, layers=lay))
            # multi-layer reassembly must equal the single-layer
            # decode bit for bit
            assert (m["samples"] == one).all(), lay

    @pytest.mark.parametrize(
        "prog", ["LRCP", "RLCP", "RPCL", "PCRL", "CPRL"]
    )
    def test_progression_orders(self, prog):
        from ccgp_data_wrangling_spark.operators.jpeg2000 import (
            jpx97_reference_decode,
        )

        rng = np.random.default_rng(127)
        img = rng.integers(0, 256, (24, 20, 3), dtype=np.int64)
        m = decode_jpx(encode_jpx(img, levels=1, irreversible=True,
                                  q_planes=9, progression=prog,
                                  layers=2, tiles=(12, 12)))
        ref = jpx97_reference_decode(img, levels=1, q_planes=9,
                                     tiles=(12, 12))
        assert (m["samples"] == ref).all(), prog

    def test_precincts_sop_eph(self):
        from ccgp_data_wrangling_spark.operators.jpeg2000 import (
            jpx97_reference_decode,
        )

        rng = np.random.default_rng(131)
        img = rng.integers(0, 256, (40, 56), dtype=np.int64)
        ref = jpx97_reference_decode(img, levels=2, q_planes=9)
        blob = encode_jpx(img, levels=2, irreversible=True, q_planes=9,
                          precincts=(5, 4), cb_exp=(3, 4), sop=True,
                          eph=True, layers=3, progression="RPCL")
        assert struct.pack(">H", 0xFF91) in blob  # SOP present
        assert struct.pack(">H", 0xFF92) in blob  # EPH present
        m = decode_jpx(blob)
        assert (m["samples"] == ref).all()
        # reversible precincts too (exact)
        m2 = decode_jpx(encode_jpx(img, levels=2, precincts=(5, 5),
                                   cb_exp=(4, 4), progression="PCRL"))
        assert (m2["samples"][..., 0] == img).all()

    def test_coc_qcc_overrides(self):
        from ccgp_data_wrangling_spark.operators.jpeg2000 import (
            jpx97_reference_decode,
        )

        rng = np.random.default_rng(137)
        img = rng.integers(0, 256, (24, 20, 3), dtype=np.int64)
        blob = encode_jpx(img, levels=2, irreversible=True,
                          q_planes=9, qcc=True)
        assert struct.pack(">H", 0xFF5D) in blob  # QCC present
        m = decode_jpx(blob)
        ref = jpx97_reference_decode(img, levels=2, q_planes=9,
                                     qcc=True)
        assert (m["samples"] == ref).all()
        blob2 = encode_jpx(img, levels=2, irreversible=True,
                           q_planes=9, coc_levels={1: 1, 2: 3})
        assert struct.pack(">H", 0xFF53) in blob2  # COC present
        m2 = decode_jpx(blob2)
        ref2 = jpx97_reference_decode(img, levels=2, q_planes=9,
                                      coc_levels={1: 1, 2: 3})
        assert (m2["samples"] == ref2).all()

    def test_rgn_maxshift(self):
        from ccgp_data_wrangling_spark.operators.jpeg2000 import (
            jpx97_reference_decode,
        )

        rng = np.random.default_rng(139)
        img = rng.integers(0, 256, (40, 56), dtype=np.int64)
        blob = encode_jpx(img, levels=2, rgn=[0])
        assert struct.pack(">H", 0xFF5E) in blob  # RGN present
        # maxshift is exactly invertible: reversible stays lossless
        assert (decode_jpx(blob)["samples"][..., 0] == img).all()
        rgb = rng.integers(0, 256, (24, 20, 3), dtype=np.int64)
        m = decode_jpx(encode_jpx(rgb, levels=1, irreversible=True,
                                  q_planes=9, rgn=[0, 1, 2]))
        ref = jpx97_reference_decode(rgb, levels=1, q_planes=9,
                                     rgn=[0, 1, 2])
        assert (m["samples"] == ref).all()
        # ...and lossless-transparent on the lossy path
        assert (ref == jpx97_reference_decode(
            rgb, levels=1, q_planes=9)).all()

    def test_combined_kitchen_sink(self):
        from ccgp_data_wrangling_spark.operators.jpeg2000 import (
            jpx97_reference_decode,
        )

        rng = np.random.default_rng(149)
        img = rng.integers(0, 256, (32, 48, 3), dtype=np.int64)
        m = decode_jpx(encode_jpx(
            img, levels=1, irreversible=True, q_planes=9,
            tiles=(16, 16), layers=2, precincts=(4, 4), cb_exp=(3, 3),
            sop=True, eph=True, progression="CPRL", derived=True,
            subsample=(2, 2),
        ))
        ref = jpx97_reference_decode(img, levels=1, q_planes=9,
                                     tiles=(16, 16), derived=True,
                                     subsample=(2, 2))
        assert (m["samples"] == ref).all()

    def test_t1_arbitrary_pass_truncation_bound(self):
        # real rate allocators truncate at ARBITRARY pass boundaries;
        # the T1 decoder accepts any prefix and the decoded magnitude
        # error vs the full coefficients stays under the undecoded-
        # plane bound 2^(T+1)
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            MQDecoder,
            MQEncoder,
        )
        from ccgp_data_wrangling_spark.operators.jpeg2000 import (
            _fresh_stats,
            _t1_code_block,
        )

        rng = np.random.default_rng(151)
        blk = rng.integers(-200, 201, (12, 10)).astype(np.int64)
        planes = int(np.abs(blk).max()).bit_length()
        total = 3 * planes - 2
        for npasses in range(1, total + 1):
            enc = MQEncoder()
            _t1_code_block(enc, _fresh_stats(), 0, 10, 12, planes,
                           blk, npasses=npasses)
            payload = enc.flush()
            dec = MQDecoder(payload)
            got = _t1_code_block(dec, _fresh_stats(), 0, 10, 12,
                                 planes, None, npasses=npasses)
            # undecoded planes: everything below the last started one
            done_planes = 1 + -(-(npasses - 1) // 3)
            bound = 1 << max(0, planes - done_planes + 1)
            assert np.abs(got - blk).max() <= bound, npasses
            if npasses == total:
                assert np.array_equal(got, blk)

    def test_multiple_tile_parts(self):
        from ccgp_data_wrangling_spark.operators.jpeg2000 import (
            jpx97_reference_decode,
        )

        rng = np.random.default_rng(157)
        img = rng.integers(0, 256, (40, 56), dtype=np.int64)
        # reversible: exact through 3 tile-parts per tile
        m = decode_jpx(encode_jpx(img, levels=2, tiles=(16, 24),
                                  tile_parts=3))
        assert (m["samples"][..., 0] == img).all()
        # lossy + layers: replay-identical through 2 tile-parts
        m = decode_jpx(encode_jpx(img, levels=2, irreversible=True,
                                  q_planes=9, tiles=(16, 24),
                                  tile_parts=2, layers=2))
        ref = jpx97_reference_decode(img, levels=2, q_planes=9,
                                     tiles=(16, 24))
        assert (m["samples"] == ref).all()
        # out-of-order tile-part sequence is rejected
        blob = bytearray(encode_jpx(img, levels=1, tiles=(56, 40),
                                    tile_parts=2))
        # SOT: marker(2) Lsot(2) Isot(2) Psot(4) TPsot(1) TNsot(1)
        pos = blob.index(struct.pack(">H", 0xFF90))
        assert blob[pos + 10] == 0  # TPsot of the first tile-part
        blob[pos + 10] = 1  # duplicate TPsot 1 -> non-contiguous
        with pytest.raises(ValueError, match="tile-part"):
            decode_jpx(bytes(blob))


class TestT1GoldenPin:
    """Cross-version pin of the Tier-1 coder: the r15 hot-loop rewrite
    (incremental ``packed`` neighbourhood counters + inlined MQ fast
    paths) must reproduce the r14 implementation's coded streams,
    pass marks and decoded coefficients bit for bit. The golden hash
    below was computed by running this exact workload against the r14
    tree (commit 68e055b) — 24 randomized blocks spanning all three
    band classes, dense/sparse/impulse/small-magnitude coefficients
    and truncated pass sets, hitting both the MPS-no-renorm fast path
    and every exchange/renorm slow path."""

    def test_t1_stream_and_decode_golden(self):
        import hashlib

        from ccgp_data_wrangling_spark.operators.jbig2 import (
            MQDecoder,
            MQEncoder,
        )
        from ccgp_data_wrangling_spark.operators.jpeg2000 import (
            _fresh_stats,
            _t1_code_block,
        )

        rng = np.random.default_rng(20260817)
        h = hashlib.md5()
        for trial in range(24):
            w = int(rng.integers(3, 40))
            ht = int(rng.integers(3, 40))
            band = int(rng.integers(0, 3))
            planes = int(rng.integers(2, 9))
            mode = trial % 4
            if mode == 0:
                coef = rng.integers(
                    -(1 << planes) + 1, 1 << planes, (ht, w)
                )
            elif mode == 1:
                coef = np.where(
                    rng.random((ht, w)) < 0.08,
                    rng.integers(
                        -(1 << planes) + 1, 1 << planes, (ht, w)
                    ),
                    0,
                )
            elif mode == 2:
                coef = np.zeros((ht, w), np.int64)
                coef[ht // 2, w // 2] = (1 << planes) - 1
            else:
                coef = rng.integers(-3, 4, (ht, w))
            npasses = 3 * planes - 2
            if trial % 5 == 0:
                npasses = int(rng.integers(1, npasses + 1))
            enc = MQEncoder()
            marks: list[int] = []
            _t1_code_block(
                enc, _fresh_stats(), band, w, ht, planes,
                coef.astype(np.int64), npasses=npasses,
                pass_marks=marks,
            )
            data = enc.flush()
            h.update(data)
            h.update(bytes(str(marks), "ascii"))
            dec = MQDecoder(data)
            out = _t1_code_block(
                dec, _fresh_stats(), band, w, ht, planes, None,
                npasses=npasses,
            )
            h.update(out.tobytes())
        assert h.hexdigest() == "116956b105588a3908e44033658f295f"
