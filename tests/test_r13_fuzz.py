"""Round-13 structural fuzz: random-but-seeded sweeps over the JPX
structural-option space, FLAC subframe space, and .doc piece space.
Every case is deterministic (seeded), every lossy check is the
shared-front-end replay (bit-identical by construction), and every
lossless check is exact — so a single geometry/packet/coder slip
anywhere in the r13 rewrite fails loudly here."""

from __future__ import annotations

import numpy as np
import pytest


class TestJpxStructuralFuzz:
    @pytest.mark.parametrize("seed", range(14))
    def test_random_structural_combo(self, seed):
        from ccgp_data_wrangling_spark.operators.jpeg2000 import (
            decode_jpx,
            encode_jpx,
            jpx97_reference_decode,
        )

        rng = np.random.default_rng(1000 + seed)
        h = int(rng.integers(9, 50))
        w = int(rng.integers(9, 50))
        rgb = bool(rng.integers(0, 2))
        shape = (h, w, 3) if rgb else (h, w)
        px = rng.integers(0, 256, shape).astype(np.int64)
        levels = int(rng.integers(1, 3))
        prog = ["LRCP", "RLCP", "RPCL", "PCRL", "CPRL"][
            int(rng.integers(0, 5))
        ]
        layers = int(rng.integers(1, 4))
        kw = dict(levels=levels, progression=prog, layers=layers)
        rkw = dict(levels=levels)
        if rng.integers(0, 2):
            kw["precincts"] = (int(rng.integers(3, 6)),
                               int(rng.integers(3, 6)))
            kw["cb_exp"] = (3, 3)
            kw["sop"] = bool(rng.integers(0, 2))
            kw["eph"] = bool(rng.integers(0, 2))
        if rng.integers(0, 2):
            align = 1 << levels
            tx = int(rng.integers(1, max(2, w // align))) * align
            ty = int(rng.integers(1, max(2, h // align))) * align
            kw["tiles"] = (tx, ty)
            rkw["tiles"] = (tx, ty)
            kw["tile_parts"] = int(rng.integers(1, 3))
        irreversible = bool(rng.integers(0, 2))
        if irreversible:
            # keep every per-tile subsignal >= 2 samples for 9/7
            tdim = min(kw.get("tiles", (w, h)))
            if tdim >> levels < 2:
                kw.pop("tiles", None)
                rkw.pop("tiles", None)
                kw.pop("tile_parts", None)
            kw.update(irreversible=True, q_planes=9)
            rkw["q_planes"] = 9
            if rng.integers(0, 2):
                kw["derived"] = rkw["derived"] = True
            if rng.integers(0, 2):
                kw["truncate_planes"] = rkw["truncate_planes"] = int(
                    rng.integers(1, 3)
                )
            elif rng.integers(0, 2):
                kw["rgn"] = rkw["rgn"] = (
                    [0, 1, 2] if rgb else [0]
                )
            m = decode_jpx(encode_jpx(px, **kw))
            ref = jpx97_reference_decode(px, **rkw)
            assert (m["samples"] == ref).all(), (seed, kw)
        else:
            if rng.integers(0, 2):
                kw["rgn"] = [0]
            if rng.integers(0, 2):
                kw["eps_slack"] = int(rng.integers(0, 3))
            m = decode_jpx(encode_jpx(px, **kw))
            got = m["samples"][..., 0] if not rgb else m["samples"]
            assert (got == px).all(), (seed, kw)


class TestFlacFuzz:
    @pytest.mark.parametrize("seed", range(12))
    def test_random_stream_round_trip(self, seed):
        from ccgp_data_wrangling_spark.operators.flac import (
            decode_flac,
            encode_flac,
        )

        rng = np.random.default_rng(2000 + seed)
        bps = [8, 16, 24][int(rng.integers(0, 3))]
        nch = int(rng.integers(1, 3))
        n = int(rng.integers(100, 1200))
        amp = 1 << (bps - 2)
        # mix of tonal + noise so Rice params vary per partition
        t = np.arange(n)
        base = (amp // 2 * np.sin(t / (3 + seed))).astype(np.int64)
        noise = rng.integers(-amp // 4, amp // 4, (n, nch))
        arr = (base[:, None] + noise).astype(np.int64)
        if nch == 1:
            arr = arr[:, 0]
        kinds_pool = ["constant", "verbatim", "fixed0", "fixed1",
                      "fixed2", "fixed3", "fixed4", "lpc1", "lpc3",
                      "lpc8", "lpc16"]
        kinds = [
            kinds_pool[int(i)]
            for i in rng.integers(1, len(kinds_pool), 3)
        ]
        mode = "independent"
        if nch == 2:
            mode = ["independent", "left_side", "right_side",
                    "mid_side"][int(rng.integers(0, 4))]
        m = decode_flac(encode_flac(
            arr,
            bits_per_sample=bps,
            block_size=[192, 256, 576][int(rng.integers(0, 3))],
            channel_mode=mode,
            subframe_kinds=kinds,
            partition_order=int(rng.integers(0, 3)),
            rice2=bool(rng.integers(0, 2)),
            escape_first=bool(rng.integers(0, 2)),
        ))
        exp = arr if arr.ndim == 2 else arr[:, None]
        assert (m["samples"] == exp).all(), seed
        if bps % 8 == 0:
            assert m["md5_ok"] is True


class TestDocFuzz:
    @pytest.mark.parametrize("seed", range(6))
    def test_random_paragraphs_round_trip(self, seed):
        from ccgp_data_wrangling_spark.sources.doc import (
            build_doc,
            extract_doc_paragraphs,
        )

        rng = np.random.default_rng(3000 + seed)
        alphabets = [
            "abcdefgh ijklmnop",          # pure ASCII -> cp1252
            "äöüß éèê ñç",                # latin-1-ish -> cp1252
            "αβγδε ζηθικ",                # greek -> UTF-16 pieces
            "данные текст",               # cyrillic -> UTF-16
        ]
        paras = []
        expected = []
        for _ in range(int(rng.integers(2, 8))):
            ab = alphabets[int(rng.integers(0, len(alphabets)))]
            txt = "".join(
                ab[int(i)] for i in rng.integers(0, len(ab),
                                                 int(rng.integers(0, 30)))
            )
            kind = int(rng.integers(0, 4))
            if kind == 0 or not txt:
                paras.append(txt)
                expected.append(txt)
            elif kind == 1:
                paras.append(("br", txt, "tail"))
                expected.append(txt + "\n" + "tail")
            elif kind == 2:
                paras.append(("cells", [txt, "c2"]))
                expected.append(txt + "\t" + "c2")
            else:
                paras.append(("field", "REF " + txt, "res"))
                expected.append("res")
        pc = int(rng.integers(3, 40))
        got = extract_doc_paragraphs(build_doc(paras, piece_chars=pc))
        assert got == expected, (seed, pc)
