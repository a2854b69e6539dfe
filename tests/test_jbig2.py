"""JBIG2 (ITU-T T.88) — MQ coder, generic regions, embedded streams.

The encoder exists for fixtures, so every decode test is a true
round-trip through real T.88 bitstreams; the MMR test additionally
cross-checks the arithmetic path against the T.6 path (two
independent codings of the same bitmap must decode identically).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ccgp_data_wrangling_spark.operators.jbig2 import (
    MQDecoder,
    MQEncoder,
    build_jbig2_embedded,
    decode_generic_region,
    decode_jbig2_embedded,
    encode_generic_region,
    parse_jbig2_segments,
)


class TestMQCoder:
    def test_round_trip_random_bits(self):
        rng = np.random.default_rng(11)
        for _ in range(6):
            n = int(rng.integers(1, 4000))
            bits = rng.integers(0, 2, n)
            cxs = rng.integers(0, 19, n)
            enc = MQEncoder(19)
            for c, b in zip(cxs, bits):
                enc.encode(int(c), int(b))
            data = enc.flush()
            dec = MQDecoder(data, 19)
            assert [dec.decode(int(c)) for c in cxs] == list(bits)

    def test_skewed_source_compresses(self):
        # 2000 highly-predictable bits should code far below 250 bytes
        rng = np.random.default_rng(3)
        bits = (rng.random(2000) < 0.02).astype(int)
        enc = MQEncoder(1)
        for b in bits:
            enc.encode(0, int(b))
        data = enc.flush()
        assert len(data) < 120
        dec = MQDecoder(data, 1)
        assert [dec.decode(0) for _ in bits] == list(bits)

    def test_terminator_and_past_end_reads(self):
        # decoder must keep producing once the buffer is exhausted
        # (Figure E.19 feeds 1-bits) — drop the FF AC terminator
        enc = MQEncoder(1)
        bits = [1, 0, 1, 1, 0, 0, 1, 0] * 8
        for b in bits:
            enc.encode(0, b)
        data = enc.flush()
        assert data.endswith(b"\xff\xac")
        dec = MQDecoder(data[:-2], 1)
        assert [dec.decode(0) for b in bits] == bits


class TestGenericRegion:
    @pytest.mark.parametrize("template", [0, 1, 2, 3])
    @pytest.mark.parametrize("tpgdon", [False, True])
    def test_round_trip(self, template, tpgdon):
        rng = np.random.default_rng(template * 2 + tpgdon)
        bm = rng.random((29, 41)) < 0.35
        bm[12:17] = bm[11]  # typical rows exercise TPGDON
        data = encode_generic_region(bm, template, tpgdon)
        out = decode_generic_region(data, 41, 29, template, tpgdon)
        assert np.array_equal(out, bm)

    def test_custom_at_pixels(self):
        rng = np.random.default_rng(5)
        bm = rng.random((15, 20)) < 0.5
        at = ((1, -1), (-2, -1), (3, -2), (-4, -2))
        data = encode_generic_region(bm, 0, False, at)
        assert np.array_equal(
            decode_generic_region(data, 20, 15, 0, False, at), bm
        )
        # nominal AT with the same payload must NOT decode the same
        # stream (the context model differs) — guards against taps
        # silently ignoring the AT parameters
        other = decode_generic_region(data, 20, 15, 0, False)
        assert not np.array_equal(other, bm)

    def test_future_at_pixel_gates(self):
        bm = np.zeros((4, 4), bool)
        with pytest.raises(NotImplementedError, match="undecoded"):
            encode_generic_region(bm, 0, False,
                                  ((1, 0), (-3, -1), (2, -2), (-2, -2)))

    def test_tpgdon_saves_bits_on_banded_image(self):
        bm = np.zeros((64, 64), bool)
        bm[:32] = True  # two uniform bands → almost all rows typical
        plain = encode_generic_region(bm, 0, False)
        typical = encode_generic_region(bm, 0, True)
        assert len(typical) < len(plain)
        assert np.array_equal(
            decode_generic_region(typical, 64, 64, 0, True), bm
        )

    def test_all_black_all_white(self):
        for v in (0, 1):
            bm = np.full((9, 31), bool(v))
            data = encode_generic_region(bm, 2)
            assert np.array_equal(
                decode_generic_region(data, 31, 9, 2), bm
            )


class TestEmbeddedStream:
    def test_segment_walk_shapes(self):
        bm = np.eye(8, dtype=bool)
        stream = build_jbig2_embedded(bm)
        segs = parse_jbig2_segments(stream)
        assert [s["type"] for s in segs] == [48, 39, 49]
        assert all(s["page"] == 1 for s in segs)
        assert [s["number"] for s in segs] == [0, 1, 2]

    def test_mmr_equals_arithmetic(self):
        rng = np.random.default_rng(9)
        bm = rng.random((22, 40)) < 0.25
        a = decode_jbig2_embedded(build_jbig2_embedded(bm, mmr=True))
        b = decode_jbig2_embedded(build_jbig2_embedded(bm, mmr=False))
        assert np.array_equal(a["black"], b["black"])
        assert np.array_equal(a["black"], bm)

    @pytest.mark.parametrize(
        "op,expect",
        [
            (0, lambda p, r: p | r),
            (2, lambda p, r: p ^ r),
            (4, lambda p, r: r),
        ],
    )
    def test_composition_ops(self, op, expect):
        rng = np.random.default_rng(op)
        base = rng.random((12, 12)) < 0.5
        top = rng.random((12, 12)) < 0.5
        stream = build_jbig2_embedded(
            [(base, 0, 0)], page_wh=(12, 12)
        )
        # append a second region with the op under test
        second = build_jbig2_embedded(
            [(top, 0, 0)], page_wh=(12, 12), comb_op=op
        )
        segs = parse_jbig2_segments(second)
        region_seg = next(s for s in segs if s["type"] == 39)
        raw = (
            struct.pack(">IB", 5, 39)
            + b"\x00"
            + struct.pack(">B", 1)
            + struct.pack(">I", len(region_seg["data"]))
            + region_seg["data"]
        )
        # splice before the end-of-page segment
        eop = stream.rindex(struct.pack(">IB", 2, 49))
        spliced = stream[:eop] + raw + stream[eop:]
        out = decode_jbig2_embedded(spliced)
        assert np.array_equal(out["black"], expect(base, top))

    def test_default_pixel_one(self):
        bm = np.zeros((6, 6), bool)
        bm[2, 2] = True
        stream = build_jbig2_embedded(
            bm, default_pixel=1, comb_op=4
        )
        out = decode_jbig2_embedded(stream)
        assert np.array_equal(out["black"], bm)  # REPLACE wins
        stream_or = build_jbig2_embedded(bm, default_pixel=1)
        assert decode_jbig2_embedded(stream_or)["black"].all()

    def test_unknown_segment_type_raises(self):
        stream = build_jbig2_embedded(np.zeros((4, 4), bool))
        bad = struct.pack(">IB", 9, 33) + b"\x00\x01" + struct.pack(
            ">I", 0
        )
        with pytest.raises(ValueError, match="segment type"):
            decode_jbig2_embedded(stream + bad)

    def test_unknown_length_round_trip(self):
        # §7.2.7 carriage: 0xFFFFFFFF header length AND region
        # height, true row count after the 0xFF 0xAC terminator
        rng = np.random.default_rng(3)
        bm = rng.random((13, 21)) < 0.4
        stream = build_jbig2_embedded(bm, unknown_length=True)
        assert struct.pack(">I", 0xFFFFFFFF) in stream
        out = decode_jbig2_embedded(stream)
        assert np.array_equal(out["black"], bm)
        # multi-region: the terminator search must not eat the next
        # segment header
        a = rng.random((6, 9)) < 0.5
        b = rng.random((5, 7)) < 0.5
        stream2 = build_jbig2_embedded(
            [(a, 0, 0), (b, 10, 7)], page_wh=(20, 14),
            unknown_length=True,
        )
        exp = np.zeros((14, 20), bool)
        exp[0:6, 0:9] |= a
        exp[7:12, 10:17] |= b
        assert np.array_equal(
            decode_jbig2_embedded(stream2)["black"], exp
        )

    def test_unknown_length_mmr_gates(self):
        with pytest.raises(NotImplementedError, match="0x00 0x00"):
            build_jbig2_embedded(
                np.zeros((4, 4), bool), mmr=True, unknown_length=True
            )
        # decoder side: a crafted MMR unknown-length header gates too
        body = struct.pack(">IIII", 4, 0xFFFFFFFF, 0, 0)
        body += b"\x00\x01"  # comb op, flags: MMR=1
        seg = struct.pack(">IB", 0, 38) + b"\x00\x01" + struct.pack(
            ">I", 0xFFFFFFFF
        ) + body
        with pytest.raises(NotImplementedError, match="0x00 0x00"):
            parse_jbig2_segments(seg)

    def test_unknown_length_non_region_raises(self):
        bad = struct.pack(">IB", 0, 48) + b"\x00\x01" + struct.pack(
            ">I", 0xFFFFFFFF
        )
        with pytest.raises(ValueError, match="non-generic-region"):
            parse_jbig2_segments(bad)

    def test_truncated_header_raises(self):
        with pytest.raises(ValueError, match="truncated"):
            parse_jbig2_segments(b"\x00\x00\x00\x01\x30")


class TestIntegerCoding:
    def test_round_trip_ladder_boundaries(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            OOB,
            MQDecoder,
            MQEncoder,
            _IntDecoder,
            _IntEncoder,
        )

        vals = [
            0, 1, -1, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436,
            100000, -4436, -99999, 2**31, OOB, 7, OOB, -2,
        ]
        enc = MQEncoder()
        ie = _IntEncoder()
        for v in vals:
            ie.encode(enc, v)
        dec = MQDecoder(enc.flush())
        idd = _IntDecoder()
        out = [idd.decode(dec) for _ in vals]
        assert all(
            (a is OOB and b is OOB) or a == b
            for a, b in zip(vals, out)
        )

    def test_context_history_isolation(self):
        # two interleaved IAx procedures must not share adaptation
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            MQDecoder,
            MQEncoder,
            _IntDecoder,
            _IntEncoder,
        )

        enc = MQEncoder()
        a, b = _IntEncoder(), _IntEncoder()
        seq = [(a, 3), (b, -500), (a, 3), (b, -500), (a, 7), (b, 21)]
        for proc, v in seq:
            proc.encode(enc, v)
        dec = MQDecoder(enc.flush())
        da, db = _IntDecoder(), _IntDecoder()
        got = [
            (da if proc is a else db).decode(dec) for proc, v in seq
        ]
        assert got == [v for _, v in seq]


class TestSymbolText:
    def _glyphs(self):
        return [
            np.array([[1, 0, 1], [0, 1, 0], [1, 0, 1]], bool),
            np.ones((4, 2), bool),
            np.array([[1, 1, 1], [1, 0, 1], [1, 1, 1]], bool),
        ]

    def test_symbol_dict_round_trip_and_remap(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            _build_symbol_dict_data,
            decode_symbol_dict_segment,
        )

        rng = np.random.default_rng(42)
        syms = [
            rng.random((h, w)) < 0.5
            for h, w in [(5, 4), (5, 7), (3, 3), (8, 2), (5, 4)]
        ]
        data, remap = _build_symbol_dict_data(syms)
        exported = decode_symbol_dict_segment(data)
        assert len(exported) == 5
        for i, s in enumerate(syms):
            assert np.array_equal(exported[remap[i]], s)
        # height classes are non-decreasing in export order
        heights = [s.shape[0] for s in exported]
        assert heights == sorted(heights)

    @pytest.mark.parametrize("transposed", [False, True])
    @pytest.mark.parametrize("rc", ["tl", "bl", "tr", "br"])
    def test_text_region_all_refcorners(self, rc, transposed):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            build_jbig2_text_embedded,
            decode_jbig2_embedded,
        )

        glyphs = self._glyphs()
        insts = [
            (0, 2, 1), (1, 7, 0), (2, 11, 2),
            (0, 16, 1), (1, 2, 8), (2, 8, 8),
        ]
        stream = build_jbig2_text_embedded(
            glyphs, insts, (24, 16), refcorner=rc,
            transposed=transposed,
        )
        out = decode_jbig2_embedded(stream)
        exp = np.zeros((16, 24), bool)
        for sid, x, y in insts:
            g = glyphs[sid]
            exp[y : y + g.shape[0], x : x + g.shape[1]] |= g
        assert np.array_equal(out["black"], exp)

    def test_mixed_text_and_generic_page(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            build_jbig2_text_embedded,
            decode_jbig2_embedded,
        )

        glyphs = self._glyphs()
        insts = [(0, 1, 1), (2, 6, 1)]
        extra = np.tri(6, 9, dtype=bool)
        stream = build_jbig2_text_embedded(
            glyphs, insts, (24, 16), template=2,
            extra_generic=(extra, 14, 9),
        )
        out = decode_jbig2_embedded(stream)
        assert out["n_regions"] == 2
        exp = np.zeros((16, 24), bool)
        for sid, x, y in insts:
            g = glyphs[sid]
            exp[y : y + g.shape[0], x : x + g.shape[1]] |= g
        exp[9:15, 14:23] |= extra
        assert np.array_equal(out["black"], exp)

    def test_single_symbol_alphabet(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            build_jbig2_text_embedded,
            decode_jbig2_embedded,
        )

        g = np.ones((2, 2), bool)
        stream = build_jbig2_text_embedded(
            [g], [(0, 0, 0), (0, 4, 4)], (8, 8)
        )
        out = decode_jbig2_embedded(stream)
        exp = np.zeros((8, 8), bool)
        exp[0:2, 0:2] = True
        exp[4:6, 4:6] = True
        assert np.array_equal(out["black"], exp)

    def test_refagg_decodes_empty_dict(self):
        # SDREFAGG decodes since r11 (single-instance refinement);
        # an empty REFAGG dict (0 new symbols, export run 0+0)
        # parses its widened header (GB AT + 2 SDRAT pairs)
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            MQEncoder,
            _IntEncoder,
            decode_symbol_dict_segment,
        )

        enc = MQEncoder()
        iaex = _IntEncoder()
        iaex.encode(enc, 0)
        head = struct.pack(">H", 2)
        head += b"".join(
            struct.pack(">bb", dx, dy)
            for dx, dy in ((3, -1), (-3, -1), (2, -2), (-2, -2))
        )
        head += b"".join(
            struct.pack(">bb", -1, -1) for _ in range(2)
        )
        head += struct.pack(">II", 0, 0)
        assert decode_symbol_dict_segment(head + enc.flush()) == []

    def test_sbhuff_text_region_gates(self):
        # SBHUFF decodes with custom tables (r11); the default
        # selector 0 = standard table B.6 stays an honest gate
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            decode_text_region_segment,
        )

        data = struct.pack(">IIII", 8, 8, 0, 0) + b"\x00"
        data += struct.pack(">HH", 1, 0) + struct.pack(">I", 0)
        with pytest.raises(NotImplementedError, match="SBHUFF standard"):
            decode_text_region_segment(
                data, [np.ones((1, 1), bool)]
            )


class TestHuffmanTables:
    def test_standard_tables_round_trip(self):
        import random

        from ccgp_data_wrangling_spark.operators.jbig2 import (
            HUFF_B1,
            HUFF_B2,
            HUFF_B3,
            HUFF_B4,
            HUFF_B5,
            OOB,
            _HuffReader,
            _HuffWriter,
        )

        rng = random.Random(5)
        cases = [
            (HUFF_B1, lambda: rng.randrange(0, 200000)),
            (HUFF_B2, lambda: rng.choice([rng.randrange(0, 200), OOB])),
            (HUFF_B3, lambda: rng.choice([rng.randrange(-500, 500), OOB])),
            (HUFF_B4, lambda: rng.randrange(1, 300)),
            (HUFF_B5, lambda: rng.randrange(-400, 400)),
        ]
        for tab, domain in cases:
            vals = [domain() for _ in range(400)]
            w = _HuffWriter()
            for v in vals:
                tab.encode(w, v)
            r = _HuffReader(w.getvalue())
            out = [tab.decode(r) for _ in vals]
            assert all(
                (a is OOB and b is OOB) or a == b
                for a, b in zip(vals, out)
            )

    def test_kraft_assertion_fires(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import HuffTable

        with pytest.raises(AssertionError, match="Kraft"):
            HuffTable([(1, 0, 0), (3, 0, 1)])  # 1/2 + 1/8 != 1

    def test_sdhuff_dict_round_trip(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            _build_symbol_dict_data,
            decode_symbol_dict_segment,
        )

        rng = np.random.default_rng(6)
        syms = [
            rng.random((h, w)) < 0.5
            for h, w in [(5, 4), (5, 7), (3, 3), (8, 2), (5, 4), (3, 9)]
        ]
        data, remap = _build_symbol_dict_data(syms, huffman=True)
        exported = decode_symbol_dict_segment(data)
        assert len(exported) == 6
        for i, s in enumerate(syms):
            assert np.array_equal(exported[remap[i]], s)

    def test_sdhuff_uncompressed_collective(self):
        # BMSIZE == 0: raw byte-padded rows (§6.5.9)
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            HUFF_B1,
            HUFF_B2,
            HUFF_B4,
            OOB,
            _HuffWriter,
            decode_symbol_dict_segment,
        )

        rng = np.random.default_rng(2)
        a = rng.random((3, 5)) < 0.5
        b = rng.random((3, 6)) < 0.5
        collective = np.concatenate([a, b], axis=1)  # 3 x 11
        w = _HuffWriter()
        HUFF_B4.encode(w, 3)  # height class 3
        HUFF_B2.encode(w, 5)
        HUFF_B2.encode(w, 1)  # widths 5, 6
        HUFF_B2.encode(w, OOB)
        HUFF_B1.encode(w, 0)  # BMSIZE 0 → uncompressed
        w.raw(np.packbits(collective, axis=1).tobytes())
        HUFF_B1.encode(w, 0)
        HUFF_B1.encode(w, 2)  # export both
        data = struct.pack(">HII", 1, 2, 2) + w.getvalue()
        out = decode_symbol_dict_segment(data)
        assert np.array_equal(out[0], a)
        assert np.array_equal(out[1], b)

    def test_huffman_dict_page_equals_arith(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            build_jbig2_text_embedded,
            decode_jbig2_embedded,
        )

        glyphs = [
            np.array([[1, 0, 1], [0, 1, 0], [1, 0, 1]], bool),
            np.ones((4, 2), bool),
        ]
        insts = [(0, 2, 1), (1, 7, 0), (0, 16, 9)]
        a = decode_jbig2_embedded(
            build_jbig2_text_embedded(glyphs, insts, (24, 16))
        )
        b = decode_jbig2_embedded(
            build_jbig2_text_embedded(
                glyphs, insts, (24, 16), huffman_dict=True
            )
        )
        assert np.array_equal(a["black"], b["black"])

    def test_custom_table_parse_roundtrip(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            OOB,
            _build_table_segment,
            _HuffReader,
            _HuffWriter,
            parse_table_segment,
        )

        spec = {
            "htlow": -4, "hthigh": 12,
            "lines": [(2, 2), (2, 2), (2, 3)],  # [-4,0) [0,4) [4,12)
            "lower_pref": 3, "upper_pref": 4, "oob_pref": 4,
        }
        tab = parse_table_segment(_build_table_segment(spec))
        w = _HuffWriter()
        vals = [-4, -1, 0, 3, 4, 11, 12, 99, -5, -30, OOB]
        for v in vals:
            tab.encode(w, v)
        r = _HuffReader(w.getvalue())
        assert [tab.decode(r) for _ in vals] == vals

    def test_custom_table_bad_tiling_raises(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            _build_table_segment,
        )

        with pytest.raises(ValueError, match="tile"):
            _build_table_segment(
                {
                    "htlow": 0, "hthigh": 5, "lines": [(1, 2)],
                    "lower_pref": 2, "upper_pref": 2,
                }
            )

    def test_custom_dw_dictionary_end_to_end(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            build_jbig2_text_embedded,
            decode_jbig2_embedded,
        )

        spec = {
            "htlow": 0, "hthigh": 8, "lines": [(1, 3)],
            "lower_pref": 3, "upper_pref": 3, "oob_pref": 2,
        }
        symA = np.zeros((5, 4), bool)
        symA[1:4, 1:3] = True
        symB = np.zeros((5, 9), bool)
        symB[::2, ::3] = True
        blob = build_jbig2_text_embedded(
            [symA, symB],
            [(0, 1, 1), (1, 7, 1), (0, 1, 8)],
            (18, 14),
            huffman_dict=True,
            custom_dw_spec=spec,
        )
        page = decode_jbig2_embedded(blob)
        exp = np.zeros((14, 18), bool)
        exp[1:6, 1:5] |= symA
        exp[1:6, 7:16] |= symB
        exp[8:13, 1:5] |= symA
        assert (page["black"] == exp).all()

    def test_custom_selector_without_table_raises(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            decode_symbol_dict_segment,
        )

        # SDHUFFDH selector 3 = custom table, none referred
        with pytest.raises(ValueError, match="no unconsumed"):
            decode_symbol_dict_segment(
                struct.pack(">HII", 1 | (3 << 2), 0, 0)
            )

    def test_reserved_selector_raises(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            decode_symbol_dict_segment,
        )

        with pytest.raises(ValueError, match="reserved"):
            decode_symbol_dict_segment(
                struct.pack(">HII", 1 | (2 << 2), 0, 0)
            )


class TestTextRefinement:
    def _syms(self):
        symA = np.zeros((6, 5), bool)
        symA[1:5, 1:4] = True
        symB = np.zeros((4, 7), bool)
        symB[::2, :] = True
        return symA, symB

    def test_refined_instance_roundtrip(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            build_jbig2_text_embedded,
            decode_jbig2_embedded,
        )

        symA, symB = self._syms()
        refined = np.zeros((7, 7), bool)
        refined[1:6, 1:5] = symA[0:5, 0:4]
        refined[0, 0] = True
        refined[6, 6] = True
        blob = build_jbig2_text_embedded(
            [symA, symB],
            [
                (0, 2, 2),
                (1, 12, 3, None),
                (0, 2, 12, {"bitmap": refined, "rdx": 1, "rdy": -1}),
                (1, 14, 13),
            ],
            (24, 22),
        )
        page = decode_jbig2_embedded(blob)
        exp = np.zeros((22, 24), bool)
        exp[2:8, 2:7] |= symA
        exp[3:7, 12:19] |= symB
        exp[12:19, 2:9] |= refined
        exp[13:17, 14:21] |= symB
        assert (page["black"] == exp).all()

    def test_refined_shrunk_instance(self):
        # negative RDW/RDH: the refined output is SMALLER than the
        # symbol (exercises floor-division reference offsets)
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            build_jbig2_text_embedded,
            decode_jbig2_embedded,
        )

        symA, _ = self._syms()
        shrunk = symA[1:4, 1:4].copy()
        shrunk[0, 0] = not shrunk[0, 0]
        blob = build_jbig2_text_embedded(
            [symA],
            [(0, 1, 1), (0, 8, 1, {"bitmap": shrunk})],
            (14, 9),
        )
        page = decode_jbig2_embedded(blob)
        exp = np.zeros((9, 14), bool)
        exp[1:7, 1:6] |= symA
        exp[1:4, 8:11] |= shrunk
        assert (page["black"] == exp).all()

    def test_refined_transposed_refcorners(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            build_jbig2_text_embedded,
            decode_jbig2_embedded,
        )

        symA, symB = self._syms()
        refined = ~symB.copy()
        for transposed in (False, True):
            for rc in ("bl", "tl", "br", "tr"):
                blob = build_jbig2_text_embedded(
                    [symA, symB],
                    [
                        (0, 1, 1),
                        (1, 9, 2, {"bitmap": refined}),
                    ],
                    (20, 10),
                    refcorner=rc,
                    transposed=transposed,
                )
                page = decode_jbig2_embedded(blob)
                exp = np.zeros((10, 20), bool)
                exp[1:7, 1:6] |= symA
                exp[2:6, 9:16] |= refined
                assert (page["black"] == exp).all(), (transposed, rc)


class TestHalftone:
    def _ramp_patterns(self):
        pats = []
        for i in range(5):
            p = np.zeros(16, bool)
            p[:i] = True
            pats.append(p.reshape(4, 4))
        return pats

    def test_pattern_dict_round_trip(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            _build_pattern_dict_data,
            decode_pattern_dict_segment,
        )

        rng = np.random.default_rng(13)
        pats = [rng.random((3, 5)) < (i / 6) for i in range(7)]
        out = decode_pattern_dict_segment(
            _build_pattern_dict_data(pats)
        )
        assert len(out) == 7
        assert all(np.array_equal(a, b) for a, b in zip(pats, out))

    @pytest.mark.parametrize("template", [0, 1, 2, 3])
    def test_halftone_region_round_trip(self, template):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            build_jbig2_halftone_embedded,
            decode_jbig2_embedded,
        )

        pats = self._ramp_patterns()
        gray = (np.arange(32).reshape(4, 8) * 7 + 3) % 5
        stream = build_jbig2_halftone_embedded(
            gray, pats, template=template
        )
        res = decode_jbig2_embedded(stream)
        assert (res["width"], res["height"]) == (32, 16)
        exp = np.zeros((16, 32), bool)
        for m in range(4):
            for n in range(8):
                exp[m * 4 : m * 4 + 4, n * 4 : n * 4 + 4] = pats[
                    gray[m, n]
                ]
        assert np.array_equal(res["black"], exp)
        # density-ramp patterns: black pixels == sum of gray values
        assert int(res["black"].sum()) == int(gray.sum())

    def test_grayscale_bitplanes_round_trip(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            ArithStats,
            MQDecoder,
            MQEncoder,
            _CX_BITS,
            _decode_grayscale,
            _encode_grayscale,
        )

        rng = np.random.default_rng(3)
        vals = rng.integers(0, 13, (9, 14)).astype(np.int64)
        enc = MQEncoder()
        gbe = ArithStats(1 << _CX_BITS[0])
        _encode_grayscale(enc, gbe, vals, 4, 0)
        dec = MQDecoder(enc.flush())
        gbd = ArithStats(1 << _CX_BITS[0])
        out = _decode_grayscale(dec, gbd, 14, 9, 4, 0)
        assert np.array_equal(out, vals)

    def test_enable_skip_round_trip(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            _build_halftone_region_data,
            decode_halftone_region_segment,
        )

        pats = self._ramp_patterns()
        gray = (np.arange(32).reshape(4, 8) * 7 + 3) % 5
        gray[:, 0] = 0  # the skipped column is never gray-coded
        data = _build_halftone_region_data(
            gray, pats, (28, 16), grid_origin=(-4, 0),
            enable_skip=True,
        )
        res = decode_halftone_region_segment(data, pats)
        exp = np.zeros((16, 28), bool)
        for m in range(4):
            for n in range(1, 8):
                x = -4 + n * 4
                exp[m * 4 : m * 4 + 4, x : x + 4] = pats[gray[m, n]]
        assert np.array_equal(res["bitmap"], exp)
        # skipped cells carry no coded bits: a nonzero gray there
        # is an encoder error
        bad = gray.copy()
        bad[0, 0] = 3
        with pytest.raises(ValueError, match="skipped cells"):
            _build_halftone_region_data(
                bad, pats, (28, 16), grid_origin=(-4, 0),
                enable_skip=True,
            )

    def test_hmmr_truncated_payload_rejected(self):
        # HMMR DECODES now (r12, TestHMMRHalftone) — a nonzero grid
        # with an empty MMR payload fails the T.6 walk instead of
        # gating
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            decode_halftone_region_segment,
        )

        data = struct.pack(">IIII", 8, 8, 0, 0) + b"\x00\x01"
        data += struct.pack(">IIii", 2, 2, 0, 0)
        data += struct.pack(">HH", 2 << 8, 0)
        with pytest.raises(ValueError, match="T.6"):
            decode_halftone_region_segment(
                data, [np.ones((2, 2), bool)]
            )

    def test_gray_value_overflow_raises(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            _build_halftone_region_data,
        )

        with pytest.raises(ValueError, match="exceeds"):
            _build_halftone_region_data(
                np.array([[5]]), [np.ones((2, 2), bool)] * 2, (2, 2)
            )


class TestRefinement:
    @pytest.mark.parametrize("template", [0, 1])
    @pytest.mark.parametrize("tpgron", [False, True])
    def test_bitmap_round_trip(self, template, tpgron):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            MQDecoder,
            MQEncoder,
            decode_refinement_bitmap,
            encode_refinement_bitmap,
        )

        rng = np.random.default_rng(template * 2 + tpgron)
        ref = rng.random((14, 22)) < 0.4
        target = ref.copy()
        target.flat[rng.integers(0, ref.size, 9)] ^= True
        enc = MQEncoder()
        encode_refinement_bitmap(
            enc, target, ref.astype(np.uint8),
            template=template, tpgron=tpgron,
        )
        dec = MQDecoder(enc.flush())
        out = decode_refinement_bitmap(
            dec, 22, 14, ref.astype(np.uint8),
            template=template, tpgron=tpgron,
        )
        assert np.array_equal(out, target)

    def test_displaced_reference_predicts(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            MQDecoder,
            MQEncoder,
            decode_refinement_bitmap,
            encode_refinement_bitmap,
        )

        rng = np.random.default_rng(8)
        ref = rng.random((12, 12)) < 0.5
        target = np.roll(ref, (1, 2), (0, 1))
        enc = MQEncoder()
        encode_refinement_bitmap(
            enc, target, ref.astype(np.uint8), rdx=2, rdy=1
        )
        data = enc.flush()
        out = decode_refinement_bitmap(
            MQDecoder(data), 12, 12, ref.astype(np.uint8),
            rdx=2, rdy=1,
        )
        assert np.array_equal(out, target)
        # a perfectly-predicted bitmap codes into a handful of bytes
        assert len(data) <= 24

    @pytest.mark.parametrize("template", [0, 1])
    def test_embedded_refined_page(self, template):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            build_jbig2_refined_embedded,
            decode_jbig2_embedded,
        )

        base = np.zeros((16, 24), bool)
        base[:, :11] = True
        target = base.copy()
        target[0] = ~target[0]
        target[15] = False
        stream = build_jbig2_refined_embedded(
            base, target, template=template, tpgron=(template == 1)
        )
        res = decode_jbig2_embedded(stream)
        assert np.array_equal(res["black"], target)

    def test_refinement_reads_page_state_in_order(self):
        # the reference is the page AFTER the base region composed —
        # dropping the base segment must change the refined output
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            build_jbig2_refined_embedded,
            decode_jbig2_embedded,
            parse_jbig2_segments,
        )

        rng = np.random.default_rng(4)
        base = rng.random((10, 12)) < 0.5
        target = base.copy()
        target[3, 4] ^= True
        stream = build_jbig2_refined_embedded(base, target)
        segs = parse_jbig2_segments(stream)
        assert [s["type"] for s in segs] == [48, 39, 43, 49]
        ok = decode_jbig2_embedded(stream)
        assert np.array_equal(ok["black"], target)
        # splice the generic (base) segment out: reference = blank
        import struct as _s

        rebuilt = b""
        pos_map = []
        pos = 0
        for s in segs:
            hdr_len = 11  # 4 num + 1 flags + 1 refcount + 1 page + 4 len
            body = len(s["data"])
            pos_map.append((pos, pos + hdr_len + body))
            pos += hdr_len + body
        keep = [0, 2, 3]  # drop the type-39 base region
        for k in keep:
            a, b = pos_map[k]
            rebuilt += stream[a:b]
        degraded = decode_jbig2_embedded(rebuilt)
        assert not np.array_equal(degraded["black"], target)

    def test_intermediate_refinement_gates(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            build_jbig2_embedded,
            decode_jbig2_embedded,
        )

        stream = build_jbig2_embedded(np.zeros((4, 4), bool))
        bad = struct.pack(">IB", 9, 40) + b"\x00\x01" + struct.pack(
            ">I", 0
        )
        with pytest.raises(NotImplementedError, match="refinement"):
            decode_jbig2_embedded(stream + bad)


class TestPdfIntegration:
    def test_pdf_jbig2_variants(self):
        from ccgp_data_wrangling_spark.sources.pdf import (
            build_pdf,
            pdf_images,
        )

        mask = np.zeros((16, 24), bool)
        mask[:, :9] = True
        exp = round(255.0 * 15 / 24.0, 4)
        for opts in (
            {},
            {"template": 1},
            {"template": 2, "tpgdon": True},
            {"mmr": True},
        ):
            blob = build_pdf(
                [["scan"]], page_images=[[("jbig2", mask, opts)]]
            )
            (r,) = pdf_images(blob)
            assert r["codec"] == "jbig2"
            assert (r["width"], r["height"]) == (24, 16)
            assert r["luma_mean"] == pytest.approx(exp)

    def test_decode_array_inverts_polarity(self):
        from ccgp_data_wrangling_spark.sources.pdf import (
            build_pdf,
            pdf_images,
        )

        mask = np.zeros((16, 24), bool)
        mask[:, :9] = True
        blob = build_pdf(
            [["scan"]], page_images=[[("jbig2", mask)]]
        )
        blob = blob.replace(
            b"/Filter /JBIG2Decode",
            b"/Filter /JBIG2Decode /Decode [1 0]",
        )
        (r,) = pdf_images(blob)
        assert r["luma_mean"] == pytest.approx(
            round(255.0 * 9 / 24.0, 4)
        )

    def test_partial_decode_array_gates(self):
        from ccgp_data_wrangling_spark.sources.pdf import (
            build_pdf,
            pdf_images,
        )

        mask = np.zeros((8, 8), bool)
        blob = build_pdf(
            [["scan"]], page_images=[[("jbig2", mask)]]
        )
        blob = blob.replace(
            b"/Filter /JBIG2Decode",
            b"/Filter /JBIG2Decode /Decode [0.2 0.8]",
        )
        with pytest.raises(NotImplementedError, match="partial-range"):
            pdf_images(blob)

    def test_globals_gate(self):
        from ccgp_data_wrangling_spark.sources.pdf import (
            build_pdf,
            pdf_images,
        )

        mask = np.zeros((8, 8), bool)
        blob = build_pdf(
            [["scan"]], page_images=[[("jbig2", mask)]]
        )
        blob = blob.replace(
            b"/Filter /JBIG2Decode",
            b"/Filter /JBIG2Decode /DecodeParms << /JBIG2Globals 99 0 R >>",  # noqa: E501
        )
        with pytest.raises(NotImplementedError, match="JBIG2Globals"):
            pdf_images(blob)

    def test_dimension_mismatch_raises(self):
        from ccgp_data_wrangling_spark.sources.pdf import (
            build_pdf,
            pdf_images,
        )

        mask = np.zeros((8, 8), bool)
        blob = build_pdf(
            [["scan"]], page_images=[[("jbig2", mask)]]
        )
        blob = blob.replace(b"/Width 8", b"/Width 9")
        with pytest.raises(ValueError, match="disagree"):
            pdf_images(blob)


class TestMQCarry:
    def test_stuffed_byte_carries_bit27(self):
        """Regression: Figure E.9's shortened branch emits C bits
        27..20 UNMASKED — the carry rides the stuffed byte's MSB and
        the decoder recovers it via the <<9 window. Skewed streams
        (long MPS runs at high states) hit the case; masking to 0x7F
        silently corrupted them."""
        import numpy as np

        from ccgp_data_wrangling_spark.operators.jbig2 import (
            ArithStats,
            MQDecoder,
            MQEncoder,
        )

        rng = np.random.default_rng(1)
        saw_high_stuffed = False
        for _ in range(60):
            n = 1500
            cxs = rng.integers(0, 19, n)
            bias = rng.random()
            bits = (rng.random(n) < bias).astype(int)
            enc = MQEncoder()
            st = ArithStats(19)
            st.icx[:] = bytes([46]) * len(st.icx)  # high states → long MPS runs → carries
            for c, b in zip(cxs, bits):
                enc.encode(int(c), int(b), st)
            payload = enc.flush()
            for i in range(len(payload) - 2):  # skip terminal FFAC
                if payload[i] == 0xFF and 0x80 <= payload[i + 1] <= 0x8F:
                    saw_high_stuffed = True
            dec = MQDecoder(payload)
            st2 = ArithStats(19)
            st2.icx[:] = bytes([46]) * len(st2.icx)
            got = [dec.decode(int(c), st2) for c in cxs]
            assert got == list(bits)
        # the fuzz corpus must actually exercise the carry case
        assert saw_high_stuffed


class TestSBHuffText:
    def _syms(self):
        symA = np.zeros((6, 5), bool)
        symA[1:5, 1:4] = True
        symB = np.zeros((4, 7), bool)
        symB[::2, :] = True
        symC = np.eye(5, dtype=bool)
        return [symA, symB, symC]

    def test_all_placements_round_trip(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            build_jbig2_text_embedded,
            decode_jbig2_embedded,
        )

        syms = self._syms()
        symA, symB, symC = syms
        for rc in ("tl", "bl", "br", "tr"):
            for tp in (False, True):
                blob = build_jbig2_text_embedded(
                    syms,
                    [(0, 2, 2), (1, 12, 3), (2, 2, 12),
                     (1, 14, 13), (2, 9, 12)],
                    (24, 22), refcorner=rc, transposed=tp,
                    huffman_text=True,
                )
                page = decode_jbig2_embedded(blob)
                exp = np.zeros((22, 24), bool)
                exp[2:8, 2:7] |= symA
                exp[3:7, 12:19] |= symB
                exp[12:17, 2:7] |= symC
                exp[13:17, 14:21] |= symB
                exp[12:17, 9:14] |= symC
                assert (page["black"] == exp).all(), (rc, tp)

    def test_full_huffman_pipeline(self):
        # SDHUFF dictionary with a custom DW table AND an SBHUFF text
        # region in one stream — four custom tables consumed by two
        # different segments in reference order
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            build_jbig2_text_embedded,
            decode_jbig2_embedded,
        )

        syms = self._syms()
        symA, _, symC = syms
        spec = {
            "htlow": 0, "hthigh": 8, "lines": [(1, 3)],
            "lower_pref": 3, "upper_pref": 3, "oob_pref": 2,
        }
        blob = build_jbig2_text_embedded(
            syms, [(0, 1, 1), (2, 8, 1)], (16, 9),
            huffman_dict=True, custom_dw_spec=spec,
            huffman_text=True,
        )
        page = decode_jbig2_embedded(blob)
        exp = np.zeros((9, 16), bool)
        exp[1:7, 1:6] |= symA
        exp[1:6, 8:13] |= symC
        assert (page["black"] == exp).all()

    def test_non_power_of_two_alphabet(self):
        # 3 symbols → balanced canonical lengths (1, 2, 2): the
        # runcode table carries two distinct lengths
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            build_jbig2_text_embedded,
            decode_jbig2_embedded,
        )

        syms = self._syms()
        blob = build_jbig2_text_embedded(
            syms, [(i, 1 + 8 * i, 1) for i in range(3)], (28, 8),
            huffman_text=True,
        )
        page = decode_jbig2_embedded(blob)
        exp = np.zeros((8, 28), bool)
        for i, s in enumerate(syms):
            exp[1 : 1 + s.shape[0], 1 + 8 * i : 1 + 8 * i + s.shape[1]] |= s
        assert (page["black"] == exp).all()

    def test_standard_table_selectors_gate(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            build_jbig2_text_embedded,
            decode_jbig2_embedded,
        )

        syms = self._syms()
        blob = build_jbig2_text_embedded(
            syms, [(0, 1, 1), (1, 8, 1)], (18, 8),
            huffman_text=True,
        )
        # flip the FS selector from custom (3) to standard B.6 (0):
        # hflags is the 2 bytes after the text-region flags
        import re as _re

        # the text segment flags start with bit0=1 (SBHUFF); find the
        # hflags value 0x003F (custom FS|DS|DT) and clear FS bits
        bad = blob.replace(
            struct.pack(">H", 0x003F), struct.pack(">H", 0x003C), 1
        )
        assert bad != blob
        with pytest.raises(NotImplementedError, match="B.6-B.15"):
            decode_jbig2_embedded(bad)

    def test_single_symbol_raises(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            build_jbig2_text_embedded,
        )

        with pytest.raises(ValueError, match="2 symbols"):
            build_jbig2_text_embedded(
                [np.eye(3, dtype=bool)], [(0, 1, 1)], (8, 8),
                huffman_text=True,
            )

    def test_huffman_refine_encoder_gates(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            build_jbig2_text_embedded,
        )

        syms = self._syms()
        with pytest.raises(NotImplementedError, match="SBREFINE"):
            build_jbig2_text_embedded(
                syms,
                [(0, 1, 1, {"bitmap": syms[1]})],
                (16, 9),
                huffman_text=True,
            )


class TestSDRefAgg:
    def _fixture(self):
        symA = np.zeros((6, 5), bool)
        symA[1:5, 1:4] = True
        symB = np.zeros((4, 7), bool)
        symB[::2, :] = True
        refA = np.zeros((7, 6), bool)
        refA[1:7, 1:6] = symA
        refA[0, 0] = True
        refB = symB.copy()
        refB[1, 3] = True
        refB[0, 0] = False
        return symA, symB, refA, refB

    @pytest.mark.parametrize("rtemplate", [0, 1])
    def test_refagg_dictionary_round_trip(self, rtemplate):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            build_jbig2_refagg_text_embedded,
            decode_jbig2_embedded,
        )

        symA, symB, refA, refB = self._fixture()
        blob = build_jbig2_refagg_text_embedded(
            [symA, symB],
            [(0, refA, 0, -1), (1, refB, 1, 0)],
            [(0, 1, 1), (2, 8, 1), (1, 16, 1), (3, 1, 10),
             (2, 9, 10)],
            (26, 18),
            rtemplate=rtemplate,
        )
        page = decode_jbig2_embedded(blob)
        exp = np.zeros((18, 26), bool)
        exp[1:7, 1:6] |= symA
        exp[1:8, 8:14] |= refA
        exp[1:5, 16:23] |= symB
        exp[10:14, 1:8] |= refB
        exp[10:17, 9:15] |= refA
        assert (page["black"] == exp).all()

    def test_refagg_truncated_aggregate_rejected(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            MQEncoder,
            _encode_iaid,
            _IntEncoder,
            ArithStats,
            decode_symbol_dict_segment,
        )

        # hand-build a REFAGG dict whose first symbol claims 2
        # aggregate instances
        enc = MQEncoder()
        iadh, iadw, iaai = _IntEncoder(), _IntEncoder(), _IntEncoder()
        iadh.encode(enc, 3)
        iadw.encode(enc, 3)
        iaai.encode(enc, 2)
        head = struct.pack(">H", 2)
        head += b"".join(
            struct.pack(">bb", dx, dy)
            for dx, dy in ((3, -1), (-3, -1), (2, -2), (-2, -2))
        )
        head += b"".join(
            struct.pack(">bb", dx, dy) for dx, dy in ((-1, -1),) * 2
        )
        head += struct.pack(">II", 1, 1)
        # REFAGGNINST > 1 DECODES now (r12) — this truncated stream
        # (no nested text-region payload follows the IAAI=2) fails
        # validation instead of gating
        with pytest.raises(ValueError, match="undecoded symbol"):
            decode_symbol_dict_segment(
                head + enc.flush(), [np.ones((2, 2), bool)]
            )

    def test_sdhuff_refagg_gates_on_b15(self):
        # r13: SDHUFF+SDREFAGG decodes when Table B.15 arrives via
        # the codec_tables hook (tests/test_codec_tables.py); with
        # the hook unset the gate names the table
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            decode_symbol_dict_segment,
        )

        with pytest.raises(NotImplementedError, match="B.15"):
            decode_symbol_dict_segment(
                struct.pack(">H", 3 | (1 << 12))
                + struct.pack(">II", 1, 1)
            )


def test_symbol_id_runcode_repeat_after_zero_run():
    # T.88 §7.4.4.1.1.1: runcode 32 repeats the PREVIOUS symbol's
    # length, which is 0 immediately after a zero-run (33/34).
    # The in-repo encoder never emits 32 after 33/34, so this pins
    # the third-party sequence directly (r11 ADVICE fix).
    from ccgp_data_wrangling_spark.operators.jbig2 import (
        HuffTable,
        _HuffReader,
        _HuffWriter,
        _read_symbol_id_code_lengths,
    )

    run_lens = [0] * 35
    run_lens[4], run_lens[32], run_lens[33] = 1, 2, 2  # Kraft = 1
    runtab = HuffTable(
        [(ln, 0, i) for i, ln in enumerate(run_lens) if ln]
    )
    w = _HuffWriter()
    for ln in run_lens:
        w.bits(ln, 4)
    runtab.encode(w, 4)                 # explicit length 4
    runtab.encode(w, 33)
    w.bits(0, 3)                        # zero-run of 3 → prev := 0
    runtab.encode(w, 32)
    w.bits(0, 2)                        # repeat-prev ×3 → three ZEROS
    r = _HuffReader(w.getvalue())
    assert _read_symbol_id_code_lengths(r, 7) == [4, 0, 0, 0, 0, 0, 0]

    # and 32 after an explicit length still repeats that length
    w2 = _HuffWriter()
    for ln in run_lens:
        w2.bits(ln, 4)
    runtab.encode(w2, 4)
    runtab.encode(w2, 32)
    w2.bits(0, 2)
    r2 = _HuffReader(w2.getvalue())
    assert _read_symbol_id_code_lengths(r2, 4) == [4, 4, 4, 4]


class TestRefAggNInst:
    """REFAGGNINST > 1 (§6.5.8.2.1): a full text region nested in a
    symbol dictionary — SBSTRIPS=1, TL corner, OR, REFINE=1 over the
    dictionary's persistent integer contexts."""

    def _parts(self):
        A = np.zeros((6, 5), bool)
        A[1:5, 1:4] = True
        A[2, 2] = False
        B = np.zeros((5, 5), bool)
        B[0, :] = True
        B[:, 2] = True
        Br = np.zeros((5, 6), bool)
        Br[0, :] = True
        Br[:, 3] = True
        Br[4, 0] = True
        return A, B, Br

    @pytest.mark.parametrize("rtemplate", [0, 1])
    def test_aggregate_roundtrip(self, rtemplate):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            _compose_agg_symbol,
            build_jbig2_refagg_text_embedded,
            decode_jbig2_embedded,
        )

        A, B, Br = self._parts()
        bases = [A, B]
        agg = {
            "shape": (12, 14),
            "agg": [
                (0, 0, 0),           # A, strip t=0
                (1, 6, 0),           # B, same strip
                (1, 2, 6,            # refined B, strip t=6
                 {"bitmap": Br, "rdx": 0, "rdy": 0}),
            ],
        }
        single = (0, np.roll(A, 1, axis=1), 0, 0)
        blob = build_jbig2_refagg_text_embedded(
            bases, [single, agg],
            instances=[(0, 1, 1), (2, 8, 1), (3, 1, 9)],
            page_wh=(40, 24), rtemplate=rtemplate,
        )
        page = decode_jbig2_embedded(blob)
        comp = _compose_agg_symbol(
            agg, [a.astype(np.uint8) for a in bases]
        )
        exp = np.zeros((24, 40), bool)
        exp[1:7, 1:6] |= A
        exp[1:7, 8:13] |= np.roll(A, 1, axis=1)
        exp[9:21, 1:15] |= comp
        assert (page["black"] == exp).all()

    def test_aggregate_multi_instance_strip_order(self):
        # three strips incl. one with two instances whose second S
        # is coded relative to CURS after the first's width advance
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            _compose_agg_symbol,
            build_jbig2_refagg_text_embedded,
            decode_jbig2_embedded,
        )

        A, B, _ = self._parts()
        agg = {
            "shape": (18, 20),
            "agg": [
                (1, 0, 0), (1, 8, 0), (1, 14, 0),
                (0, 3, 6),
                (1, 0, 13), (0, 10, 12),
            ],
        }
        blob = build_jbig2_refagg_text_embedded(
            [A, B], [agg], instances=[(2, 2, 2)], page_wh=(26, 22),
        )
        page = decode_jbig2_embedded(blob)
        comp = _compose_agg_symbol(
            agg, [A.astype(np.uint8), B.astype(np.uint8)]
        )
        exp = np.zeros((22, 26), bool)
        exp[2:20, 2:22] |= comp
        assert (page["black"] == exp).all()

    def test_aggregate_spec_validation(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            build_jbig2_refagg_text_embedded,
        )

        A, B, _ = self._parts()
        with pytest.raises(ValueError, match="exceeds the symbol"):
            build_jbig2_refagg_text_embedded(
                [A, B],
                [{"shape": (4, 4), "agg": [(0, 0, 0), (1, 1, 1)]}],
                instances=[(2, 0, 0)], page_wh=(10, 10),
            )
        with pytest.raises(ValueError, match="2 instances"):
            build_jbig2_refagg_text_embedded(
                [A, B],
                [{"shape": (8, 8), "agg": [(0, 0, 0)]}],
                instances=[(2, 0, 0)], page_wh=(10, 10),
            )


class TestHMMRHalftone:
    """HMMR=1 (§6.6 / Annex C.5): Gray-coded bitplanes as one
    bit-concatenated EOFB-separated T.6 block; HDMMR pattern dicts."""

    def _pats(self):
        pats = []
        for i in range(8):
            p = np.zeros(16, bool)
            p[:i] = True
            pats.append(p.reshape(4, 4))
        return pats

    def test_mmr_matches_arithmetic(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            build_jbig2_halftone_embedded,
            decode_jbig2_embedded,
        )

        rng = np.random.default_rng(11)
        pats = self._pats()
        gray = rng.integers(0, 8, (6, 9))
        pages = [
            decode_jbig2_embedded(
                build_jbig2_halftone_embedded(gray, pats, mmr=m)
            )["black"]
            for m in (False, True)
        ]
        assert (pages[0] == pages[1]).all()
        exp = np.zeros((24, 36), bool)
        for m in range(6):
            for n in range(9):
                exp[m * 4:(m + 1) * 4, n * 4:(n + 1) * 4] |= pats[
                    gray[m, n]
                ]
        assert (pages[1] == exp).all()

    def test_mmr_plane_resume_is_bit_level(self):
        # 3 bpp over a grid whose planes are incompressible enough
        # that EOFBs land mid-byte — byte-padding between planes
        # would shift every later plane
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            _gray_fold,
            _gray_unfold,
            _mmr_decode_planes,
            _mmr_encode_planes,
        )

        rng = np.random.default_rng(13)
        vals = rng.integers(0, 8, (7, 11)).astype(np.int64)
        planes = _gray_fold(vals, 3)
        blob = _mmr_encode_planes(planes)
        back = _mmr_decode_planes(blob, 11, 7, 3)
        for a, b in zip(planes, back):
            assert (a == b).all()
        assert (_gray_unfold(back, 3) == vals).all()

    def test_skip_with_mmr_rejected(self):
        from ccgp_data_wrangling_spark.operators.jbig2 import (
            build_jbig2_halftone_embedded,
        )

        gray = np.zeros((2, 2), np.int64)
        with pytest.raises(ValueError, match="HENABLESKIP"):
            build_jbig2_halftone_embedded(
                gray, self._pats()[:2], mmr=True, enable_skip=True
            )
