"""Legacy .doc (Word 97 binary) extraction: FIB, piece table with
out-of-order mixed ANSI/Unicode pieces, control-char normalization,
table-stream selection, honest gates."""

from __future__ import annotations

import struct

import pytest

from ccgp_data_wrangling_spark.sources.doc import (
    build_doc,
    extract_doc_paragraphs,
)


class TestExtract:
    def test_paragraphs_round_trip(self):
        paras = ["hello world", "second para", "", "tail"]
        assert extract_doc_paragraphs(build_doc(paras)) == paras

    def test_mixed_ansi_unicode_pieces_out_of_order(self):
        # the greek paragraph forces a UTF-16 piece; cp1252 covers
        # the accented/latin one; pieces are stored in REVERSED fc
        # order, so CP-order reconstruction is load-bearing
        paras = ["naïve café — über", "greek: αβγδε", "plain ascii"]
        blob = build_doc(paras, piece_chars=7)
        assert extract_doc_paragraphs(blob) == paras

    def test_piece_boundary_inside_surrogate_free_text(self):
        # split every 3 CPs: boundaries land inside words, fields,
        # and cell marks
        paras = ["abcdefgh", ("cells", ["x1", "y2"]),
                 ("field", "HYPERLINK u", "shown")]
        blob = build_doc(paras, piece_chars=3)
        assert extract_doc_paragraphs(blob) == [
            "abcdefgh", "x1\ty2", "shown",
        ]

    def test_control_char_model(self):
        paras = [("br", "line1", "line2"), ("cells", ["a", "b", "c"]),
                 ("field", "REF bookmark", "result text")]
        assert extract_doc_paragraphs(build_doc(paras)) == [
            "line1\nline2", "a\tb\tc", "result text",
        ]

    def test_decoy_table_stream_never_read(self):
        # build_doc plants garbage in 0Table; fWhichTblStm selects
        # 1Table. Clearing the flag must switch streams (and fail on
        # the garbage), proving the selection is honored.
        from ccgp_data_wrangling_spark.sources.doc import _build_cfb
        from ccgp_data_wrangling_spark.sources.xls import (
            read_cfb_stream,
        )

        blob = build_doc(["visible text"])
        word = bytearray(read_cfb_stream(blob, ("WordDocument",)))
        t1 = read_cfb_stream(blob, ("1Table",))
        t0 = read_cfb_stream(blob, ("0Table",))
        struct.pack_into("<H", word, 10, 0x0000)  # fWhichTblStm = 0
        patched = _build_cfb([
            ("WordDocument", bytes(word)),
            ("1Table", t1),
            ("0Table", t0),
        ])
        with pytest.raises(ValueError):
            extract_doc_paragraphs(patched)

    def test_ccp_text_clips_trailing_cps(self):
        # shrink ccpText (fibRgLw dword 3, byte offset 76 in the FIB:
        # 32 base + 2 + 28 fibRgW + 2 + 12) — trailing pieces beyond
        # the main document (footnote/header CP space) must not leak
        from ccgp_data_wrangling_spark.sources.doc import _build_cfb
        from ccgp_data_wrangling_spark.sources.xls import (
            read_cfb_stream,
        )

        blob = build_doc(["keep me", "drop me entirely"],
                         piece_chars=8)
        word = bytearray(read_cfb_stream(blob, ("WordDocument",)))
        t1 = read_cfb_stream(blob, ("1Table",))
        struct.pack_into("<I", word, 76, 8)  # "keep me\r"
        patched = _build_cfb([
            ("WordDocument", bytes(word)),
            ("1Table", t1),
            ("0Table", b"x"),
        ])
        assert extract_doc_paragraphs(patched) == ["keep me"]

    def test_encrypted_gate(self):
        from ccgp_data_wrangling_spark.sources.doc import _build_cfb
        from ccgp_data_wrangling_spark.sources.xls import (
            read_cfb_stream,
        )

        blob = build_doc(["secret"])
        word = bytearray(read_cfb_stream(blob, ("WordDocument",)))
        flags = struct.unpack_from("<H", word, 10)[0]
        struct.pack_into("<H", word, 10, flags | 0x0100)
        patched = _build_cfb([
            ("WordDocument", bytes(word)),
            ("1Table", read_cfb_stream(blob, ("1Table",))),
        ])
        with pytest.raises(NotImplementedError, match="encrypted"):
            extract_doc_paragraphs(patched)

    def test_not_a_doc(self):
        with pytest.raises(ValueError, match="bad magic"):
            extract_doc_paragraphs(b"plain text, not CFB")
        from ccgp_data_wrangling_spark.sources.xls import write_xls

        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".xls") as fh:
            write_xls(fh.name, {"S": [["x"]]})
            xls_blob = open(fh.name, "rb").read()
        with pytest.raises(ValueError, match="WordDocument"):
            extract_doc_paragraphs(xls_blob)


class TestSparkOperator:
    def test_doc_documents(self, spark):
        from ccgp_data_wrangling_spark.sources.doc import doc_documents

        blob = build_doc(["alpha", "βeta"])
        df = spark.createDataFrame(
            [(9, bytearray(blob))], "doc_id long, payload binary"
        )
        rows = sorted(
            (r["para"], r["text"], r["n_chars"])
            for r in doc_documents(df).collect()  # 2 rows, test-only
        )
        assert rows == [(0, "alpha", 5), (1, "βeta", 4)]
