"""RTF text extraction — control words, destinations, escapes."""

from __future__ import annotations

import pytest

from ccgp_data_wrangling_spark.sources.rtf import (
    build_rtf,
    extract_rtf_paragraphs,
)


class TestExtract:
    def test_plain_paragraphs(self):
        blob = build_rtf(["hello world", "second para"])
        assert extract_rtf_paragraphs(blob) == [
            "hello world", "second para"
        ]

    def test_destinations_never_leak(self):
        blob = build_rtf(["visible"])
        paras = extract_rtf_paragraphs(blob)
        joined = "".join(paras)
        assert "Decoy" not in joined
        assert "generator" not in joined
        assert "Times" not in joined
        assert paras == ["visible"]

    def test_tab_and_line(self):
        blob = build_rtf([["a", ("tab",), "b", ("br",), "c"]])
        assert extract_rtf_paragraphs(blob) == ["a\tb\nc"]

    def test_escaped_braces_and_backslash(self):
        blob = build_rtf(["x{y}z\\w"])
        assert extract_rtf_paragraphs(blob) == ["x{y}z\\w"]

    def test_hex_escape_cp1252(self):
        blob = build_rtf(["café ’curly’"])
        # é is cp1252 (\'e9); curly quotes are \uN with ? fallback
        assert b"\\'e9" in blob
        assert extract_rtf_paragraphs(blob) == [
            "café ’curly’"
        ]

    def test_unicode_negative_param(self):
        # CJK beyond 0x7FFF encodes as a negative \u param
        blob = build_rtf(["語"])
        assert b"\\u-" in blob
        assert extract_rtf_paragraphs(blob) == ["語"]

    def test_uc_fallback_skipping(self):
        raw = (
            b"{\\rtf1\\ansi\\uc2 pre \\u945 XY post\\par}"
        )
        # \uc2 → the two chars after \u945 are fallback, skipped
        assert extract_rtf_paragraphs(raw) == ["pre α post"]

    def test_par_inside_fallback_window_consumed(self):
        # \par while a \uN fallback skip is pending counts as the
        # swallowed fallback char: no break, skip consumed
        raw = b"{\\rtf1 a\\u945\\par b\\par}"
        assert extract_rtf_paragraphs(raw) == ["aαb"]

    def test_tab_inside_fallback_window_consumed(self):
        raw = b"{\\rtf1 x\\u233\\tab y\\par}"
        assert extract_rtf_paragraphs(raw) == ["xéy"]

    def test_bin_skips_raw_bytes(self):
        raw = (
            b"{\\rtf1 a\\bin3 \x01{\\x b\\par}"
        )
        # 3 raw bytes after \bin3's delimiter space: \x01, '{', '\\'
        # — brace inside binary data must NOT count as a group
        assert extract_rtf_paragraphs(raw) == ["ax b"]

    def test_trailing_fragment_counts(self):
        raw = b"{\\rtf1 first\\par tail}"
        assert extract_rtf_paragraphs(raw) == ["first", "tail"]

    def test_nbsp_and_hyphens(self):
        raw = b"{\\rtf1 a\\~b\\-c\\_d\\par}"
        assert extract_rtf_paragraphs(raw) == ["a bc-d"]

    def test_not_rtf_raises(self):
        with pytest.raises(ValueError, match="not an RTF"):
            extract_rtf_paragraphs(b"plain text")


class TestSparkOperator:
    def test_rtf_documents_explode(self, spark):
        from ccgp_data_wrangling_spark.sources.rtf import rtf_documents

        blobs = [
            (0, build_rtf(["alpha", ["b", ("tab",), "c"]])),
            (1, build_rtf(["café"])),
        ]
        df = spark.createDataFrame(blobs, "doc_id long, payload binary")
        rows = {
            (r.doc_id, r.para): (r.text, r.n_chars)
            for r in rtf_documents(df).collect()
        }
        assert rows == {
            (0, 0): ("alpha", 5),
            (0, 1): ("b\tc", 3),
            (1, 0): ("café", 4),
        }
