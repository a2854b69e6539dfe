"""EPUB (OCF/OPF/XHTML) text extraction — spine order, inline flatten."""

from __future__ import annotations

import io
import zipfile

import pytest

from ccgp_data_wrangling_spark.sources.epub import (
    build_epub,
    extract_epub_chapters,
)


class TestExtract:
    def test_spine_order_beats_storage_order(self):
        blob = build_epub([["chapter one"], ["chapter two"]])
        # fixture stores documents in REVERSE; spine must win
        chapters = extract_epub_chapters(blob)
        assert chapters == [
            ["chapter one"], ["chapter two"]
        ]

    def test_inline_markup_flattens(self):
        blob = build_epub([["hello world"]])
        # fixture wraps the second half in <em>
        assert extract_epub_chapters(blob) == [["hello world"]]

    def test_headings_lists_and_br(self):
        blob = build_epub(
            [[("h1", "Title"), ("li", ["a", "b"]), ("brp", "x", "y")]]
        )
        assert extract_epub_chapters(blob) == [
            ["Title", "a", "b", "x\ny"]
        ]

    def test_script_style_never_leak(self):
        blob = build_epub([["visible"]])
        for ch in extract_epub_chapters(blob):
            for p in ch:
                assert "never text" not in p
                assert "color" not in p

    def test_innermost_block_wins(self):
        # a block with nested blocks: the nested block is its own
        # paragraph AND the outer block's direct character data
        # survives as paragraph runs (document order)
        blob = build_epub([["placeholder"]])
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            doc = zf.read("OEBPS/text/ch0.xhtml").decode()
            rest = {
                n: zf.read(n)
                for n in zf.namelist()
                if n != "OEBPS/text/ch0.xhtml"
            }
        doc = doc.replace(
            "<body>",
            "<body><blockquote>lead <p>inner para</p> tail"
            "</blockquote>",
        )
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            for n, b in rest.items():
                zf.writestr(n, b)
            zf.writestr("OEBPS/text/ch0.xhtml", doc)
        chapters = extract_epub_chapters(buf.getvalue())
        assert chapters == [
            ["lead ", "inner para", " tail", "placeholder"]
        ]

    def test_entities_unescape(self):
        blob = build_epub([["a & b < c"]])
        assert extract_epub_chapters(blob) == [["a & b < c"]]

    def test_missing_container_raises(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("mimetype", "application/epub+zip")
        with pytest.raises(ValueError, match="container.xml"):
            extract_epub_chapters(buf.getvalue())

    def test_dangling_spine_ref_raises(self):
        blob = build_epub([["x"]])
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            parts = {n: zf.read(n) for n in zf.namelist()}
        parts["OEBPS/package.opf"] = parts["OEBPS/package.opf"].replace(
            b'idref="c0"', b'idref="ghost"'
        )
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            for n, b in parts.items():
                zf.writestr(n, b)
        with pytest.raises(ValueError, match="not in manifest"):
            extract_epub_chapters(buf.getvalue())

    def test_not_a_zip_raises(self):
        with pytest.raises(ValueError, match="not an EPUB"):
            extract_epub_chapters(b"<html>no</html>")


class TestSparkOperator:
    def test_epub_documents_explode(self, spark):
        from ccgp_data_wrangling_spark.sources.epub import epub_documents

        blobs = [
            (0, build_epub([["alpha"], [("h1", "B"), "beta"]])),
            (1, build_epub([[("li", ["x", "y"])]])),
        ]
        df = spark.createDataFrame(blobs, "doc_id long, payload binary")
        rows = {
            (r.doc_id, r.chapter, r.para): r.text
            for r in epub_documents(df).collect()
        }
        assert rows == {
            (0, 0, 0): "alpha",
            (0, 1, 0): "B",
            (0, 1, 1): "beta",
            (1, 0, 0): "x",
            (1, 0, 1): "y",
        }


def test_block_inside_inline_keeps_wrapper_text():
    # r11 ADVICE fix: an inline wrapper (<em>) that CONTAINS a nested
    # block used to be handed to walk(), dropping its leading text and
    # intermediate tails. All four runs must survive.
    from xml.etree import ElementTree as ET

    from ccgp_data_wrangling_spark.sources.epub import _paragraphs

    ns = "http://www.w3.org/1999/xhtml"
    doc = (
        f'<html xmlns="{ns}"><body><li>intro '
        "<em>lead <ul><li>nested</li></ul> tail-in-em</em>"
        " after</li></body></html>"
    )
    paras = _paragraphs(ET.fromstring(doc))
    assert paras == ["intro lead ", "nested", " tail-in-em after"]
