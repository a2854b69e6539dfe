"""ODT (ODF 1.2) text extraction — zip walk, mixed content, tables."""

from __future__ import annotations

import io
import zipfile

import pytest

from ccgp_data_wrangling_spark.sources.odt import (
    build_odt,
    extract_odt_paragraphs,
)


class TestExtract:
    def test_plain_and_heading(self):
        blob = build_odt([{"heading": "Title"}, "hello world"])
        assert extract_odt_paragraphs(blob) == ["Title", "hello world"]

    def test_mixed_content_spans_and_tails(self):
        blob = build_odt(
            [["pre ", ("span", "inner"), " mid ", ("span", "x"), " post"]]
        )
        assert extract_odt_paragraphs(blob) == ["pre inner mid x post"]

    def test_whitespace_elements(self):
        blob = build_odt(
            [["a", ("tab",), "b", ("br",), ("s", 3), "c", ("s", 1)]]
        )
        assert extract_odt_paragraphs(blob) == ["a\tb\n   c "]

    def test_default_s_count_is_one(self):
        content_mod = build_odt([["x", ("s", 1), "y"]])
        # strip the explicit text:c attribute → default 1 (§6.1.3)
        with zipfile.ZipFile(io.BytesIO(content_mod)) as zf:
            xml = zf.read("content.xml").decode()
        xml = xml.replace(' text:c="1"', "")
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("content.xml", xml)
        assert extract_odt_paragraphs(buf.getvalue()) == ["x y"]

    def test_table_cells_in_document_order(self):
        blob = build_odt(
            ["before", {"cells": ["c1", "c2"]}, "after"]
        )
        assert extract_odt_paragraphs(blob) == [
            "before", "c1", "c2", "after"
        ]

    def test_xml_entities_unescape(self):
        blob = build_odt(["tail & <3>"])
        assert extract_odt_paragraphs(blob) == ["tail & <3>"]

    def test_note_body_skipped_tail_kept(self):
        blob = build_odt(["anchor END"])
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            xml = zf.read("content.xml").decode()
        xml = xml.replace(
            "anchor END",
            'anchor<text:note text:note-class="footnote">'
            "<text:note-citation>1</text:note-citation>"
            "<text:note-body><text:p>note text</text:p></text:note-body>"
            "</text:note> END",
        )
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("content.xml", xml)
        assert extract_odt_paragraphs(buf.getvalue()) == ["anchor END"]

    def test_empty_paragraph(self):
        blob = build_odt(["a", [], "b"])
        assert extract_odt_paragraphs(blob) == ["a", "", "b"]

    def test_not_a_zip_raises(self):
        with pytest.raises(ValueError, match="not an ODT"):
            extract_odt_paragraphs(b"%PDF-1.4 nope")

    def test_missing_content_raises(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("mimetype", "application/zip")
        with pytest.raises(ValueError, match="content.xml"):
            extract_odt_paragraphs(buf.getvalue())

    def test_mimetype_stored_first(self):
        blob = build_odt(["x"])
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            infos = zf.infolist()
        assert infos[0].filename == "mimetype"
        assert infos[0].compress_type == zipfile.ZIP_STORED


class TestSparkOperator:
    def test_odt_documents_explode(self, spark):
        from ccgp_data_wrangling_spark.sources.odt import odt_documents

        blobs = [
            (0, build_odt(["alpha", ["b", ("tab",), "c"]])),
            (1, build_odt([{"cells": ["k1", "k2"]}])),
        ]
        df = spark.createDataFrame(blobs, "doc_id long, payload binary")
        rows = {
            (r.doc_id, r.para): (r.text, r.n_chars)
            for r in odt_documents(df).collect()
        }
        assert rows == {
            (0, 0): ("alpha", 5),
            (0, 1): ("b\tc", 3),
            (1, 0): ("k1", 2),
            (1, 1): ("k2", 2),
        }
