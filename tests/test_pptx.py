"""PPTX (OOXML PresentationML) extraction: sldIdLst-driven slide
order, shape/table text bodies, field runs, notes exclusion, and the
Spark explode wrapper."""

from __future__ import annotations

import io
import zipfile

import pytest

from ccgp_data_wrangling_spark.sources.pptx import (
    build_pptx,
    extract_pptx_slides,
    pptx_documents,
)


def test_pptx_slide_paragraphs():
    blob = build_pptx(
        [
            ["title here", ["line one", ("br",), "line two"]],
            ["second slide", "tail & <escaped>"],
        ]
    )
    assert extract_pptx_slides(blob) == [
        ["title here", "line one\nline two"],
        ["second slide", "tail & <escaped>"],
    ]


def test_pptx_presentation_order_not_filename_order():
    # build_pptx names the FIRST presented slide with the HIGHEST
    # slide number — sorted-by-name extraction would reverse the deck
    blob = build_pptx([["first"], ["middle"], ["last"]])
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        assert "ppt/slides/slide3.xml" in zf.namelist()
        assert b"first" in zf.read("ppt/slides/slide3.xml")
    assert extract_pptx_slides(blob) == [["first"], ["middle"], ["last"]]


def test_pptx_multi_shape_document_order():
    blob = build_pptx(
        [{"shapes": [["shape A p0", "shape A p1"], ["shape B"]]}]
    )
    assert extract_pptx_slides(blob) == [
        ["shape A p0", "shape A p1", "shape B"]
    ]


def test_pptx_field_cached_literal():
    blob = build_pptx([[["page ", ("fld", "7")]]])
    assert extract_pptx_slides(blob) == [["page 7"]]


def test_pptx_notes_never_surface():
    blob = build_pptx([["deck text"]])
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        assert b"never text" in zf.read("ppt/notesSlides/notesSlide1.xml")
    for paras in extract_pptx_slides(blob):
        for p in paras:
            assert "never text" not in p


def test_pptx_empty_paragraph_and_unicode():
    blob = build_pptx([["", "naïve — ünïcode"]])
    assert extract_pptx_slides(blob) == [["", "naïve — ünïcode"]]


def test_pptx_error_paths():
    with pytest.raises(ValueError, match="not a PPTX"):
        extract_pptx_slides(b"PK\x03\x04 garbage")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
    with pytest.raises(ValueError, match="ppt/presentation.xml"):
        extract_pptx_slides(buf.getvalue())
    with pytest.raises(ValueError, match="run token"):
        build_pptx([[[("bold", "x")]]])
    # dangling sldId relationship
    blob = build_pptx([["x"]])
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        parts = {n: zf.read(n) for n in zf.namelist()}
    parts["ppt/_rels/presentation.xml.rels"] = parts[
        "ppt/_rels/presentation.xml.rels"
    ].replace(b'Id="rId2"', b'Id="rId77"')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for n, b in parts.items():
            zf.writestr(n, b)
    with pytest.raises(ValueError, match="unknown relationship"):
        extract_pptx_slides(buf.getvalue())


def test_pptx_documents_explode(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "payload": [
                build_pptx([["a"], [["b", ("br",), "c"]]]),
                build_pptx([{"shapes": [["s0"], ["s1"]]}]),
            ],
        }
    )
    out = pptx_documents(spark.createDataFrame(pdf)).collect()
    got = sorted(
        (r.doc_id, r.slide, r.para, r.text, r.n_chars) for r in out
    )
    assert got == [
        (1, 0, 0, "a", 1),
        (1, 1, 0, "b\nc", 3),
        (2, 0, 0, "s0", 2),
        (2, 0, 1, "s1", 2),
    ]
