"""Standalone HTML extraction: decoy stripping order, block
segmentation, entity handling, and the Spark explode wrapper."""

from __future__ import annotations

from ccgp_data_wrangling_spark.sources.html import (
    build_html,
    extract_html,
    html_documents,
)


def test_html_basic_paragraphs():
    blob = build_html("Page One", ["first para", "second para"])
    assert extract_html(blob) == (
        "Page One",
        ["first para", "second para"],
    )


def test_html_decoys_never_leak():
    blob = build_html("t", ["real"])
    title, paras = extract_html(blob)
    joined = title + " ".join(paras)
    assert "never" not in joined
    assert paras == ["real"]


def test_html_commented_script_does_not_hide_markup():
    # comment removal runs BEFORE script removal: an unbalanced
    # <script> inside a comment must not swallow the body
    raw = (
        b"<html><head><!-- <script> --></head>"
        b"<body><p>alive</p></body></html>"
    )
    assert extract_html(raw) == ("", ["alive"])


def test_html_entities_unescape_after_strip():
    blob = build_html("a & b", ["x <p> y", "AT&T"])
    assert b"&lt;p&gt;" in blob
    title, paras = extract_html(blob)
    assert title == "a & b"
    assert paras == ["x <p> y", "AT&T"]


def test_html_block_boundaries_and_inline_tags():
    raw = (
        b"<body><h1>Head</h1><div>a <b>bold</b> run</div>"
        b"<ul><li>one</li><li>two</li></ul>line<br>break</body>"
    )
    assert extract_html(raw) == (
        "",
        ["Head", "a bold run", "one", "two", "line", "break"],
    )


def test_html_no_body_tag_falls_back_to_head_cut():
    raw = b"<html><head><title>T</title></head><p>content</p></html>"
    assert extract_html(raw) == ("T", ["content"])


def test_html_documents_explode(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "payload": [
                build_html("t1", ["a", "bb"]),
                build_html("t2", ["ccc"]),
            ],
        }
    )
    out = html_documents(spark.createDataFrame(pdf)).collect()
    got = sorted(
        (r.doc_id, r.para, r.title, r.text, r.n_chars) for r in out
    )
    assert got == [
        (1, 0, "t1", "a", 1),
        (1, 1, "t1", "bb", 2),
        (2, 0, "t2", "ccc", 3),
    ]
