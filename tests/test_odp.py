"""ODP slide-text extraction: frame scoping, notes exclusion."""

from __future__ import annotations

import pytest

from ccgp_data_wrangling_spark.sources.odp import (
    build_odp,
    extract_odp_slides,
)


class TestExtract:
    def test_slides_frames_paragraphs(self):
        slides = extract_odp_slides(
            build_odp([
                [["title one", ("br", "line a", "line b")]],
                [["bullet"], ["second frame"]],
            ])
        )
        assert slides == [
            [["title one", "line a\nline b"]],
            [["bullet"], ["second frame"]],
        ]

    def test_notes_never_surface(self):
        slides = extract_odp_slides(build_odp([[["visible"]]]))
        flat = "".join(p for s in slides for f in s for p in f)
        assert "DECOY" not in flat
        assert flat == "visible"

    def test_span_flattening_and_escapes(self):
        (slide,) = extract_odp_slides(
            build_odp([[["a & <b> c"]]])
        )
        assert slide == [["a & <b> c"]]

    def test_nested_list_bullets_surface(self):
        # Impress outline placeholders nest body text in text:list >
        # text:list-item > text:p — the recursive collect must see it
        (slide,) = extract_odp_slides(
            build_odp([[["title", ("li", "bullet one"),
                         ("li", "bullet two")]]])
        )
        assert slide == [["title", "bullet one", "bullet two"]]

    def test_bare_shape_text_surfaces(self):
        # text:p directly under draw:custom-shape, no draw:text-box
        # wrapper (ODF §10.4)
        (slide,) = extract_odp_slides(
            build_odp([[("shape", ["inside shape"]), ["boxed"]]])
        )
        assert slide == [["inside shape"], ["boxed"]]

    def test_not_an_odp(self):
        with pytest.raises(ValueError, match="not an ODP"):
            extract_odp_slides(b"junk")
        from ccgp_data_wrangling_spark.sources.ods import build_ods

        with pytest.raises(ValueError, match="presentation"):
            extract_odp_slides(build_ods([("S", [["x"]])]))


class TestSparkOperator:
    def test_odp_documents(self, spark):
        from ccgp_data_wrangling_spark.sources.odp import odp_documents

        blob = build_odp([[["hello world"]], [["a"], ["bb"]]])
        df = spark.createDataFrame(
            [(5, bytearray(blob))], "doc_id long, payload binary"
        )
        rows = sorted(
            (r["slide"], r["frame"], r["para"], r["text"], r["n_chars"])
            for r in odp_documents(df).collect()  # 3 rows, test-only
        )
        assert rows == [
            (0, 0, 0, "hello world", 11),
            (1, 0, 0, "a", 1),
            (1, 1, 0, "bb", 2),
        ]
