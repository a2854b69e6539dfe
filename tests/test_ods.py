"""ODS cell extraction: typed value model, repeats, multi-sheet."""

from __future__ import annotations

import pytest

from ccgp_data_wrangling_spark.sources.ods import (
    build_ods,
    extract_ods_cells,
)


def _grid(cells):
    return {
        (c["sheet"], c["row"], c["col"]): c for c in cells
    }


class TestExtract:
    def test_typed_values_and_display_text(self):
        blob = build_ods([
            ("S", [
                ["h1", 2, 2.5, True, ("num", 7.25, "seven-ish")],
            ]),
        ])
        g = _grid(extract_ods_cells(blob))
        assert g[(0, 0, 0)]["value_type"] == "string"
        assert g[(0, 0, 0)]["number"] is None
        assert g[(0, 0, 1)]["number"] == 2.0
        assert g[(0, 0, 2)]["number"] == 2.5
        assert g[(0, 0, 3)]["value_type"] == "boolean"
        assert g[(0, 0, 3)]["number"] == 1.0
        # display text is independent of the typed value
        assert g[(0, 0, 4)]["text"] == "seven-ish"
        assert g[(0, 0, 4)]["number"] == 7.25

    def test_repeats_and_empty_positioning(self):
        blob = build_ods([
            ("S", [
                [None, ("rep", 3, 5), "end"],
                ("rows", 2, ["dup"]),
            ]),
        ])
        cells = extract_ods_cells(blob)
        g = _grid(cells)
        # empty positioning cell never surfaces
        assert (0, 0, 0) not in g
        # 3 repeated populated cells at cols 1..3, then col 4
        assert [g[(0, 0, c)]["number"] for c in (1, 2, 3)] == [5.0] * 3
        assert g[(0, 0, 4)]["text"] == "end"
        # repeated ROW expands
        assert g[(0, 1, 0)]["text"] == "dup"
        assert g[(0, 2, 0)]["text"] == "dup"
        assert len(cells) == 6

    def test_formula_cached_value(self):
        blob = build_ods(
            [("S", [[("formula", "of:=A1+B1", 9.5)]])]
        )
        (c,) = extract_ods_cells(blob)
        assert c["formula"] == "of:=A1+B1"
        assert c["number"] == 9.5
        assert c["text"] == "9.5"

    def test_multi_sheet_order_and_names(self):
        blob = build_ods([
            ("alpha", [["a"]]),
            ("beta & co", [["b"]]),
        ])
        cells = extract_ods_cells(blob)
        assert [(c["sheet"], c["sheet_name"], c["text"]) for c in cells] == [
            (0, "alpha", "a"), (1, "beta & co", "b"),
        ]

    def test_populated_repeat_bomb_rejected(self):
        # a POPULATED cell with huge rows-repeated x columns-repeated
        # must raise before materializing, not exhaust memory
        blob = build_ods([
            ("S", [("rows", 2000, [("rep", 1000, 5)])]),
        ])
        with pytest.raises(ValueError, match="populated cells"):
            extract_ods_cells(blob)

    def test_not_an_ods(self):
        with pytest.raises(ValueError, match="not an ODS"):
            extract_ods_cells(b"nope")
        import io
        import zipfile

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("other.xml", "<x/>")
        with pytest.raises(ValueError, match="content.xml"):
            extract_ods_cells(buf.getvalue())


class TestSparkOperator:
    def test_ods_documents(self, spark):
        from ccgp_data_wrangling_spark.sources.ods import ods_documents

        blob = build_ods([("S", [["x", 4], ["y", 6.5]])])
        df = spark.createDataFrame(
            [(1, bytearray(blob))], "doc_id long, payload binary"
        )
        rows = {
            (r["row"], r["col"]): (r["text"], r["number"])
            for r in ods_documents(df).collect()  # 4 rows, test-only
        }
        assert rows[(0, 0)] == ("x", None)
        assert rows[(1, 1)] == ("6.5", 6.5)
