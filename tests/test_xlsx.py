"""S4 xlsx ingestion — stdlib OOXML reader + header probe loop.

Fixtures are built by a minimal in-test xlsx writer (a ZIP of
SpreadsheetML XML parts), so the test exercises the real container
format end-to-end with no Excel library anywhere.

Reference semantics: utils/parse.py:223-236 (re-read with header=i
until the ``*sample_name`` marker column appears), :167 (dtype=str).
"""

import pytest

from ccgp_data_wrangling_spark.sources.ingest import read_submitted_sheet
from ccgp_data_wrangling_spark.sources.xlsx import write_xlsx, xlsx_rows

def test_xlsx_rows_types_and_gaps(tmp_path):
    p = str(tmp_path / "t.xlsx")
    write_xlsx(
        p,
        {
            "Sheet1": [
                ["a", "b", "c"],
                ["x", None, 3],  # gap cell omitted from the XML
                [None, "y"],  # short row → padded
            ]
        },
    )
    rows = xlsx_rows(p)
    assert rows == [
        ["a", "b", "c"],
        ["x", None, "3"],
        [None, "y", None],
    ]


def test_xlsx_rows_sheet_selection(tmp_path):
    p = str(tmp_path / "t.xlsx")
    write_xlsx(p, {"first": [["f"]], "second": [["s"]]})
    assert xlsx_rows(p)[0] == ["f"]
    assert xlsx_rows(p, sheet="second")[0] == ["s"]
    assert xlsx_rows(p, sheet=1)[0] == ["s"]
    with pytest.raises(ValueError, match="no sheet named"):
        xlsx_rows(p, sheet="missing")


def test_read_submitted_sheet_xlsx_probe(spark, tmp_path):
    """Junk preamble rows before the marker header, exactly the shape
    utils/parse.py:223-236 probes through."""
    p = str(tmp_path / "submitted.xlsx")
    write_xlsx(
        p,
        {
            "Sheet1": [
                ["CCGP metadata template", None],
                ["fill in below"],
                ["*sample_name", "lat", "lon"],
                ["s1", "36.1", "-121.9"],
                ["s2", None, "-120.0"],
            ]
        },
    )
    df = read_submitted_sheet(spark, p)
    assert df.columns == ["*sample_name", "lat", "lon"]
    got = {r["*sample_name"]: (r["lat"], r["lon"]) for r in df.collect()}
    assert got == {"s1": ("36.1", "-121.9"), "s2": (None, "-120.0")}


def test_read_submitted_sheet_xlsx_dedup_columns(spark, tmp_path):
    p = str(tmp_path / "dup.xlsx")
    write_xlsx(
        p, {"Sheet1": [["*sample_name", "x", "x", None], ["s1", "1", "2", "3"]]}
    )
    df = read_submitted_sheet(spark, p)
    assert df.columns == ["*sample_name", "x", "x.1", "col3"]


def test_read_submitted_sheet_xlsx_no_marker(spark, tmp_path):
    p = str(tmp_path / "bad.xlsx")
    write_xlsx(p, {"Sheet1": [["nope"]]})
    with pytest.raises(ValueError, match="could not find header"):
        read_submitted_sheet(spark, p)


def test_read_submitted_sheet_truncated_xls_raises(spark, tmp_path):
    # .xls is now served by the stdlib BIFF reader (tests/test_xls.py);
    # a truncated/garbage container still fails loudly
    p = tmp_path / "legacy.xls"
    p.write_bytes(b"\xd0\xcf\x11\xe0")
    with pytest.raises(ValueError, match="bad magic"):
        read_submitted_sheet(spark, str(p))
