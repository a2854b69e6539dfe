"""Legacy .xls (BIFF8) ingestion — stdlib CFB + BIFF reader.

Fixtures are built by the module's own minimal BIFF8 writer, so the
test exercises the real container format (CFB header, FAT, directory,
Workbook stream, SST, LABELSST/NUMBER records) end to end with no
Excel library anywhere.

Reference semantics: utils/parse.py:167 reads submitted sheets with
``pd.read_excel(dtype=str)``, which accepts legacy .xls via xlrd; the
probe loop (utils/parse.py:223-236) is shared with the xlsx path.
"""

import pytest

from ccgp_data_wrangling_spark.sources.ingest import read_submitted_sheet
from ccgp_data_wrangling_spark.sources.xls import write_xls, xls_rows


def test_xls_roundtrip_strings_numbers_gaps(tmp_path):
    p = str(tmp_path / "t.xls")
    write_xls(
        p,
        {
            "Sheet1": [
                ["a", "b", "c"],
                ["x", None, 3],       # gap cell omitted from the stream
                [None, "y"],          # short row → padded
                [1.5, "x", 2000000],  # float repr + integral float
            ]
        },
    )
    assert xls_rows(p) == [
        ["a", "b", "c"],
        ["x", None, "3"],
        [None, "y", None],
        ["1.5", "x", "2000000"],
    ]


def test_xls_sheet_selection(tmp_path):
    p = str(tmp_path / "t.xls")
    write_xls(p, {"first": [["f"]], "second": [["s"]]})
    assert xls_rows(p)[0] == ["f"]
    assert xls_rows(p, sheet="second")[0] == ["s"]
    assert xls_rows(p, sheet=1)[0] == ["s"]
    with pytest.raises(ValueError, match="no sheet named"):
        xls_rows(p, sheet="missing")


def test_xls_shared_string_dedup(tmp_path):
    # repeated strings share one SST entry; distinct cells still read back
    p = str(tmp_path / "t.xls")
    write_xls(p, {"s": [["dup", "dup"], ["dup", "other"]]})
    assert xls_rows(p) == [["dup", "dup"], ["dup", "other"]]


def test_read_submitted_sheet_xls_probe(spark, tmp_path):
    """Junk preamble rows before the marker header — the same probe
    loop as the xlsx/TSV paths, over the BIFF container."""
    p = str(tmp_path / "submitted.xls")
    write_xls(
        p,
        {
            "Sheet1": [
                ["CCGP submission", None],
                [None, "instructions blah"],
                ["*sample_name", "lat", "lat"],  # dup col → pandas-style .1
                ["s1", "36.1", "x"],
                ["s2", None, "y"],
            ]
        },
    )
    df = read_submitted_sheet(spark, p)
    assert df.columns == ["*sample_name", "lat", "lat.1"]
    got = {r["*sample_name"]: (r["lat"], r["lat.1"]) for r in df.collect()}
    assert got == {"s1": ("36.1", "x"), "s2": (None, "y")}


def test_not_a_cfb_file_raises(tmp_path):
    p = tmp_path / "junk.xls"
    p.write_bytes(b"this is not an xls file at all, just bytes")
    with pytest.raises(ValueError, match="bad magic"):
        xls_rows(str(p))


# ---------------------------------------------------------------------------
# Property: write_xls → xls_rows round-trips arbitrary small sheets.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_cell = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",), exclude_characters="\x00"
        ),
        max_size=12,
    ),
    st.integers(min_value=-(10**9), max_value=10**9),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
)


def _expected(v):
    if v is None:
        return None
    if isinstance(v, str):
        return v
    f = float(v)
    return str(int(f)) if f == int(f) and abs(f) < 1e16 else repr(f)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(st.lists(_cell, min_size=1, max_size=6), min_size=1, max_size=8)
)
def test_xls_roundtrip_property(tmp_path, rows):
    p = str(tmp_path / "prop.xls")
    write_xls(p, {"s": rows})
    got = xls_rows(p)
    width = max(len(r) for r in rows)
    want = [
        [_expected(v) for v in r] + [None] * (width - len(r)) for r in rows
    ]
    # an all-None tail column has no serialized cells — trailing None
    # columns are trimmed to the widest OCCUPIED cell, as Excel does
    occupied = 0
    any_cell = False
    for r in want:
        for i, v in enumerate(r):
            if v is not None:
                occupied = max(occupied, i + 1)
                any_cell = True
    if not any_cell:
        assert got == []
        return
    want = [r[:occupied] for r in want]
    n_rows = max(i for i, r in enumerate(want) if any(v is not None for v in r)) + 1
    assert got == want[:n_rows]
