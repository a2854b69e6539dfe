"""Content-defined chunking tests (operators/cdc.py)."""

from __future__ import annotations

from ccgp_data_wrangling_spark.operators.cdc import (
    cdc_chunk_dedup,
    cdc_segments,
)

_TEXT = (
    "the quick brown fox jumps over the lazy dog again and again "
    "while the cat watches from the warm windowsill nearby quietly"
)


def test_segments_cover_text_exactly(spark):
    df = spark.createDataFrame([(1, _TEXT)], "id long, text string")
    segs = sorted(
        (r["seg_idx"], r["start"], r["seg"])
        for r in cdc_segments(df, "id", "text", k=4, divisor=16).collect()
    )
    assert "".join(s for _, _, s in segs) == _TEXT
    # starts are consistent with concatenation order
    pos = 1
    for _, start, s in segs:
        assert start == pos
        pos += len(s)


def test_insertion_realigns(spark):
    """All but O(1) segments of a prefix-shifted copy dedup against
    the original — the CDC property."""
    df = spark.createDataFrame(
        [(1, _TEXT), (2, "INSERTED-PREFIX " + _TEXT)], "id long, text string"
    )
    n1 = len(cdc_segments(
        spark.createDataFrame([(1, _TEXT)], "id long, text string"),
        "id", "text", k=4, divisor=16).collect())
    shared = cdc_chunk_dedup(df, "id", "text", k=4, divisor=16).collect()
    cross = [r for r in shared if r["n_docs"] == 2]
    # every original segment except the first realigns
    assert len(cross) >= n1 - 1 >= 1


def test_short_text_single_segment(spark):
    df = spark.createDataFrame([(1, "ab")], "id long, text string")
    segs = cdc_segments(df, "id", "text", k=4, divisor=16).collect()
    assert len(segs) == 1 and segs[0]["seg"] == "ab"


def test_layout_independent(spark):
    rows = [(i, _TEXT + f" suffix{i % 5}") for i in range(100)]
    a = spark.createDataFrame(rows, "id long, text string").repartition(1)
    b = spark.createDataFrame(rows, "id long, text string").repartition(11)
    ra = sorted(map(tuple, cdc_chunk_dedup(a, "id", "text").collect()))
    rb = sorted(map(tuple, cdc_chunk_dedup(b, "id", "text").collect()))
    assert ra == rb
