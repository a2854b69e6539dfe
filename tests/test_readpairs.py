"""Legacy prefix-derivation pairing (operators/readpairs.py vs
create_sheets.py:22-64 semantics)."""

from __future__ import annotations

from ccgp_data_wrangling_spark.operators.readpairs import legacy_prefix_pairs


def _run(spark, rows):
    df = spark.createDataFrame(rows, "sample_id string, files array<string>")
    return {
        (r.sample_id, r.library_id): (r.filename, r.filename2)
        for r in legacy_prefix_pairs(df).collect()
    }


def test_two_file_branch(spark):
    got = _run(spark, [("s1", ["b_R2.fq.gz", "b_R1.fq.gz"])])
    assert got == {("s1", "b"): ("b_R1.fq.gz", "b_R2.fq.gz")}


def test_substring_prefix_case(spark):
    """The reference's motivating case (create_sheets.py:43-46): prefix
    samp_a1 is a substring of samp_a1_L001, so substring containment
    over-matches — fuzzy top-2 per prefix must keep the lanes apart."""
    files = [
        "samp_a1_R1.fq.gz",
        "samp_a1_R2.fq.gz",
        "samp_a1_L001_R1.fq.gz",
        "samp_a1_L001_R2.fq.gz",
    ]
    got = _run(spark, [("s1", files)])
    assert got == {
        ("s1", "samp_a1"): ("samp_a1_R1.fq.gz", "samp_a1_R2.fq.gz"),
        ("s1", "samp_a1_L001"): ("samp_a1_L001_R1.fq.gz", "samp_a1_L001_R2.fq.gz"),
    }


def test_odd_and_tiny_sets_dropped(spark):
    got = _run(
        spark,
        [
            ("s1", ["a_R1.fq.gz"]),
            ("s2", ["a_R1.fq.gz", "a_R2.fq.gz", "b_R1.fq.gz"]),
            ("s3", []),
        ],
    )
    assert got == {}


def test_duplicate_files_collapse(spark):
    got = _run(spark, [("s1", ["c_R1.fq.gz", "c_R2.fq.gz", "c_R1.fq.gz"])])
    assert got == {("s1", "c"): ("c_R1.fq.gz", "c_R2.fq.gz")}
