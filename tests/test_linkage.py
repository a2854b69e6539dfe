"""Linkage join tests (J1/J2) on FIXTURES.md-shaped data, covering the
variant cascade, comma multi-ids, the .gz-after-tier rule, mid-name
matches, conflict resolution, and the sequenced gate.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.operators.linkage import (
    candidate_spans,
    link_reads_to_samples,
    linkage_pairs,
    resolve_conflicts,
)

TS = datetime(2024, 1, 5, 12, 0, 0)
TS2 = datetime(2024, 2, 5, 12, 0, 0)


def _samples(spark, rows):
    return spark.createDataFrame(
        rows, "sample_name string, minicore_seq_id string, minicore_sequenced string"
    )


def _reads(spark, names):
    return spark.createDataFrame(
        [(n, 100, TS if i % 2 == 0 else TS2) for i, n in enumerate(names)],
        "file_name string, filesize long, mdate timestamp",
    )


def test_candidate_spans_basic(spark):
    df = spark.createDataFrame([("AB_C-1.fq.gz",), ("nosep",)], "f string")
    got = df.select(candidate_spans(F.col("f")).alias("s")).collect()
    spans = set(got[0][0])
    # tokens: AB C 1 fq gz → spans end before a separator; gz excluded
    assert {"AB", "AB_C", "AB_C-1", "AB_C-1.fq", "C", "C-1", "C-1.fq", "1", "1.fq", "fq"} == spans
    assert got[1][0] == []


def test_exact_tier_match(spark):
    s = _samples(spark, [("S1", "CC131", "YES")])
    r = _reads(
        spark,
        ["CC131_L001_R1_001.fastq.gz", "CC131_L001_R2_001.fastq.gz", "OTHER_R1.fastq.gz"],
    )
    out = link_reads_to_samples(s, r).collect()
    assert len(out) == 1
    assert out[0]["files_found"] == [
        "CC131_L001_R1_001.fastq.gz",
        "CC131_L001_R2_001.fastq.gz",
    ]
    assert out[0]["filesize_sum"] == 200
    assert out[0]["received"] == TS


def test_underscore_to_dash_variant(spark):
    # id AB_1 has no exact match; AB-1 (tier 1) does
    s = _samples(spark, [("S1", "AB_1", "YES")])
    r = _reads(spark, ["AB-1_L001_R1.fastq.gz"])
    pairs = linkage_pairs(s, r).collect()
    assert len(pairs) == 1
    assert pairs[0]["tier"] == 1


def test_stripped_variant(spark):
    # id AB_1 matches only with all separators stripped (AB1, tier 2)
    s = _samples(spark, [("S1", "AB_1", "YES")])
    r = _reads(spark, ["AB1_L001_R1.fastq.gz"])
    pairs = linkage_pairs(s, r).collect()
    assert len(pairs) == 1
    assert pairs[0]["tier"] == 2


def test_dash_to_underscore_variant(spark):
    s = _samples(spark, [("S1", "AB-1", "YES")])
    r = _reads(spark, ["AB_1_L001_R1.fastq.gz"])
    pairs = linkage_pairs(s, r).collect()
    assert len(pairs) == 1
    assert pairs[0]["tier"] == 1


def test_tier_precedence_exact_wins(spark):
    # both exact and dash-variant files exist → only exact-tier files kept
    s = _samples(spark, [("S1", "AB_1", "YES")])
    r = _reads(spark, ["AB_1_R1.fastq.gz", "AB-1_R1.fastq.gz"])
    pairs = linkage_pairs(s, r).collect()
    assert [p["file_name"] for p in pairs] == ["AB_1_R1.fastq.gz"]
    assert pairs[0]["tier"] == 0


def test_comma_multi_id_first_match_wins(spark):
    # first id matches nothing; second id matches
    s = _samples(spark, [("S1", "ZZZ9,CC131", "YES")])
    r = _reads(spark, ["CC131_R1.fastq.gz"])
    pairs = linkage_pairs(s, r).collect()
    assert len(pairs) == 1
    assert pairs[0]["id_idx"] == 1


def test_gz_filter_after_tier(spark):
    # exact tier matches only a non-gz file; cascade must NOT fall
    # through to the dash variant (which has a .gz file)
    s = _samples(spark, [("S1", "AB_1", "YES")])
    r = _reads(spark, ["AB_1_R1.fastq", "AB-1_R1.fastq.gz"])
    pairs = linkage_pairs(s, r).collect()
    assert pairs == []


def test_mid_name_match(spark):
    # id occurs mid-filename (prefix-only candidate generation would miss)
    s = _samples(spark, [("S1", "S42", "YES")])
    r = _reads(spark, ["PROJ_S42_L001_R1.fastq.gz"])
    pairs = linkage_pairs(s, r).collect()
    assert len(pairs) == 1


def test_sequenced_gate(spark):
    s = _samples(spark, [("S1", "CC131", "NO"), ("S2", "CC131", None)])
    r = _reads(spark, ["CC131_R1.fastq.gz"])
    assert linkage_pairs(s, r).collect() == []


def test_conflict_resolution(spark):
    # file name contains both ids; closer sample name wins the file
    s = _samples(
        spark, [("CC131_XA", "CC131", "YES"), ("CC131_XA_extra_long", "CC131_XA", "YES")]
    )
    r = _reads(spark, ["CC131_XA_R1.fastq.gz"])
    pairs = linkage_pairs(s, r)
    assert pairs.count() == 2  # both match pre-conflict
    won = resolve_conflicts(pairs).collect()
    assert len(won) == 1
    # levenshtein ratio: "CC131_XA" vs file is closer than the long name
    assert won[0]["sample_name"] == "CC131_XA"


def test_no_nan_ids(spark):
    s = _samples(spark, [("S1", "nan", "YES"), ("S2", None, "YES")])
    r = _reads(spark, ["nan_R1.fastq.gz"])
    assert linkage_pairs(s, r).collect() == []


def test_salted_fallback_matches_broadcast_on_hot_span_corpus(spark):
    """A planted hot span (one shared prefix across the whole file
    listing) must not change results under the salted non-broadcast
    fallback, and the salt must actually spread the hot key: max rows
    per (variant, salt) shuffle key is ~1/salt_buckets of the hot
    span's unsalted key size."""
    n_files = 2000
    # every file shares the 'HOTPREFIX' leading token → the span
    # 'HOTPREFIX' (and several composites) appear in all 2000 names
    names = [f"HOTPREFIX_S{i % 40}_L{i}_R1.fq.gz" for i in range(n_files)]
    reads = _reads(spark, names)
    samples = _samples(
        spark, [(f"samp{j}", f"S{j}", "YES") for j in range(40)]
    )

    bcast = {
        (r.sample_name, r.file_name)
        for r in linkage_pairs(samples, reads).collect()
    }
    salted = {
        (r.sample_name, r.file_name)
        for r in linkage_pairs(
            samples, reads, broadcast_variants=False, salt_buckets=16
        ).collect()
    }
    assert salted == bcast
    assert len(salted) == n_files  # every file links to its S-token sample

    # skew bound: replay the span+salt generation and measure key widths
    from ccgp_data_wrangling_spark.operators.linkage import candidate_spans

    spans = reads.select(
        "file_name",
        F.explode(candidate_spans(F.col("file_name"))).alias("variant"),
    ).withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("file_name")), F.lit(16)).cast("int")
    )
    unsalted_max = (
        spans.groupBy("variant").count().agg(F.max("count")).collect()[0][0]
    )
    salted_max = (
        spans.groupBy("variant", "__salt")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert unsalted_max == n_files  # the planted hot key is real
    # xxhash64 spreads uniformly; allow 2x headroom over the ideal n/16
    assert salted_max <= 2 * n_files / 16
