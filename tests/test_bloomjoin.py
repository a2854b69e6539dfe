"""Bloom-filter sketch and join-reduction semantics.

Invariants: no false negatives ever; false-positive rate within a
small multiple of the theoretical bound; digests merge associatively
(merge == sketch-of-union); a Bloom-prefiltered join returns exactly
the plain join's rows; the prefilter actually prunes probe rows.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.operators.bloomjoin import (
    DEFAULT_NUM_BITS,
    DEFAULT_NUM_HASHES,
    bloom_contains,
    bloom_merge,
    bloom_prefilter_join,
    bloom_sketch,
    bloom_words,
)


def _keys(spark, lo, hi, name="key"):
    return spark.range(lo, hi).select(F.concat(F.lit("k"), F.col("id")).alias(name))


def test_no_false_negatives(spark):
    build = _keys(spark, 0, 500)
    words = bloom_words(bloom_sketch(build, "key"))
    passed = build.where(bloom_contains(F.col("key"), words)).count()
    assert passed == 500


def test_false_positive_rate_in_band(spark):
    n = 500
    build = _keys(spark, 0, n)
    words = bloom_words(bloom_sketch(build, "key"))
    non_members = _keys(spark, 1_000_000, 1_050_000)
    fp = non_members.where(bloom_contains(F.col("key"), words)).count()
    rate = fp / 50_000
    theoretical = (
        1 - math.exp(-DEFAULT_NUM_HASHES * n / DEFAULT_NUM_BITS)
    ) ** DEFAULT_NUM_HASHES
    # generous 5x band + absolute floor for tiny expected counts
    assert rate <= max(5 * theoretical, 1e-3), (rate, theoretical)


def test_merge_equals_sketch_of_union(spark):
    a = _keys(spark, 0, 300)
    b = _keys(spark, 200, 600)  # overlapping on purpose
    merged = bloom_words(bloom_merge([bloom_sketch(a, "key"), bloom_sketch(b, "key")]))
    union = bloom_words(bloom_sketch(a.unionByName(b), "key"))
    assert merged == union


def test_prefilter_join_equals_plain_join(spark):
    probe = spark.range(0, 4000).select(
        F.concat(F.lit("k"), (F.col("id") % 997)).alias("pk"),
        F.col("id").alias("payload"),
    )
    build = _keys(spark, 0, 40)
    got = (
        bloom_prefilter_join(probe, build, "pk", "key")
        .select("payload")
        .collect()
    )
    want = (
        probe.join(build, probe.pk == build.key)
        .select("payload")
        .collect()
    )
    assert sorted(r[0] for r in got) == sorted(r[0] for r in want)


def test_prefilter_actually_prunes(spark):
    """The predicate must cut non-matching probe rows before the join."""
    probe = spark.range(0, 20_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("pk")
    )
    build = _keys(spark, 0, 100)  # 0.5% selective
    words = bloom_words(bloom_sketch(build, "key"))
    surviving = probe.where(bloom_contains(F.col("pk"), words)).count()
    assert surviving < 1000, surviving  # ≥95% pruned


def test_sparse_sketch_bounded_size(spark):
    """Digest row count never exceeds the word budget."""
    big = _keys(spark, 0, 100_000)
    sk = bloom_sketch(big, "key")
    assert sk.count() <= DEFAULT_NUM_BITS // 64


def test_prefilter_join_rejects_outer_and_anti(spark):
    """left/full/anti joins would lose probe rows to the prefilter —
    the operator must refuse rather than return silently wrong rows."""
    import pytest

    from ccgp_data_wrangling_spark.operators.bloomjoin import (
        bloom_prefilter_join,
    )

    probe = spark.createDataFrame([(1,), (2,)], "k int")
    build = spark.createDataFrame([(1,)], "bk int")
    for how in ("left", "left_outer", "full", "left_anti", "anti", "right"):
        with pytest.raises(ValueError, match="inner/left_semi"):
            bloom_prefilter_join(probe, build, "k", "bk", how=how)
    # the accepted types still work
    assert bloom_prefilter_join(probe, build, "k", "bk", how="inner").count() == 1
    assert (
        bloom_prefilter_join(probe, build, "k", "bk", how="left_semi").count() == 1
    )
