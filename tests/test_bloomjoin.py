"""Bloom pre-join pruning: no false negatives ever, measurable
pruning, result identity with the plain join."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.operators.bloomjoin import (
    bloom_contains,
    bloom_semi_join,
    build_bloom_words,
)


def test_no_false_negatives_and_real_pruning(spark):
    keys = spark.range(100).select((F.col("id") * 7 + 3).alias("k"))
    words = build_bloom_words(keys, "k", m_bits=8192, k=4)
    assert len(words) == 128
    probe = spark.range(5000).select(F.col("id").alias("k"))
    hits = set(
        r.k
        for r in probe.where(
            bloom_contains(F.col("k"), words, m_bits=8192, k=4)
        ).collect()
    )
    truth = {i * 7 + 3 for i in range(100)}
    assert truth <= hits  # Bloom property: zero false negatives
    # 4 hashes over 8192 bits for 100 keys → fp rate ≈ (400/8192)^4
    fp = len(hits - truth)
    assert fp < 50, fp  # generous: expected ≪ 1


def test_bloom_join_equals_plain_join(spark):
    big = spark.range(2000).select(
        F.col("id").alias("fk"), (F.col("id") % 97).alias("payload")
    )
    small = spark.range(30).select(
        (F.col("id") * 61).alias("pk"), F.lit("dim").alias("d")
    )
    got = sorted(
        (r.fk, r.payload, r.pk)
        for r in bloom_semi_join(big, small, "fk", "pk").collect()
    )
    want = sorted(
        (r.fk, r.payload, r.pk)
        for r in big.join(small, big.fk == small.pk).collect()
    )
    assert got == want and len(got) > 0


def test_m_bits_guard():
    with pytest.raises(ValueError, match="multiple of 64"):
        build_bloom_words(None, "k", m_bits=100)
