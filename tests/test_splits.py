"""Leakage-safe splits (operators/splits.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ccgp_data_wrangling_spark.operators.splits import leakage_safe_splits


def _docs(spark, n=300):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


def test_neardups_never_straddle_splits(spark):
    docs = _docs(spark)
    # chains 0-1-2, 10-11, and a big star at 100
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)] + [(100, x) for x in range(101, 110)],
        "id_a long, id_b long",
    )
    out = leakage_safe_splits(docs, pairs)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 300
    # every clustered doc shares its cluster's split
    for cluster in ([0, 1, 2], [10, 11], list(range(100, 110))):
        splits = {rows[d]["split"] for d in cluster}
        clusters = {rows[d]["cluster_id"] for d in cluster}
        assert len(splits) == 1 and len(clusters) == 1, cluster


def test_split_fractions_and_determinism(spark):
    docs = _docs(spark, 2000)
    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    out1 = leakage_safe_splits(docs, empty_pairs)
    frac = {
        r["split"]: r["n"]
        for r in out1.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert 0.05 < frac["test"] / 2000 < 0.15
    assert 0.05 < frac["val"] / 2000 < 0.15
    assert frac["train"] / 2000 > 0.7
    # determinism across partitioning
    out2 = leakage_safe_splits(docs.repartition(17), empty_pairs)
    assert sorted(map(tuple, out1.collect())) == sorted(
        map(tuple, out2.collect())
    )


def test_corpus_growth_keeps_existing_singletons(spark):
    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    small = leakage_safe_splits(_docs(spark, 100), empty_pairs)
    grown = leakage_safe_splits(_docs(spark, 200), empty_pairs)
    small_map = {r["doc_id"]: r["split"] for r in small.collect()}
    grown_map = {r["doc_id"]: r["split"] for r in grown.collect()}
    assert all(grown_map[d] == s for d, s in small_map.items())


def test_salt_reshuffles(spark):
    docs = _docs(spark, 500)
    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    a = {r["doc_id"]: r["split"] for r in leakage_safe_splits(docs, empty_pairs, salt="v1").collect()}
    b = {r["doc_id"]: r["split"] for r in leakage_safe_splits(docs, empty_pairs, salt="v2").collect()}
    assert any(a[d] != b[d] for d in a)
