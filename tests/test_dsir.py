"""DSIR importance-resampling semantics on planted corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.operators.dsir import (
    dsir_log_ratio_dim,
    dsir_select,
    hashed_gram_buckets,
)


def _corpus(spark):
    """40 'alpha' docs, 40 'beta' docs with disjoint vocabularies."""
    rows = []
    for i in range(40):
        rows.append((i, f"alpha lexicon tokens alpha shared corpus {i % 5}", "A"))
    for i in range(40, 80):
        rows.append((i, f"beta argot words beta shared corpus {i % 5}", "B"))
    return spark.createDataFrame(rows, "doc_id long, text string, family string")


def test_target_like_docs_score_higher(spark):
    docs = _corpus(spark)
    target = docs.where(F.col("family") == "A")
    sel = dsir_select(docs, target, k=80).collect()
    by_id = {r.doc_id: r.llr for r in sel}
    alpha_llr = [by_id[i] for i in range(40)]
    beta_llr = [by_id[i] for i in range(40, 80)]
    assert min(alpha_llr) > max(beta_llr)


def test_selection_prefers_target_family(spark):
    docs = _corpus(spark)
    target = docs.where(F.col("family") == "A")
    top = dsir_select(docs, target, k=30).collect()
    n_alpha = sum(1 for r in top if r.doc_id < 40)
    assert len(top) == 30
    assert n_alpha >= 28  # gumbel noise may admit a stray beta doc


def test_deterministic_across_runs(spark):
    docs = _corpus(spark)
    target = docs.where(F.col("family") == "A")
    a = [tuple(r) for r in dsir_select(docs, target, k=20).collect()]
    b = [tuple(r) for r in dsir_select(docs, target, k=20).collect()]
    assert a == b


def test_salt_reshuffles_only_noise(spark):
    docs = _corpus(spark)
    target = docs.where(F.col("family") == "A")
    a = dsir_select(docs, target, k=80, salt="s1").collect()
    b = dsir_select(docs, target, k=80, salt="s2").collect()
    # llr is salt-independent; score (noise) differs
    assert {(r.doc_id, r.llr) for r in a} == {(r.doc_id, r.llr) for r in b}
    assert {(r.doc_id, r.score) for r in a} != {(r.doc_id, r.score) for r in b}


def test_dim_bounded_by_bucket_count(spark):
    docs = _corpus(spark)
    raw_b = hashed_gram_buckets(docs, num_buckets=64)
    tgt_b = hashed_gram_buckets(docs.where(F.col("family") == "A"), num_buckets=64)
    dim = dsir_log_ratio_dim(raw_b, tgt_b, num_buckets=64)
    assert dim.count() <= 64
