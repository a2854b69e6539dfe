"""Hashed linear quality model: exact pooling, broadcast plan,
threshold semantics."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.operators.quality_model import (
    hashed_weights_fixture,
    score_documents,
)


def _bucket(tok: str, n=4096) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % n


def _w(b: int) -> int:
    return (b * 2654435761) % 2001 - 1000


def test_scores_match_reference_arithmetic(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha  alpha\talpha"),  # messy whitespace, repeated tok
            (3, "solo"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.id: r
        for r in score_documents(
            df, "doc_id", "text", hashed_weights_fixture(spark)
        ).collect()
    }
    for did, toks in [
        (1, ["alpha", "beta", "gamma"]),
        (2, ["alpha"] * 3),
        (3, ["solo"]),
    ]:
        sm = sum(_w(_bucket(t)) for t in toks)
        assert got[did].n_tokens == len(toks)
        assert got[did].score_milli == sm
        assert got[did].keep == (sm >= 0)
        assert 0.0 <= got[did].prob <= 1.0


def test_weights_join_is_broadcast(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = score_documents(
        df, "doc_id", "text", hashed_weights_fixture(spark)
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_keep_threshold_is_exact_integer_comparison(spark):
    df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    w = spark.createDataFrame(
        [(b, 7) for b in range(4096)], "bucket long, w_milli long"
    )  # every token weighs +0.007 → mean exactly 7 milli
    r = score_documents(
        df, "doc_id", "text", w, keep_threshold_milli=7
    ).collect()[0]
    assert r.score_milli == 14 and r.keep is True
    r = score_documents(
        df, "doc_id", "text", w, keep_threshold_milli=8
    ).collect()[0]
    assert r.keep is False
