"""Containment-join tests (operators/containment.py)."""

from __future__ import annotations

from ccgp_data_wrangling_spark.operators.containment import containment_join


def _run(spark, queries, docs):
    q = spark.createDataFrame(queries, "query_id long, query string")
    d = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        (r["query_id"], r["doc_id"])
        for r in containment_join(q, d).collect()
    }


def test_exact_containment_semantics(spark):
    docs = [
        (1, "red fox runs fast"),
        (2, "red fox sleeps"),
        (3, "blue fox runs"),
    ]
    out = _run(spark, [(10, "red fox"), (11, "fox runs"), (12, "green fox")], docs)
    assert out == {(10, 1), (10, 2), (11, 1), (11, 3)}


def test_unmatchable_token_yields_empty(spark):
    out = _run(
        spark,
        [(1, "zzz_not_in_corpus")],
        [(1, "some words here")],
    )
    assert out == set()


def test_duplicate_tokens_in_query_collapse(spark):
    out = _run(spark, [(1, "fox fox fox")], [(1, "the fox"), (2, "no match")])
    assert out == {(1, 1)}


def test_layout_independent(spark):
    docs = [(i, f"tok{i % 7} tok{i % 3} shared") for i in range(200)]
    qs = [(1000 + j, f"tok{j} shared") for j in range(3)]
    import itertools

    a = _run(spark, qs, docs)
    q = spark.createDataFrame(qs, "query_id long, query string").repartition(7)
    d = spark.createDataFrame(docs, "doc_id long, text string").repartition(13)
    b = {
        (r["query_id"], r["doc_id"]) for r in containment_join(q, d).collect()
    }
    assert a == b and len(a) > 0
