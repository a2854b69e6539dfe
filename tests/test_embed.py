"""Feature-hashing embedding tests (operators/embed.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.operators.embed import hashed_embedding


def test_fixed_dim_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "x")], "id long, text string"
    )
    out = {r["id"]: r["vec"] for r in hashed_embedding(df, "text", ["id"], dim=16).collect()}
    assert all(len(v) == 16 for v in out.values())
    assert sum(out[1]) == 4 and sum(out[2]) == 1  # token multiplicity kept


def test_layout_independent(spark):
    rows = [(i, f"tok{i % 13} tok{i % 7} shared") for i in range(300)]
    a = spark.createDataFrame(rows, "id long, text string").repartition(1)
    b = spark.createDataFrame(rows, "id long, text string").repartition(19)
    va = sorted((r["id"], tuple(r["vec"])) for r in hashed_embedding(a, "text", ["id"]).collect())
    vb = sorted((r["id"], tuple(r["vec"])) for r in hashed_embedding(b, "text", ["id"]).collect())
    assert va == vb


def test_shard_vectors_add(spark):
    """Embedding of a concatenated doc == sum of its halves' vectors
    (whitespace-tokenized): the mergeable-partial property."""
    half1, half2 = "alpha beta gamma", "beta delta"
    df = spark.createDataFrame(
        [(1, half1), (2, half2), (3, half1 + " " + half2)],
        "id long, text string",
    )
    out = {r["id"]: r["vec"] for r in hashed_embedding(df, "text", ["id"], dim=8).collect()}
    assert [x + y for x, y in zip(out[1], out[2])] == out[3]


def test_linear_score_layout_independent(spark):
    from ccgp_data_wrangling_spark.operators.embed import linear_text_score

    rows = [(i, f"alpha tok{i % 11} beta tok{i % 5}") for i in range(200)]
    a = spark.createDataFrame(rows, "id long, text string").repartition(1)
    b = spark.createDataFrame(rows, "id long, text string").repartition(13)
    ra = sorted(map(tuple, linear_text_score(a, "text", ["id"]).collect()))
    rb = sorted(map(tuple, linear_text_score(b, "text", ["id"]).collect()))
    assert ra == rb


def test_linear_score_bounds_and_threshold(spark):
    from ccgp_data_wrangling_spark.operators.embed import linear_text_score

    df = spark.createDataFrame(
        [(1, "hello world foo bar baz")], "id long, text string"
    )
    r = linear_text_score(df, "text", ["id"]).collect()[0]
    assert 0.0 < r["score"] < 1.0
    assert r["keep"] == (r["score"] >= 0.5)
