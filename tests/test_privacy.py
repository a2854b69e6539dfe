"""Privacy operator tests (operators/privacy.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.operators.privacy import (
    k_anonymity_audit,
    tokenize_columns,
)


def test_tokenize_preserves_joins_and_kills_values(spark):
    a = spark.createDataFrame(
        [(1, "alice"), (2, "bob")], "id int, name string"
    )
    b = spark.createDataFrame(
        [("alice", 10), ("carol", 20)], "name string, score int"
    )
    ta = tokenize_columns(a, ["name"], salt="s1")
    tb = tokenize_columns(b, ["name"], salt="s1")
    joined = ta.join(tb, "name").select("id", "score").collect()
    assert [(r["id"], r["score"]) for r in joined] == [(1, 10)]
    # raw values are gone; tokens are salted (differ across salts)
    vals = {r["name"] for r in ta.collect()}
    assert "alice" not in vals
    t2 = {r["name"] for r in tokenize_columns(a, ["name"], salt="s2").collect()}
    assert vals.isdisjoint(t2)


def test_tokenize_null_stays_null(spark):
    df = spark.createDataFrame([(1, None)], "id int, name string")
    out = tokenize_columns(df, ["name"], salt="s").collect()[0]
    assert out["name"] is None


def test_k_anonymity_flags_small_groups_incl_null(spark):
    rows = (
        [("US", "A")] * 5
        + [("US", "B")] * 2
        + [(None, "A")] * 1
    )
    df = spark.createDataFrame(rows, "country string, seg string")
    out = {
        (r["country"], r["seg"]): (r["group_size"], r["deficit"])
        for r in k_anonymity_audit(df, ["country", "seg"], k=3).collect()
    }
    assert out == {("US", "B"): (2, 1), (None, "A"): (1, 2)}
