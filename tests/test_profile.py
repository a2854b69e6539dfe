"""Tests for the one-pass column profiler (operators/profile.py)."""

from __future__ import annotations

from ccgp_data_wrangling_spark.operators.profile import profile_columns


def test_exact_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "a"), (5, None)],
        "id long, tag string",
    )
    rows = {r.column: r for r in profile_columns(df).collect()}
    assert rows["id"].n_rows == 5
    assert rows["id"].n_nulls == 0
    assert rows["id"].n_distinct == 5
    assert (rows["id"].min_value, rows["id"].max_value) == ("1", "5")
    assert rows["tag"].n_nulls == 2
    assert rows["tag"].n_distinct == 2  # COUNT(DISTINCT) ignores nulls
    assert (rows["tag"].min_value, rows["tag"].max_value) == ("a", "b")


def test_approx_profile_within_rsd(spark):
    """HLL++ distinct estimate lands within a loose 3*rsd band of exact
    — the scale path for wide-table profiling (no aggregate Expand)."""
    from ccgp_data_wrangling_spark.catalog import load_table

    orders = load_table(spark, "/root/testdata/sf0.01", "orders")
    exact = {
        r.column: r.n_distinct
        for r in profile_columns(orders, ["o_custkey", "o_orderpriority"]).collect()
    }
    approx = {
        r.column: r.n_distinct
        for r in profile_columns(
            orders, ["o_custkey", "o_orderpriority"], approx=True, rsd=0.05
        ).collect()
    }
    for c, ex in exact.items():
        assert abs(approx[c] - ex) <= max(1, 0.15 * ex), (c, ex, approx[c])
