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


# ---------------------------------------------------------------------------
# check_expectations
# ---------------------------------------------------------------------------


def test_expectations_null_counts_as_violation(spark):
    from pyspark.sql import functions as F

    from ccgp_data_wrangling_spark.operators.profile import (
        check_expectations,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], "id int, v double"
    )
    out = {
        r["rule"]: (r["n_violations"], r["passed"])
        for r in check_expectations(
            df, [("v_positive", F.col("v") > 0), ("id_present", F.col("id").isNotNull())]
        ).collect()
    }
    # NULL v fails v_positive (3-valued logic coalesced to violation)
    assert out == {"v_positive": (2, False), "id_present": (0, True)}


def test_expectations_single_pass_plan(spark):
    """All rules fold into one aggregate — no per-rule scan."""
    from pyspark.sql import functions as F

    from ccgp_data_wrangling_spark.operators.profile import (
        check_expectations,
    )

    df = spark.range(100).withColumn("v", F.col("id") * 2)
    plan = check_expectations(
        df,
        [(f"r{i}", F.col("v") > i) for i in range(10)],
    )._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("range") == 1
