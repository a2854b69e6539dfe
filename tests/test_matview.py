"""Incremental rollup maintenance tests (operators/matview.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.operators.matview import (
    rollup_fold,
    rollup_state,
)


def test_fold_equals_full_recompute_inserts_only(spark):
    full = spark.createDataFrame(
        [("a", float(i)) for i in range(10)] + [("b", 5.0), ("b", 7.0)],
        "g string, v double",
    )
    base = full.where(F.col("v") < 6)
    delta = full.where(F.col("v") >= 6).withColumn("w", F.lit(1))
    folded = {
        r["g"]: (r["n"], r["total"], r["vmin"], r["vmax"], r["avg"], r["needs_rescan"])
        for r in rollup_fold(
            rollup_state(base, "g", "v").drop("has_retract"),
            rollup_state(delta, "g", "v", weight_col="w"),
        ).collect()
    }
    direct = {
        r["g"]: (r["n"], round(r["total"], 4), r["vmin"], r["vmax"])
        for r in full.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
        )
        .collect()
    }
    for g, (n, total, vmin, vmax, avg, rescan) in folded.items():
        assert (n, total, vmin, vmax) == direct[g]
        assert not rescan


def test_retraction_exact_for_additive_flagged_for_minmax(spark):
    base = spark.createDataFrame(
        [("a", 1.0), ("a", 100.0), ("a", 2.0)], "g string, v double"
    )
    delta = spark.createDataFrame(
        [("a", 100.0, -1), ("a", 3.0, 1)], "g string, v double, w int"
    )
    out = rollup_fold(
        rollup_state(base, "g", "v").drop("has_retract"),
        rollup_state(delta, "g", "v", weight_col="w"),
    ).collect()[0]
    # additive parts exact: rows {1, 2, 3}
    assert out["n"] == 3 and out["total"] == 6.0 and out["avg"] == 2.0
    # max is a stale BOUND (100 retracted) — flagged for rescan
    assert out["vmax"] == 100.0 and out["needs_rescan"]


def test_group_emptied_by_retractions_disappears(spark):
    base = spark.createDataFrame([("a", 1.0)], "g string, v double")
    delta = spark.createDataFrame([("a", 1.0, -1)], "g string, v double, w int")
    out = rollup_fold(
        rollup_state(base, "g", "v").drop("has_retract"),
        rollup_state(delta, "g", "v", weight_col="w"),
    ).collect()
    assert out == []
