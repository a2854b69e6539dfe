"""Compaction planner: binning arithmetic, skip-single, guards."""

from __future__ import annotations

import pytest

from ccgp_data_wrangling_spark.operators.compaction import (
    compaction_summary,
    plan_compaction,
)


def test_cumulative_quantile_binning(spark):
    files = spark.createDataFrame(
        [
            ("p1", "a", 400), ("p1", "b", 400), ("p1", "c", 400),
            ("p1", "d", 400), ("p1", "e", 400),
            ("p2", "a", 2000),           # lone big file
            ("p3", "a", 100), ("p3", "b", 100),
        ],
        "part string, path string, bytes long",
    )
    got = {
        (r.partition, r.path): r.group_id
        for r in plan_compaction(
            files, partition_col="part", target_bytes=1000,
            skip_single=False,
        ).collect()
    }
    # p1 exclusive cumsums: 0,400,800,1200,1600 → groups 0,0,0,1,1
    assert [got[("p1", p)] for p in "abcde"] == [0, 0, 0, 1, 1]
    assert got[("p2", "a")] == 0
    assert got[("p3", "a")] == got[("p3", "b")] == 0

    # skip_single drops the lone-file group (p2) but keeps the rest
    kept = plan_compaction(
        files, partition_col="part", target_bytes=1000
    ).collect()
    assert {r.partition for r in kept} == {"p1", "p3"}

    summ = {
        (r.partition, r.group_id): (r.n_files, r.group_bytes)
        for r in compaction_summary(
            plan_compaction(files, partition_col="part", target_bytes=1000)
        ).collect()
    }
    assert summ[("p1", 0)] == (3, 1200)
    assert summ[("p1", 1)] == (2, 800)
    assert summ[("p3", 0)] == (2, 200)


def test_target_bytes_guard(spark):
    files = spark.createDataFrame(
        [("p", "a", 1)], "part string, path string, bytes long"
    )
    with pytest.raises(ValueError, match="positive"):
        plan_compaction(files, partition_col="part", target_bytes=0)
