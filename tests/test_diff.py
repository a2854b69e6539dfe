"""Snapshot-diff operator tests (operators/diff.py)."""

from __future__ import annotations

from ccgp_data_wrangling_spark.operators.diff import (
    snapshot_diff,
    snapshot_diff_summary,
)


def test_statuses_row_level(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "id int, payload string, score int",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "CHANGED", 30), (4, "d", 41), (5, "e", 50)],
        "id int, payload string, score int",
    )
    out = {
        r["id"]: r["status"]
        for r in snapshot_diff(old, new, ["id"]).collect()
    }
    assert out == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "changed",
        5: "added",
    }


def test_null_payload_not_misclassified(spark):
    """Rows with NULL payloads must diff by content, not be mistaken
    for absent rows; NULL vs 'null' string must differ."""
    old = spark.createDataFrame(
        [(1, None), (2, "null"), (3, None)], "id int, p string"
    )
    new = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "id int, p string"
    )
    out = {
        r["id"]: r["status"] for r in snapshot_diff(old, new, ["id"]).collect()
    }
    assert out == {1: "unchanged", 2: "changed", 3: "changed"}


def test_summary_counts(spark):
    old = spark.createDataFrame([(i, i * 2) for i in range(100)], "id int, v int")
    new = spark.createDataFrame(
        [(i, i * 2 if i % 10 else -1) for i in range(5, 105)], "id int, v int"
    )
    out = {
        r["status"]: r["n"]
        for r in snapshot_diff_summary(old, new, ["id"]).collect()
    }
    # ids 0-4 removed, 100-104 added; of shared 5..99, multiples of 10
    # (10..90 → 9 ids) changed to -1
    assert out == {"removed": 5, "added": 5, "changed": 9, "unchanged": 86}


def test_compare_cols_subset(spark):
    """Restricting compare_cols ignores drift in excluded columns."""
    old = spark.createDataFrame([(1, "a", "meta1")], "id int, p string, m string")
    new = spark.createDataFrame([(1, "a", "meta2")], "id int, p string, m string")
    full = snapshot_diff(old, new, ["id"]).collect()[0]["status"]
    scoped = snapshot_diff(old, new, ["id"], compare_cols=["p"]).collect()[0][
        "status"
    ]
    assert full == "changed" and scoped == "unchanged"
