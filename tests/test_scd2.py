"""Tests for SCD2 snapshot maintenance (operators/scd2.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.operators.scd2 import scd2_apply

T0 = datetime(2020, 1, 1)
T1 = datetime(2024, 6, 1)
T2 = datetime(2025, 1, 1)

SCHEMA = (
    "k long, seg string, nation int, "
    "valid_from timestamp, valid_to timestamp, is_current boolean"
)


def _snapshot(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_change_insert_noop_and_history_preserved(spark):
    current = _snapshot(
        spark,
        [
            (1, "AUTO", 7, T0, None, True),
            (2, "BIKE", 3, T0, None, True),
            (2, "OLD", 3, datetime(2018, 1, 1), T0, False),  # closed history
        ],
    )
    changes = spark.createDataFrame(
        [
            (1, "MOVED", 7, T1),   # tracked change → close + open
            (2, "BIKE", 3, T1),    # identical → no-op
            (9, "NEW", 0, T1),     # unseen key → insert
        ],
        "k long, seg string, nation int, ts timestamp",
    )
    out = scd2_apply(current, changes, "k", ["seg", "nation"], change_ts_col="ts")
    rows = sorted(
        (r.k, r.seg, r.valid_from, r.valid_to, r.is_current) for r in out.collect()
    )
    assert rows == [
        (1, "AUTO", T0, T1, False),        # closed at change ts
        (1, "MOVED", T1, None, True),      # new open version
        (2, "BIKE", T0, None, True),       # untouched (no-op change)
        (2, "OLD", datetime(2018, 1, 1), T0, False),  # history preserved
        (9, "NEW", T1, None, True),        # fresh insert
    ]


def test_null_safe_tracked_comparison(spark):
    current = _snapshot(spark, [(1, None, 7, T0, None, True)])
    same = spark.createDataFrame(
        [(1, None, 7, T1)], "k long, seg string, nation int, ts timestamp"
    )
    out = scd2_apply(current, same, "k", ["seg", "nation"], change_ts_col="ts")
    assert out.count() == 1  # null == null → no new version
    diff = spark.createDataFrame(
        [(1, "X", 7, T1)], "k long, seg string, nation int, ts timestamp"
    )
    out2 = scd2_apply(current, diff, "k", ["seg", "nation"], change_ts_col="ts")
    assert out2.count() == 2


def test_second_application_is_incremental(spark):
    """Applying a later batch to the produced snapshot chains versions."""
    current = _snapshot(spark, [(1, "A", 1, T0, None, True)])
    b1 = spark.createDataFrame(
        [(1, "B", 1, T1)], "k long, seg string, nation int, ts timestamp"
    )
    snap1 = scd2_apply(current, b1, "k", ["seg", "nation"], change_ts_col="ts")
    b2 = spark.createDataFrame(
        [(1, "C", 1, T2)], "k long, seg string, nation int, ts timestamp"
    )
    snap2 = scd2_apply(snap1, b2, "k", ["seg", "nation"], change_ts_col="ts")
    rows = sorted(
        (r.seg, r.valid_from, r.valid_to, r.is_current) for r in snap2.collect()
    )
    assert rows == [
        ("A", T0, T1, False),
        ("B", T1, T2, False),
        ("C", T2, None, True),
    ]
    # idempotency: re-applying b2 to snap2 changes nothing
    snap3 = scd2_apply(snap2, b2, "k", ["seg", "nation"], change_ts_col="ts")
    assert sorted(map(tuple, snap3.collect())) == sorted(map(tuple, snap2.collect()))
