"""Unit tests for the as-of join operator (operators/asof.py)."""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.operators.asof import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture()
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:05"), 100.0),
            ("A", _ts("2024-01-01 10:00:10"), 101.0),
            ("B", _ts("2024-01-01 10:00:03"), 50.0),
            ("C", _ts("2024-01-01 10:00:01"), 7.0),  # no quotes at all
        ],
        "sym string, trade_ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:04"), 99.5),
            ("A", _ts("2024-01-01 10:00:10"), 100.5),  # equal-ts: inclusive
            ("B", _ts("2024-01-01 10:00:09"), 49.0),  # after B's trade
        ],
        "sym string, quote_ts timestamp, bid double",
    )
    return trades, quotes


def test_backward_matches_latest_at_or_before(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="trade_ts", right_ts="quote_ts"
    )
    got = {
        (r.sym, r.trade_ts.isoformat()): (r.quote_ts, r.bid)
        for r in out.collect()
    }
    assert got[("A", "2024-01-01T10:00:05")][1] == 99.5
    # equal timestamp is an inclusive match
    assert got[("A", "2024-01-01T10:00:10")][1] == 100.5
    # B's only quote is later; C has none → nulls, row kept
    assert got[("B", "2024-01-01T10:00:03")] == (None, None)
    assert got[("C", "2024-01-01T10:00:01")] == (None, None)
    assert out.count() == 4


def test_forward_matches_earliest_at_or_after(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades,
        quotes,
        on=["sym"],
        left_ts="trade_ts",
        right_ts="quote_ts",
        direction="forward",
    )
    got = {(r.sym, r.trade_ts.isoformat()): r.bid for r in out.collect()}
    assert got[("A", "2024-01-01T10:00:05")] == 100.5
    assert got[("A", "2024-01-01T10:00:10")] == 100.5  # inclusive
    assert got[("B", "2024-01-01T10:00:03")] == 49.0
    assert got[("C", "2024-01-01T10:00:01")] is None


def test_tolerance_nulls_stale_matches(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades,
        quotes,
        on=["sym"],
        left_ts="trade_ts",
        right_ts="quote_ts",
        tolerance_sec=1.0,
    )
    got = {(r.sym, r.trade_ts.isoformat()): r.bid for r in out.collect()}
    # 10:00:05 trade vs 10:00:04 quote: 1s gap → kept at tolerance 1
    assert got[("A", "2024-01-01T10:00:05")] == 99.5
    assert got[("A", "2024-01-01T10:00:10")] == 100.5  # 0s gap
    out2 = asof_join(
        trades,
        quotes,
        on=["sym"],
        left_ts="trade_ts",
        right_ts="quote_ts",
        tolerance_sec=0.5,
    )
    got2 = {(r.sym, r.trade_ts.isoformat()): r.bid for r in out2.collect()}
    assert got2[("A", "2024-01-01T10:00:05")] is None  # stale now


def test_column_clash_raises(spark, trades_quotes):
    trades, quotes = trades_quotes
    bad = quotes.withColumnRenamed("bid", "price")
    with pytest.raises(ValueError, match="clash"):
        asof_join(trades, bad, on=["sym"], left_ts="trade_ts", right_ts="quote_ts")


def test_plan_is_single_keyed_shuffle_no_range_join(spark, trades_quotes):
    """The scale contract: no cartesian/range product, one hash
    partitioning on the equi-key feeding a window."""
    import contextlib
    import io

    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="trade_ts", right_ts="quote_ts"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan
