"""Tests for the banded fuzzy argmax join (operators/fuzzy.py)."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.operators.fuzzy import fuzzy_argmax_join


def _brute(spark, left, right):
    cross = left.crossJoin(right)
    tot = F.length("l") + F.length("r")
    ratio = F.when(tot == 0, F.lit(100.0)).otherwise(
        F.round(100.0 * (tot - F.levenshtein("l", "r")) / tot, 3)
    )
    scored = cross.select("l", "r", ratio.alias("ratio"))
    w = W.partitionBy("l").orderBy(F.desc("ratio"), F.asc("r"))
    return {
        (row.l): (row.r, row.ratio)
        for row in scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .collect()
    }


@pytest.mark.parametrize("band", [1, 4, 20])
def test_matches_brute_force_any_band(spark, band):
    """Exact for every band: tiny bands force the fallback path, large
    bands stay entirely in pass 1."""
    rng = random.Random(11)
    alphabet = "abcxyz_-019"

    def name(n):
        return "".join(rng.choice(alphabet) for _ in range(n))

    lvals = [name(rng.randint(3, 14)) for _ in range(40)]
    rvals = list({name(rng.randint(3, 14)) for _ in range(25)})
    # plant near-duplicates so some best matches are close
    rvals += [v[:-1] + "Q" for v in lvals[:10]]
    left = spark.createDataFrame([(v,) for v in lvals], "l string")
    right = spark.createDataFrame([(v,) for v in rvals], "r string")

    got = {
        row.l: (row.r, row.ratio)
        for row in fuzzy_argmax_join(left, right, "l", "r", band=band).collect()
    }
    assert got == _brute(spark, left, right)


@pytest.mark.parametrize("band,window", [(1, 1), (4, 2), (4, 30), (20, 0)])
def test_blocked_matches_brute_force(spark, band, window):
    """length_window blocking stays exact for any (band, window) combo:
    window 0 blocks everything but equal lengths (max fallback), 30
    blocks nothing, and mid values exercise the mixed path."""
    rng = random.Random(23)
    alphabet = "abcxyz_-019"

    def name(n):
        return "".join(rng.choice(alphabet) for _ in range(n))

    lvals = [name(rng.randint(3, 18)) for _ in range(40)]
    rvals = list({name(rng.randint(3, 18)) for _ in range(25)})
    rvals += [v[:-1] + "Q" for v in lvals[:10]]
    rvals += [v + "xy" for v in lvals[10:16]]  # best match at Δlen 2
    left = spark.createDataFrame([(v,) for v in lvals], "l string")
    right = spark.createDataFrame([(v,) for v in rvals], "r string")

    got = {
        row.l: (row.r, row.ratio)
        for row in fuzzy_argmax_join(
            left, right, "l", "r", band=band, length_window=window
        ).collect()
    }
    assert got == _brute(spark, left, right)


def test_duplicate_left_values_collapse(spark):
    left = spark.createDataFrame([("aa",), ("aa",), ("bb",)], "l string")
    right = spark.createDataFrame([("ab",), ("bb",)], "r string")
    out = fuzzy_argmax_join(left, right, "l", "r", band=3).collect()
    assert len(out) == 2
    got = {r.l: r.r for r in out}
    assert got == {"aa": "ab", "bb": "bb"}


def test_empty_right_raises(spark):
    left = spark.createDataFrame([("x",)], "l string")
    right = spark.createDataFrame([], "r string")
    with pytest.raises(ValueError, match="empty"):
        fuzzy_argmax_join(left, right, "l", "r")


def _physical_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_auto_keeps_banded_cross_on_fixed_width_corpora(spark):
    # both sides fixed-width: blocking can't prune a single pair, so
    # "auto" must keep the broadcast cross (no length-key equi-join)
    left = spark.createDataFrame([(f"id{i:05d}",) for i in range(30)], "l string")
    right = spark.createDataFrame([(f"id{i:05d}",) for i in range(0, 60, 2)], "r string")
    df = fuzzy_argmax_join(left, right, "l", "r", band=4, length_window="auto")
    plan = _physical_plan(df)
    assert "__blk" not in plan
    got = {row.l: (row.r, row.ratio) for row in df.collect()}
    assert got == _brute(spark, left, right)


def test_auto_selects_blocking_on_variable_corpora(spark):
    rng = random.Random(7)
    alphabet = "abcxyz_-019"

    def name(n):
        return "".join(rng.choice(alphabet) for _ in range(n))

    left = spark.createDataFrame(
        [(name(rng.randint(3, 20)),) for _ in range(40)], "l string"
    )
    right = spark.createDataFrame(
        [(name(rng.randint(3, 20)),) for _ in range(25)], "r string"
    )
    df = fuzzy_argmax_join(left, right, "l", "r", band=4, length_window="auto")
    got = {row.l: (row.r, row.ratio) for row in df.collect()}
    assert got == _brute(spark, left, right)


def test_resolve_length_window_decision_table():
    from ccgp_data_wrangling_spark.operators.fuzzy import resolve_length_window

    # fixed-width both sides → no gap can exceed the band → no blocking
    assert resolve_length_window(18, 18, 18, 18, band=6) is None
    # narrow joint spread (max gap 4 ≤ band) → still no blocking
    assert resolve_length_window(8, 10, 6, 10, band=6) is None
    # variable corpus: some gap exceeds the band → block with window=band
    assert resolve_length_window(3, 20, 3, 20, band=4) == 4
    # one-sided spread is enough (left fixed, right wide)
    assert resolve_length_window(10, 10, 3, 30, band=6) == 6
