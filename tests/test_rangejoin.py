"""Unit tests for the bucketed range join (operators/rangejoin.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.operators.rangejoin import range_join


@pytest.fixture()
def pts_ivs(spark):
    points = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 99.0), (4, 250.0)],
        "pid int, x double",
    )
    intervals = spark.createDataFrame(
        [
            ("a", 0.0, 10.0),     # catches 5.0 and 10.0 (inclusive ends)
            ("b", 9.0, 120.0),    # catches 10.0 and 99.0, spans buckets
            ("c", 300.0, 400.0),  # catches nothing
            ("d", 50.0, 40.0),    # inverted → dropped, not exploded
        ],
        "iid string, lo double, hi double",
    )
    return points, intervals


def test_matches_inclusive_bounds_exactly_once(spark, pts_ivs):
    points, intervals = pts_ivs
    out = range_join(points, intervals, "x", "lo", "hi", bucket_width=25.0)
    got = sorted((r.pid, r.iid) for r in out.collect())
    assert got == [(1, "a"), (2, "a"), (2, "b"), (3, "b")]


def test_matches_brute_force_on_random_data(spark):
    import random

    rng = random.Random(7)
    pts = [(i, rng.uniform(0, 1000)) for i in range(200)]
    ivs = []
    for i in range(60):
        lo = rng.uniform(0, 1000)
        ivs.append((i, lo, lo + rng.uniform(0, 80)))
    points = spark.createDataFrame(pts, "pid int, x double")
    intervals = spark.createDataFrame(ivs, "iid int, lo double, hi double")
    out = range_join(points, intervals, "x", "lo", "hi", bucket_width=50.0)
    got = sorted((r.pid, r.iid) for r in out.collect())
    want = sorted(
        (pid, iid) for pid, x in pts for iid, lo, hi in ivs if lo <= x <= hi
    )
    assert got == want


def test_keyed_range_join_restricts_to_key(spark):
    points = spark.createDataFrame(
        [("u1", 1, 5.0), ("u2", 2, 5.0)], "k string, pid int, x double"
    )
    intervals = spark.createDataFrame(
        [("u1", 10, 0.0, 10.0)], "k string, iid int, lo double, hi double"
    )
    out = range_join(
        points, intervals, "x", "lo", "hi", on=["k"], bucket_width=10.0
    )
    assert [(r.k, r.pid, r.iid) for r in out.collect()] == [("u1", 1, 10)]


def test_plan_has_no_nested_loop(spark, pts_ivs):
    import contextlib
    import io

    points, intervals = pts_ivs
    out = range_join(points, intervals, "x", "lo", "hi", bucket_width=25.0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bad_width_raises(spark, pts_ivs):
    points, intervals = pts_ivs
    with pytest.raises(ValueError, match="positive"):
        range_join(points, intervals, "x", "lo", "hi", bucket_width=0)


def test_partition_pruning_on_partitioned_write(spark, tmp_path):
    """write_partitioned layout turns an equality filter into partition
    pruning (PartitionFilters in the scan, not a post-scan Filter)."""
    import contextlib
    import io

    from ccgp_data_wrangling_spark.sources.sinks import write_partitioned

    df = spark.createDataFrame(
        [(i, ["red", "green", "blue"][i % 3]) for i in range(90)],
        "id long, color string",
    )
    path = str(tmp_path / "bycolor")
    write_partitioned(df, path, ["color"])
    back = spark.read.parquet(path).where(F.col("color") == "green")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain()
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "color" in plan.split("PartitionFilters", 1)[1][:200]
    assert back.count() == 30


# ---------------------------------------------------------------------------
# interval_coverage
# ---------------------------------------------------------------------------


def test_interval_coverage_merges_overlaps(spark):
    from ccgp_data_wrangling_spark.operators.rangejoin import (
        interval_coverage,
    )

    rows = [
        ("a", 0, 10), ("a", 5, 15), ("a", 15, 20),  # one island [0,20)
        ("a", 30, 35),                               # second island
        ("b", 0, 1), ("b", 2, 3),                    # two islands
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = {
        r["k"]: (r["n_merged"], r["covered"], r["n_intervals"])
        for r in interval_coverage(df, "k", "s", "e").collect()
    }
    assert out == {"a": (2, 25, 4), "b": (2, 2, 2)}


def test_interval_coverage_touching_merge_and_containment(spark):
    from ccgp_data_wrangling_spark.operators.rangejoin import (
        interval_coverage,
    )

    rows = [("k", 0, 100), ("k", 10, 20), ("k", 100, 101)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    r = interval_coverage(df, "k", "s", "e").collect()[0]
    # contained interval absorbed; touching [100,101) merges
    assert (r["n_merged"], r["covered"]) == (1, 101)


# ---------------------------------------------------------------------------
# interval_intersect_join (BED-intersect, emit-once grid join)
# ---------------------------------------------------------------------------


def test_interval_intersect_basic_and_halfopen(spark):
    from ccgp_data_wrangling_spark.operators.rangejoin import (
        interval_intersect_join,
    )

    left = spark.createDataFrame(
        [
            ("L1", 0, 10),    # overlaps R1, R2
            ("L2", 10, 10),   # empty → never matches
            ("L3", 20, 30),   # touches R2 at 20 → NOT a match (half-open)
            ("L4", 100, 300), # spans many cells, overlaps R3
        ],
        "lid string, ls long, le long",
    )
    right = spark.createDataFrame(
        [
            ("R1", 5, 7),
            ("R2", 9, 20),
            ("R3", 250, 260),
        ],
        "rid string, rs long, re long",
    )
    out = interval_intersect_join(
        left, right, "ls", "le", "rs", "re", bucket_width=8.0
    )
    got = sorted((r.lid, r.rid, r.overlap_len) for r in out.collect())
    assert got == [("L1", "R1", 2), ("L1", "R2", 1), ("L4", "R3", 10)]


def test_interval_intersect_emits_each_pair_once(spark):
    """A pair whose shared span crosses many grid cells must still
    appear exactly once (the emit-once rule replaces dedup)."""
    from ccgp_data_wrangling_spark.operators.rangejoin import (
        interval_intersect_join,
    )

    left = spark.createDataFrame([("L", 0, 1000)], "lid string, ls long, le long")
    right = spark.createDataFrame([("R", 1, 999)], "rid string, rs long, re long")
    out = interval_intersect_join(
        left, right, "ls", "le", "rs", "re", bucket_width=10.0
    ).collect()
    assert len(out) == 1 and out[0].overlap_len == 998


def test_interval_intersect_matches_brute_force_keyed(spark):
    import random

    from ccgp_data_wrangling_spark.operators.rangejoin import (
        interval_intersect_join,
    )

    rng = random.Random(11)
    lrows = [
        (i, rng.choice("ab"), (s := rng.randrange(0, 500)), s + rng.randrange(0, 40))
        for i in range(60)
    ]
    rrows = [
        (i, rng.choice("ab"), (s := rng.randrange(0, 500)), s + rng.randrange(0, 40))
        for i in range(60)
    ]
    left = spark.createDataFrame(lrows, "lid int, k string, ls long, le long")
    right = spark.createDataFrame(rrows, "rid int, k string, rs long, re long")
    out = interval_intersect_join(
        left, right, "ls", "le", "rs", "re", on=["k"], bucket_width=16.0
    )
    got = sorted((r.lid, r.rid) for r in out.collect())
    want = sorted(
        (l[0], r[0])
        for l in lrows
        for r in rrows
        if l[1] == r[1] and l[2] < r[3] and r[2] < l[3] and l[2] < l[3] and r[2] < r[3]
    )
    assert got == want


def test_interval_intersect_plan_is_equi_join(spark):
    """The physical plan must be a hash/sort-merge equi-join on the
    grid cell — no BroadcastNestedLoopJoin / CartesianProduct."""
    from ccgp_data_wrangling_spark.operators.rangejoin import (
        interval_intersect_join,
    )

    left = spark.createDataFrame([("L", 0, 10)], "lid string, ls long, le long")
    right = spark.createDataFrame([("R", 5, 7)], "rid string, rs long, re long")
    plan = interval_intersect_join(
        left, right, "ls", "le", "rs", "re", bucket_width=8.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_reserved_and_key_column_guards(spark, pts_ivs):
    """Inputs carrying the internal __bucket/__cell columns, or join
    keys that shadow the point/start/end columns, are rejected with an
    explicit ValueError instead of being silently overwritten."""
    from ccgp_data_wrangling_spark.operators.rangejoin import (
        interval_intersect_join,
    )

    points, intervals = pts_ivs
    with pytest.raises(ValueError, match="__bucket is reserved"):
        range_join(
            points.withColumn("__bucket", F.lit(0)),
            intervals, "x", "lo", "hi", bucket_width=10,
        )
    with pytest.raises(ValueError, match="cannot be join keys"):
        range_join(
            points.withColumn("lo", F.lit(0.0)),
            intervals.select("lo", "hi"),
            "x", "lo", "hi", on=["lo"], bucket_width=10,
        )

    left = spark.createDataFrame([(1, 0.0, 5.0)], "lid int, ls double, le double")
    right = spark.createDataFrame([(2, 1.0, 4.0)], "rid int, rs double, re double")
    with pytest.raises(ValueError, match="__cell is reserved"):
        interval_intersect_join(
            left.withColumn("__cell", F.lit(3)),
            right, "ls", "le", "rs", "re", bucket_width=10,
        )
    with pytest.raises(ValueError, match="cannot be join keys"):
        interval_intersect_join(
            left, right.withColumn("ls", F.lit(0.0)).select("ls", "rs", "re"),
            "ls", "le", "rs", "re", on=["ls"], bucket_width=10,
        )
