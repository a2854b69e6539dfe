"""Property tests: asof_join and range_join vs brute-force oracles."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ccgp_data_wrangling_spark.operators.asof import asof_join
from ccgp_data_wrangling_spark.operators.rangejoin import range_join

_SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_keys = st.sampled_from(["k1", "k2", "k3"])
# integers keep the oracle exact (no float-compare issues)
_times = st.integers(min_value=0, max_value=1000)


@given(
    pts=st.lists(st.tuples(_keys, _times), min_size=0, max_size=25),
    ivs=st.lists(st.tuples(_keys, _times), min_size=0, max_size=25, unique=True),
)
@_SLOW
def test_asof_backward_matches_brute_force(spark, pts, ivs):
    """Backward as-of = argmax of right ts <= left ts within the key;
    right side deduped to one row per (key, ts) by construction."""
    left = spark.createDataFrame(
        [(k, float(t), i) for i, (k, t) in enumerate(pts)] or [("zz", 0.0, -1)],
        "k string, lt double, pid int",
    )
    right = spark.createDataFrame(
        [(k, float(t), t * 10 + hash(k) % 7) for (k, t) in ivs]
        or [("zz2", 0.0, 0)],
        "k string, rt double, payload long",
    )
    out = asof_join(left, right, on=["k"], left_ts="lt", right_ts="rt")
    got = {r.pid: r.rt for r in out.collect() if r.pid >= 0}
    for i, (k, t) in enumerate(pts):
        prior = [rt for (rk, rt) in ivs if rk == k and rt <= t]
        want = float(max(prior)) if prior else None
        assert got.get(i) == want, (i, k, t, got.get(i), want)


@given(
    pts=st.lists(st.integers(0, 500), min_size=0, max_size=30),
    ivs=st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 80)),
        min_size=0,
        max_size=20,
    ),
    width=st.sampled_from([7.0, 50.0, 300.0]),
)
@_SLOW
def test_range_join_matches_brute_force(spark, pts, ivs, width):
    points = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(pts)] or [(-1, -1e9)],
        "pid int, x double",
    )
    intervals = spark.createDataFrame(
        [(j, float(lo), float(lo + w)) for j, (lo, w) in enumerate(ivs)]
        or [(-1, -5.0, -4.0)],
        "iid int, lo double, hi double",
    )
    out = range_join(points, intervals, "x", "lo", "hi", bucket_width=width)
    got = sorted((r.pid, r.iid) for r in out.collect() if r.pid >= 0)
    want = sorted(
        (i, j)
        for i, x in enumerate(pts)
        for j, (lo, w) in enumerate(ivs)
        if lo <= x <= lo + w
    )
    assert got == want
