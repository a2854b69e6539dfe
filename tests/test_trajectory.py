"""Trajectory Hausdorff pairs: brute-force parity, candidate
completeness at threshold == cell_size, simplification bound, and the
hot-cell guard."""

from __future__ import annotations

import itertools
import random

import pytest

from ccgp_data_wrangling_spark.operators.trajectory import (
    trajectory_hausdorff_pairs,
)


def _brute(trajs, threshold, max_points=30):
    out = {}
    keys = sorted(trajs)
    for a, b in itertools.combinations(keys, 2):
        pa, pb = trajs[a][:max_points], trajs[b][:max_points]
        d2 = lambda p, q: (p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2
        h_ab = max(min(d2(p, q) for q in pb) for p in pa)
        h_ba = max(min(d2(p, q) for p in pa) for q in pb)
        h = max(h_ab, h_ba)
        if round(h, 4) <= round(threshold * threshold, 4):
            out[(a, b)] = round(h, 4)
    return out


def _df(spark, trajs):
    rows = [
        (k, float(x), float(y), i)
        for k, pts in trajs.items()
        for i, (x, y) in enumerate(pts)
    ]
    return spark.createDataFrame(rows, "uid long, x double, y double, seq int")


def test_matches_brute_force_random(spark):
    rng = random.Random(13)
    trajs = {
        k: [
            (rng.uniform(0, 20) + 15 * (k % 3), rng.uniform(0, 20))
            for _ in range(rng.randint(1, 12))
        ]
        for k in range(12)
    }
    got = {
        (r.key_a, r.key_b): r.hausdorff_sq
        for r in trajectory_hausdorff_pairs(
            _df(spark, trajs), "uid", "x", "y", "seq",
            cell_size=6.0, threshold=6.0,
        ).collect()
    }
    assert got == _brute(trajs, 6.0)


def test_simplification_keeps_first_max_points(spark):
    """Vertices past max_points are ignored — a far-away tail vertex
    beyond the cap cannot break a match."""
    trajs = {
        1: [(0.0, 0.0), (1.0, 0.0)],
        2: [(0.5, 0.0), (1.5, 0.0), (500.0, 500.0)],  # tail dropped
    }
    got = trajectory_hausdorff_pairs(
        _df(spark, trajs), "uid", "x", "y", "seq",
        cell_size=2.0, threshold=2.0, max_points=2,
    ).collect()
    assert len(got) == 1
    assert got[0].hausdorff_sq == 0.25
    # with the tail included, the pair fails the threshold
    assert (
        trajectory_hausdorff_pairs(
            _df(spark, trajs), "uid", "x", "y", "seq",
            cell_size=2.0, threshold=2.0, max_points=3,
        ).collect()
        == []
    )


def test_threshold_above_cell_size_rejected(spark):
    trajs = {1: [(0.0, 0.0)]}
    with pytest.raises(ValueError, match="threshold <= cell_size"):
        trajectory_hausdorff_pairs(
            _df(spark, trajs), "uid", "x", "y", "seq",
            cell_size=1.0, threshold=2.0,
        )


def test_max_cell_guard_drops_hub_cells(spark):
    """With max_cell=1 every shared cell is 'hot', so no candidates
    form — the guard degrades recall, never correctness."""
    trajs = {1: [(0.0, 0.0)], 2: [(0.1, 0.1)]}
    assert (
        trajectory_hausdorff_pairs(
            _df(spark, trajs), "uid", "x", "y", "seq",
            cell_size=1.0, threshold=1.0, max_cell=1,
        ).collect()
        == []
    )
    assert (
        len(
            trajectory_hausdorff_pairs(
                _df(spark, trajs), "uid", "x", "y", "seq",
                cell_size=1.0, threshold=1.0,
            ).collect()
        )
        == 1
    )
