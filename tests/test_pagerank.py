"""PageRank operator: hand-computed fixtures, mass conservation,
dangling redistribution, numpy power-iteration parity.
"""

from __future__ import annotations

import numpy as np

from ccgp_data_wrangling_spark.operators.pagerank import pagerank


def _ranks(spark, edge_list, **kw):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    return {r.node: r.rank for r in pagerank(edges, **kw).collect()}


def test_two_node_cycle_is_uniform(spark):
    got = _ranks(spark, [(0, 1), (1, 0)], n_iter=5)
    assert got == {0: 0.5, 1: 0.5}


def test_matches_numpy_power_iteration(spark):
    rng = np.random.default_rng(5)
    n, m = 20, 80
    edge_list = [
        (int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(m)
    ]
    nodes = sorted({v for e in edge_list for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    N = len(nodes)
    A = np.zeros((N, N))
    for s, d in edge_list:
        A[idx[d], idx[s]] += 1.0
    deg = A.sum(axis=0)
    r = np.full(N, 1.0 / N)
    d_f = 0.85
    for _ in range(10):
        contrib = np.zeros(N)
        nonzero = deg > 0
        contrib = A[:, nonzero] @ (r[nonzero] / deg[nonzero])
        dangling = r[~nonzero].sum()
        r = (1 - d_f) / N + d_f * dangling / N + d_f * contrib
    expected = {v: round(float(r[idx[v]]), 4) for v in nodes}

    got = _ranks(spark, edge_list, n_iter=10)
    assert got == expected


def test_mass_conserved_with_dangling_nodes(spark):
    # node 2 has no out-edges: its mass must be redistributed, so the
    # ranks still sum to ~1
    got = _ranks(spark, [(0, 1), (1, 2), (0, 2)], n_iter=15)
    assert abs(sum(got.values()) - 1.0) < 5e-4
    # sink receives from both → highest rank
    assert got[2] == max(got.values())


def test_triangle_count_shapes(spark):
    from ccgp_data_wrangling_spark.operators.pagerank import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    star = [(100, i) for i in range(101, 110)]  # hub, no triangles
    df = spark.createDataFrame(k4 + star, "src long, dst long")
    assert triangle_count(df).collect()[0]["n_triangles"] == 4
    # duplicate/reversed edges don't inflate the count
    df2 = spark.createDataFrame(
        k4 + [(b, a) for a, b in k4], "src long, dst long"
    )
    assert triangle_count(df2).collect()[0]["n_triangles"] == 4
