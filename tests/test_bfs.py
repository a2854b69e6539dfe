"""Multi-source BFS: known distances, directedness, early stop,
max_iter horizon."""

from __future__ import annotations

from ccgp_data_wrangling_spark.operators.bfs import bfs_distances


def _dists(spark, edges, seeds, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    return {
        r.node: r.dist for r in bfs_distances(e, s, **kw).collect()
    }


def test_path_graph_distances(spark):
    edges = [(i, i + 1) for i in range(6)]  # 0-1-2-3-4-5-6
    assert _dists(spark, edges, [0]) == {
        0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6,
    }
    # multi-source takes the nearest seed
    assert _dists(spark, edges, [0, 6]) == {
        0: 0, 1: 1, 2: 2, 3: 3, 4: 2, 5: 1, 6: 0,
    }
    # horizon cuts the tail
    assert _dists(spark, edges, [0], max_iter=2) == {0: 0, 1: 1, 2: 2}


def test_directed_vs_undirected(spark):
    edges = [(1, 0), (1, 2)]
    assert _dists(spark, edges, [0], directed=True) == {0: 0}
    assert _dists(spark, edges, [0], directed=False) == {0: 0, 1: 1, 2: 2}


def test_disconnected_and_cycle(spark):
    edges = [(0, 1), (1, 2), (2, 0), (7, 8)]
    got = _dists(spark, edges, [0])
    assert got == {0: 0, 1: 1, 2: 1}  # cycle closes at 1, island absent
