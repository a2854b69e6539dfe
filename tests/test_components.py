"""Connected components (large-star/small-star) vs a union-find oracle."""

import random

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.operators.components import (
    connected_components,
    neardup_clusters,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min node per component
    comp = {}
    for n in list(parent):
        comp[n] = find(n)
    return comp


def _check(spark, edges):
    df = spark.createDataFrame(edges or [(0, 0)], ["a", "b"])
    if not edges:
        df = df.limit(0)
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    expect = _union_find(edges)
    # union-find keeps self-rooted singletons only for nodes seen in
    # edges; self-loops (a,a) are dropped by the operator unless the
    # node also has a real edge
    expect = {
        n: c
        for n, c in expect.items()
        if any(a != b and n in (a, b) for a, b in edges)
    }
    assert got == expect


def test_two_triangles_and_bridge(spark):
    _check(spark, [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (3, 10)])


def test_disjoint_components(spark):
    _check(spark, [(5, 9), (2, 7), (100, 42)])


def test_long_chain_converges_fast(spark):
    """A 300-node path: label propagation would need ~300 rounds;
    star contraction must finish well inside max_iter=25."""
    edges = [(i, i + 1) for i in range(300)]
    _check(spark, edges)


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for _ in range(3):
        n = 80
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(20, 120))
        ]
        edges = [e for e in edges if e[0] != e[1]]
        _check(spark, edges)


def test_empty_edges(spark):
    _check(spark, [])


def test_neardup_clusters_canonical(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], ["id_a", "id_b"]
    )
    rows = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in neardup_clusters(pairs).collect()
    }
    assert rows == {
        1: (1, 3, True),
        2: (1, 3, False),
        3: (1, 3, False),
        7: (7, 2, True),
        9: (7, 2, False),
    }
