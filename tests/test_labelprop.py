"""Label propagation tests (operators/labelprop.py)."""

from __future__ import annotations

from ccgp_data_wrangling_spark.operators.labelprop import label_propagation


def _labels(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["label"]
        for r in label_propagation(df, **kw).collect()
    }


def test_two_cliques_one_bridge_stay_separate(spark):
    """LPA keeps densely-connected cliques as distinct communities
    even when one bridge edge connects them (CC would merge them)."""
    clique1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    clique2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    bridge = [(3, 10)]
    out = _labels(spark, clique1 + clique2 + bridge, n_rounds=4)
    c1 = {out[n] for n in range(4)}
    c2 = {out[n] for n in range(10, 14)}
    assert len(c1) == 1 and len(c2) == 1 and c1 != c2


def test_deterministic_across_layouts(spark):
    edges = [(i, (i * 3 + 1) % 40) for i in range(120)]
    df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    df17 = spark.createDataFrame(edges, "src long, dst long").repartition(17)
    r1 = sorted(map(tuple, label_propagation(df1).collect()))
    r17 = sorted(map(tuple, label_propagation(df17).collect()))
    assert r1 == r17


def test_self_loops_ignored(spark):
    out = _labels(spark, [(1, 1), (1, 2)], n_rounds=2)
    assert set(out) == {1, 2}


def test_label_propagation_string_node_ids(spark):
    """String ids must work: the tie-break is struct ordering, not
    numeric negation (two disjoint triangles, ties to smallest id)."""
    from ccgp_data_wrangling_spark.operators.labelprop import (
        label_propagation,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("x", "y"), ("y", "z"), ("z", "x")],
        "src string, dst string",
    )
    out = {r.node: r.label for r in label_propagation(edges, n_rounds=4).collect()}
    assert {out[n] for n in "abc"} == {"a"}
    assert {out[n] for n in "xyz"} == {"x"}
