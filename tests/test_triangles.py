"""Triangle counting: known closed forms, dirty-input cleaning,
hub-orientation bound."""

from __future__ import annotations

import itertools

from ccgp_data_wrangling_spark.operators.triangles import triangle_counts


def test_k4_and_path(spark):
    # K4: every vertex sits in C(3,2)=3 triangles
    k4 = [(a, b) for a, b in itertools.combinations(range(4), 2)]
    # plus a dangling path 4-5-6 (no triangles)
    edges = spark.createDataFrame(
        k4 + [(4, 5), (5, 6)], "src long, dst long"
    )
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_duplicates_loops_and_direction_are_cleaned(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (1, 2), (2, 1)],
        "src long, dst long",
    )
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {0: 1, 1: 1, 2: 1}  # exactly one triangle


def test_hub_star_has_no_triangles(spark):
    # a 50-leaf star: hub orientation gives the hub out-degree 0;
    # wedges rooted at leaves are 0 (out-degree 1 each → no pairs)
    edges = spark.createDataFrame(
        [(99, i) for i in range(50)], "src long, dst long"
    )
    assert triangle_counts(edges).count() == 0
