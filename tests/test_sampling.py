"""Operator tests for deterministic weighted sampling
(operators/sampling.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ccgp_data_wrangling_spark.operators.sampling import (
    priority_sample,
    priority_sum_estimate,
    token_budget_select,
)


def _corpus(spark, n=200, groups=4):
    return spark.createDataFrame(
        [(f"g{i % groups}", i, (i % 37) + 1) for i in range(n)],
        "src string, id long, w long",
    )


def test_priority_sample_size_and_tau(spark):
    df = _corpus(spark)
    s = priority_sample(df, "src", "id", "w", k=8)
    rows = s.collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r["src"], []).append(r)
    for g, grp in by_g.items():
        assert len(grp) == 8
        taus = {r["tau"] for r in grp}
        assert len(taus) == 1  # one threshold per group
        tau = taus.pop()
        # every sampled priority is >= tau (tau is the (k+1)-th)
        assert all(r["priority"] >= tau for r in grp)


def test_priority_sample_small_group_exact(spark):
    """Groups smaller than k: everything sampled, tau=0, estimator
    exact."""
    df = spark.createDataFrame(
        [("g", i, 10) for i in range(5)], "src string, id long, w long"
    )
    s = priority_sample(df, "src", "id", "w", k=8)
    assert s.count() == 5
    assert all(r["tau"] == 0.0 for r in s.collect())
    est = priority_sum_estimate(s, "src", "w").collect()[0]
    assert est["est_total_weight"] == 50.0


def test_priority_estimate_unbiased_band(spark):
    """The subset-sum estimate should land near the true total (the
    draw is deterministic, so this is a fixed regression check)."""
    df = _corpus(spark, n=2000, groups=1)
    true_total = df.agg(F.sum("w")).collect()[0][0]
    s = priority_sample(df, "src", "id", "w", k=64)
    est = priority_sum_estimate(s, "src", "w").collect()[0][
        "est_total_weight"
    ]
    assert 0.7 * true_total < est < 1.3 * true_total


def test_priority_sample_partition_invariance(spark):
    df1 = _corpus(spark).repartition(1)
    df2 = _corpus(spark).repartition(13)
    s1 = sorted(map(tuple, priority_sample(df1, "src", "id", "w", k=6).collect()))
    s2 = sorted(map(tuple, priority_sample(df2, "src", "id", "w", k=6).collect()))
    assert s1 == s2


def test_token_budget_admits_crossing_doc(spark):
    docs = spark.createDataFrame(
        [("a", 1, 300, 9), ("a", 2, 300, 8), ("a", 3, 300, 7),
         ("b", 4, 50, 5)],
        "source string, doc_id long, n_tokens long, q long",
    )
    out = token_budget_select(
        docs, budget_tokens=500, quality_col="q"
    ).collect()
    got = {(r["source"], r["doc_id"]): r["cum_tokens"] for r in out}
    # doc 2 crosses the 500 budget (cum 600) and is still admitted;
    # doc 3 starts at 600 >= 500 and is not
    assert set(got) == {("a", 1), ("a", 2), ("b", 4)}
    assert got[("a", 2)] == 600
    # group below budget: everything admitted
    assert got[("b", 4)] == 50


def test_token_budget_orders_by_quality(spark):
    docs = spark.createDataFrame(
        [("a", 1, 100, 1), ("a", 2, 100, 9)],
        "source string, doc_id long, n_tokens long, q long",
    )
    out = token_budget_select(docs, budget_tokens=100, quality_col="q")
    assert [r["doc_id"] for r in out.collect()] == [2]


# ---------------------------------------------------------------------------
# negative_samples
# ---------------------------------------------------------------------------


def test_negative_samples_out_of_class_and_k(spark):
    from ccgp_data_wrangling_spark.operators.sampling import (
        negative_samples,
    )

    items = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "id long, cls int"
    )
    out = negative_samples(items, "id", "cls", k=4).collect()
    by_anchor = {}
    cls = {i: i % 3 for i in range(30)}
    for r in out:
        by_anchor.setdefault(r["anchor"], []).append(r)
        assert cls[r["negative"]] != cls[r["anchor"]]
    assert all(len(v) == 4 for v in by_anchor.values())
    assert all(
        sorted(x["neg_rank"] for x in v) == [1, 2, 3, 4]
        for v in by_anchor.values()
    )


def test_negative_samples_layout_independent(spark):
    from ccgp_data_wrangling_spark.operators.sampling import (
        negative_samples,
    )

    rows = [(i, i % 4) for i in range(50)]
    a = spark.createDataFrame(rows, "id long, cls int").repartition(1)
    b = spark.createDataFrame(rows, "id long, cls int").repartition(13)
    ra = sorted(map(tuple, negative_samples(a, "id", "cls").collect()))
    rb = sorted(map(tuple, negative_samples(b, "id", "cls").collect()))
    assert ra == rb


def test_negative_samples_bounded_pool(spark):
    from ccgp_data_wrangling_spark.operators.sampling import (
        negative_samples,
    )

    anchors = spark.createDataFrame([(1, 0), (2, 1)], "id long, cls int")
    pool = spark.createDataFrame(
        [(100, 0), (101, 1), (102, 2)], "id long, cls int"
    )
    out = {
        (r["anchor"], r["negative"])
        for r in negative_samples(
            anchors, "id", "cls", k=5, pool=pool
        ).collect()
    }
    # negatives come from the pool only, out-of-class only
    assert out == {(1, 101), (1, 102), (2, 100), (2, 102)}
