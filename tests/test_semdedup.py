"""SemDeDup cluster-then-prune semantics on a controlled corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.operators.semdedup import (
    assign_seed_clusters,
    semantic_dedup,
)


def _axes_corpus(spark):
    """Two tight groups near orthogonal axes + exact/near copies.

    ids 0-1: the seeds (axis-x-ish, axis-y-ish) → the 2 centroids.
    ids 2-4: near-axis-x vectors, id 3 = copy of id 2.
    ids 5-7: near-axis-y vectors, id 7 = near-copy of id 5.
    """
    rows = [
        (0, [1.0, 0.05, 0.0]),
        (1, [0.05, 1.0, 0.0]),
        (2, [0.9, 0.1, 0.01]),
        (3, [0.9, 0.1, 0.01]),        # exact duplicate of 2
        (4, [0.95, 0.02, 0.2]),       # same cluster, not a dup
        (5, [0.1, 0.9, 0.02]),
        (6, [0.02, 0.95, 0.15]),      # same cluster, not a dup
        (7, [0.1001, 0.9001, 0.02]),  # near-copy of 5
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_duplicates_dropped_originals_kept(spark):
    out = {
        r.id: (r.cluster, r.keep)
        for r in semantic_dedup(
            _axes_corpus(spark), num_clusters=2, threshold=0.999
        ).collect()
    }
    assert len(out) == 8
    assert out[3][1] is False          # exact copy of 2 dropped
    assert out[7][1] is False          # near-copy of 5 dropped
    kept = [i for i, (_, k) in out.items() if k]
    assert sorted(kept) == [0, 1, 2, 4, 5, 6]


def test_cluster_assignment_follows_axes(spark):
    assigned = {
        r.id: r.cluster for r in assign_seed_clusters(
            _axes_corpus(spark), num_clusters=2
        ).collect()
    }
    # centroid 0 = axis-x seed, centroid 1 = axis-y seed
    assert {assigned[i] for i in (0, 2, 3, 4)} == {0}
    assert {assigned[i] for i in (1, 5, 6, 7)} == {1}


def test_cross_cluster_near_pairs_not_compared(spark):
    """Pairs straddling clusters are outside SemDeDup's candidate set
    by design — both survive even at a permissive threshold."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.72, 0.69]),   # assigns to cluster 0 (barely)
        (3, [0.69, 0.72]),   # assigns to cluster 1 (barely); cos(2,3)≈0.995
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.id: r.keep for r in semantic_dedup(df, num_clusters=2, threshold=0.99).collect()}
    assert out[2] and out[3]


def test_deterministic(spark):
    corpus = _axes_corpus(spark)
    a = sorted(tuple(r) for r in semantic_dedup(corpus, num_clusters=2).collect())
    b = sorted(tuple(r) for r in semantic_dedup(corpus, num_clusters=2).collect())
    assert a == b


def test_lsh_refinement_matches_exact(spark):
    """semantic_dedup_lsh must reproduce semantic_dedup exactly on the
    controlled corpus: exact/near copies share SRP buckets (tiny
    angles), non-dups that land in the same bucket are removed by the
    exact verify."""
    from ccgp_data_wrangling_spark.operators.semdedup import (
        semantic_dedup_lsh,
    )

    corpus = _axes_corpus(spark)
    exact = {
        (r.id, r.cluster, r.keep)
        for r in semantic_dedup(corpus, num_clusters=2, threshold=0.999).collect()
    }
    lsh = {
        (r.id, r.cluster, r.keep)
        for r in semantic_dedup_lsh(
            corpus, dim=3, num_clusters=2, threshold=0.999,
            n_tables=4, n_bits=2,
        ).collect()
    }
    assert lsh == exact


def test_lsh_max_bucket_guard_skips_hot_buckets(spark):
    """With max_bucket=1 every bucket is 'hot', so no candidate pairs
    form and everything is kept — the guard degrades recall, never
    correctness of the keep-at-least-one invariant."""
    from ccgp_data_wrangling_spark.operators.semdedup import (
        semantic_dedup_lsh,
    )

    out = semantic_dedup_lsh(
        _axes_corpus(spark), dim=3, num_clusters=2, threshold=0.999,
        n_tables=2, n_bits=2, max_bucket=1,
    )
    assert all(r.keep for r in out.collect())


def test_max_cluster_guard_skips_degenerate_cluster(spark):
    """One degenerate cluster swallowing most of the corpus is excluded
    from pair generation under max_cluster, keeping all its rows
    (conservative), while small clusters still dedup normally."""
    # cluster 0 (x-axis): 6 members incl. an exact dup pair → degenerate
    # cluster 1 (y-axis): 2 members incl. an exact dup pair → small
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.9, 0.1, 0.0]),     # dup of 2 (cluster 0)
        (4, [0.95, 0.05, 0.1]),
        (5, [0.92, 0.08, 0.05]),
        (6, [0.05, 0.9, 0.0]),
        (7, [0.05, 0.9, 0.0]),    # dup of 6 (cluster 1)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r.id: r.keep
        for r in semantic_dedup(
            corpus, num_clusters=2, threshold=0.999, max_cluster=4
        ).collect()
    }
    assert len(out) == 8
    # cluster 0 has 6 > 4 members: its dup (id 3) is NOT dropped
    assert out[3] is True
    # cluster 1 has 2 <= 4 members: dedup still applies there
    assert out[7] is False and out[6] is True
    # uncapped run drops both dups — the guard is the only difference
    uncapped = {
        r.id: r.keep
        for r in semantic_dedup(corpus, num_clusters=2, threshold=0.999).collect()
    }
    assert uncapped[3] is False and uncapped[7] is False


def test_all_three_carriers_identical_decisions(spark):
    """literal / broadcast-table / Arrow-kernel carriers must produce
    IDENTICAL clusters and keep decisions (same rounded-argmax, same
    tie-breaks) — on semdedup, semdedup-LSH, and multi-query IVF."""
    import math
    import random

    from pyspark.sql import functions as F

    from ccgp_data_wrangling_spark.operators.knn import ivf_topk_multi
    from ccgp_data_wrangling_spark.operators.semdedup import (
        semantic_dedup,
        semantic_dedup_lsh,
    )

    rng = random.Random(5)
    rows = []
    for i in range(80):
        v = [rng.gauss(0, 1) for _ in range(16)]
        rows.append((i, v))
    # planted near-copies of ids 0-4
    for i in range(5):
        v = list(rows[i][1])
        v[0] += 0.001
        rows.append((500 + i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    outs = {}
    for carrier in ("literal", "table", "kernel"):
        sd = sorted(
            (r.id, r.cluster, r.keep)
            for r in semantic_dedup(
                emb, num_clusters=4, threshold=0.999, carrier=carrier
            ).collect()
        )
        lsh = sorted(
            (r.id, r.cluster, r.keep)
            for r in semantic_dedup_lsh(
                emb, dim=16, num_clusters=4, threshold=0.999,
                n_tables=2, n_bits=6, carrier=carrier,
            ).collect()
        )
        q = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
        )
        ivf = sorted(
            (r.query_id, r.vec_id, r.cos_sim, r.rank)
            for r in ivf_topk_multi(
                emb, q, 5, n_centroids=6, n_probe=3, carrier=carrier
            ).collect()
        )
        outs[carrier] = (sd, lsh, ivf)
        assert any(not k for _, _, k in sd)  # planted copies dropped

    assert outs["literal"] == outs["table"] == outs["kernel"]
    _ = math
