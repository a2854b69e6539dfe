"""Deterministic text embeddings: feature hashing (hashing trick).

A real deployment embeds chunks with a neural encoder (an external
batch-inference step this offline container cannot run — same policy
as the multimodal decode stubs). The engine-side contract that DOES
matter — fixed-dim vector per chunk, layout-independent, cheap,
mergeable — is exactly what the classic hashing trick provides:
bucket = md5(token) mod dim, vector = bucket counts. It is also a
legitimate retrieval baseline in its own right (bag-of-words cosine),
and every downstream operator (knn, bitext, semdedup, ivf) consumes
it identically to a learned embedding.

Everything is exact integer arithmetic until the final cosine, so
embeddings are bit-identical on any partitioning and replay verbatim
in a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ccgp_data_wrangling_spark.operators.corpus_stats import corpus_tokens
from ccgp_data_wrangling_spark.operators.sketches import _element_hash

__all__ = ["hashed_embedding", "linear_text_score"]


def hashed_embedding(
    df: DataFrame,
    text_col: str,
    key_cols: list[str],
    *,
    dim: int = 64,
) -> DataFrame:
    """``key_cols + [vec]``: per-row hashed bag-of-words count vector
    (``array<long>``, length ``dim``).

    Shape: explode tokens → ONE exchange keyed on ``key_cols`` →
    two-level hash aggregate on (keys, bucket), then
    map_from_entries + dense ``sequence`` fill per row, all on the
    same partitioning. The explicit repartition exists because hash
    partitioning on a SUBSET of an aggregation's grouping keys
    satisfies its clustered-distribution requirement (guide §2.4
    "two operations keyed the same way can share one exchange"):
    without it the planner exchanges once on (keys, bucket) for the
    count and AGAIN on (keys) for the vector assembly — two shuffles
    of nearly identical volume, since a text chunk rarely repeats a
    bucket often enough for the (keys, bucket) map-side combine to
    pay for the second shuffle. No UDF, no Python.

    Counts are NOT normalized: cosine consumers normalize anyway, and
    integer counts keep the representation exact for oracles and for
    sketch-style downstream merges (vectors of two shards of the same
    doc ADD).
    """
    tokens = corpus_tokens(text_col)
    bucket = F.pmod(_element_hash(F.col("__w")), F.lit(dim)).cast("int")
    counts = (
        df.select(*key_cols, F.explode(tokens).alias("__w"))
        .select(*key_cols, bucket.alias("__b"))
        .repartition(*[F.col(c) for c in key_cols])
        .groupBy(*key_cols, "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at(F.col("__m"), i), F.lit(0)).cast(
            "long"
        ),
    )
    return (
        counts.groupBy(*key_cols)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("__b", "__c"))
            ).alias("__m")
        )
        .select(*key_cols, dense.alias("vec"))
    )


def linear_text_score(
    df: DataFrame,
    text_col: str,
    key_cols: list[str],
    *,
    dim: int = 256,
    seed: int = 11,
    bias: float = 0.0,
) -> DataFrame:
    """fastText-shaped linear classifier scoring:
    ``sigmoid(mean_b w[bucket(token)] + bias)`` per row.

    The weight table stands in for trained parameters (this offline
    container trains nothing): ``w[b] = (md5(seed:b) % 2001 − 1000) /
    1000`` — a deterministic dense vector in [−1, 1] that exercises
    the REAL production plumbing (hashed features, weight broadcast,
    mean-pool, sigmoid, threshold) and is replayable in SQL. Swapping
    in learned weights is a one-column change.

    Shape: tokens explode to (keys, bucket) rows; the dim-sized
    weight table is generated as a broadcast literal RELATION (not a
    dim-wide expression — at dim=10^6 an expression tree would choke
    the optimizer, a relation join stays O(1) plan size); one
    map-side-combining aggregate computes the mean. The sigmoid input
    and output are rounded to 6 dp (libm-proof policy).
    """
    tokens = corpus_tokens(text_col)
    # weights stay INTEGER (millis in [-1000, 1000]) until after the
    # aggregate: the per-row sum is exact, so the score is independent
    # of partition order — a double-typed Σw would drift at the ulp
    w_milli = F.pmod(
        _element_hash(
            F.concat_ws(":", F.lit(str(seed)), F.col("b").cast("string"))
        ),
        F.lit(2001),
    ) - 1000
    spark = df.sparkSession
    weights = spark.range(dim).select(
        F.col("id").cast("int").alias("b"), w_milli.alias("w_m")
    )
    bucket = F.pmod(_element_hash(F.col("__w")), F.lit(dim)).cast("int")
    feats = df.select(*key_cols, F.explode(tokens).alias("__w")).select(
        *key_cols, bucket.alias("b")
    )
    x = F.round(
        F.sum("w_m") / (1000.0 * F.count(F.lit(1))) + F.lit(bias), 6
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("x"))), 6)
    return (
        feats.join(F.broadcast(weights), "b")
        .groupBy(*key_cols)
        .agg(x.alias("x"))
        .select(*key_cols, "x")
        .withColumn("score", score)
        .withColumn("keep", F.col("score") >= 0.5)
    )
