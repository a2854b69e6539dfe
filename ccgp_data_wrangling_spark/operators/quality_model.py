"""Model-based quality filtering — the fasttext-shaped linear stage
every LLM curation pipeline runs after the rule-based Gopher gates:
hash each token into a bucketed feature space, mean-pool the bucket
weights, squash to a keep-probability.

Scale shape (the whole point): the model is a BUCKET→WEIGHT table of
a few thousand rows — a broadcast join, never a UDF. Per document the
work is explode → broadcast-join → one hash aggregation; everything
stays in whole-stage codegen. Weights are carried as integers in
1/1000 units so the pooled sum is EXACT (partition-order independent,
bit-identical in the DuckDB oracle); the only float is the final
sigmoid. The keep decision compares the INTEGER sum against the
threshold, so keep/drop can never dither on float rounding.

Tokenization and hashing reuse the engine-wide conventions
(corpus_stats.corpus_tokens, sketches._element_hash) — a scorer with
its own tokenizer disagrees with the dedup and stats stages on
exactly the messy documents that matter.

Reference parity: cademirch/ccgp-data-wrangling has no model stage;
this is beyond-reference LLM-pipeline surface (same family as the
Gopher/bigram-LM filters in corpus_stats.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["hashed_weights_fixture", "score_documents"]


def hashed_weights_fixture(
    spark: SparkSession, n_buckets: int = 4096
) -> DataFrame:
    """Deterministic (bucket, w_milli) table standing in for trained
    weights: w_milli = (bucket · 2654435761) mod 2001 − 1000, i.e.
    pseudo-random in [−1.0, +1.0] at 1/1000 resolution. Knuth's
    multiplicative constant decorrelates weight sign from bucket
    locality; the formula is replayed verbatim in oracle SQL."""
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        ((F.col("id") * F.lit(2654435761)) % 2001 - 1000)
        .cast("long")
        .alias("w_milli"),
    )


def score_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: DataFrame,
    *,
    n_buckets: int = 4096,
    keep_threshold_milli: int = 0,
) -> DataFrame:
    """Score documents with a hashed linear model.

    ``weights``: (bucket, w_milli) — broadcast (a real quality model
    is 10³–10⁵ buckets, kilobytes). Per doc: tokens → bucket =
    md5-hash mod ``n_buckets`` → mean-pooled w_milli sum →
    ``prob = σ(score)``. Returns (id, n_tokens, score_milli, prob,
    keep); ``keep`` is the exact integer comparison
    ``score_milli ≥ keep_threshold_milli · n_tokens`` (the pooled
    mean vs the threshold, cleared of the division)."""
    from ccgp_data_wrangling_spark.operators.corpus_stats import (
        corpus_tokens,
    )
    from ccgp_data_wrangling_spark.operators.sketches import _element_hash

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(corpus_tokens(text_col)).alias("tok"),
    ).select(
        "id",
        ((_element_hash(F.col("tok")) - 1) % n_buckets).alias("bucket"),
    )
    pooled = (
        toks.join(F.broadcast(weights), "bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w_milli").alias("score_milli"),
        )
    )
    mean_score = F.col("score_milli") / (F.col("n_tokens") * 1000.0)
    return pooled.select(
        "id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("score_milli").cast("long").alias("score_milli"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-mean_score)), 4).alias(
            "prob"
        ),
        (
            F.col("score_milli")
            >= F.lit(keep_threshold_milli) * F.col("n_tokens")
        ).alias("keep"),
    )
