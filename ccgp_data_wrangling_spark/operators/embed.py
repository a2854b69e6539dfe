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

__all__ = ["hashed_embedding"]


def hashed_embedding(
    df: DataFrame,
    text_col: str,
    key_cols: list[str],
    *,
    dim: int = 64,
) -> DataFrame:
    """``key_cols + [vec]``: per-row hashed bag-of-words count vector
    (``array<long>``, length ``dim``).

    Shape: explode tokens → two-level hash aggregate on
    (keys, bucket) — map-side combining keeps the shuffle at
    ≤ dim rows per input row worst-case, typically far fewer — then
    one map_from_entries + dense ``sequence`` fill per row. No UDF,
    no Python; the whole thing is codegen + one exchange.

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
