"""Span-level (substring) duplication detection across documents.

Document-level dedup (operators/dedup.py) misses the dominant failure
mode of web corpora: *partially* duplicated text — boilerplate
headers, license blocks, templated paragraphs — embedded in otherwise
distinct pages. Lee et al., "Deduplicating Training Data Makes
Language Models Better" (ACL 2022) removes duplicated *spans*; this
module is the Spark-shaped equivalent: fixed-width token windows,
inverted on the window key, scored per document.

Scale shape: tokenize → sliding windows (an O(tokens) zip_with fold,
operators/corpus_stats._grams) → explode → distinct → one
map-side-combining groupBy on the window key → semi-join back.
No all-pairs comparison anywhere; the only shuffles are keyed by the
window, and ``max_window_df`` caps pathological keys (the empty-ish
boilerplate that would otherwise concentrate a partition) exactly like
dedup.ngram_jaccard_pairs' ``max_df`` guard.

``hash_spans=True`` shuffles 8-byte ``xxhash64`` keys instead of the
~50-char window strings (≈6× fewer shuffle bytes at 100 TB; the
accepted sketch tradeoff is that a 64-bit collision can merge two
unrelated spans). The registered oracle query runs with
``hash_spans=False`` so Spark and DuckDB group on the identical
string key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ccgp_data_wrangling_spark.caching import CacheScope, active_scope
from ccgp_data_wrangling_spark.operators.corpus_stats import (
    _grams,
    corpus_tokens,
)

__all__ = ["span_duplication_stats"]


def span_duplication_stats(
    docs: DataFrame,
    *,
    window: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_spans: bool = False,
    max_window_df: int | None = None,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Per-document duplicated-span statistics.

    Returns ``(id, n_windows, n_dup_windows, dup_ratio)`` where a
    window is "duplicated" iff the identical ``window``-token span
    occurs in at least one *other* document. ``n_windows`` counts
    distinct spans within the doc (internal repeats collapse — the
    Gopher repetition filter, corpus_stats.repetition_stats, owns
    within-doc repetition). Docs shorter than ``window`` tokens keep a
    row with zero counts so downstream keep/drop joins see every doc.

    ``dup_ratio`` is rounded to 4 dp on both engines so the value hash
    is stable across double formatting.
    """
    from pyspark.sql import Window

    span = F.explode(_grams(corpus_tokens(text_col), window)).alias("span")
    spans = docs.select(F.col(id_col).alias("id"), span)
    if hash_spans:
        spans = spans.select("id", F.xxhash64("span").alias("span"))
    # the tokenize→gram-fold→explode→distinct build dominates cost
    # (~half the cold run); persist it like dedup.py's signature
    # tables so repeated invocations in a session reuse it
    if scope is None:
        scope = active_scope("span_duplication_stats")
    spans = scope.persist(spans.distinct())

    # Single-pass shape: annotate each distinct (doc, span) row with
    # the span's document frequency via a count-over-window keyed on
    # the span, then one groupBy(doc) rolls both counters up. One
    # window shuffle + one agg shuffle, versus the naive
    # df-count / semi-join / two-groupBy plan (5 shuffles + a persist,
    # measured 2.5x slower cold). Window partitions are per-SPAN —
    # bounded by the span's df, so no skewed partition at scale (and
    # ``max_window_df`` bounds what "dup" can even mean).
    span_df = F.count(F.lit(1)).over(Window.partitionBy("span"))
    is_dup = F.col("span_df") >= 2
    if max_window_df is not None:
        is_dup = is_dup & (F.col("span_df") <= max_window_df)
    per_doc = (
        spans.withColumn("span_df", span_df)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.when(is_dup, 1).otherwise(0)).alias("n_dup_windows"),
        )
    )

    base = docs.select(F.col(id_col).alias("id"))
    out = base.join(per_doc, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
        F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
    )
    return out.withColumn(
        "dup_ratio",
        F.when(
            F.col("n_windows") > 0,
            F.round(F.col("n_dup_windows") / F.col("n_windows"), 4),
        ).otherwise(F.lit(0.0)),
    )
