"""Content-defined chunking (CDC) and chunk-level dedup.

Fixed-width chunking breaks on insertion: add one byte at the front
and every downstream chunk boundary shifts, so nothing dedups against
the original. Content-defined chunking places boundaries where the
CONTENT says so — here, after any position whose trailing k-gram
hashes to 0 mod a divisor (the anchor rule used by winnowing /
Rabin-style chunkers; FastCDC et al. refine the same idea). An
insertion only perturbs boundaries inside the k-gram window it
touches; every later chunk re-aligns and dedups.

Implementation is pure Column HOFs — no UDF, no Python in the loop:

* anchor positions: ``filter(sequence(k, len), p -> md5(k-gram at p)
  % divisor == 0)`` — O(len) native-md5 calls per doc,
  embarrassingly parallel, no state between rows. The corpus is
  repartitioned ahead of the scan so per-position work rides every
  core regardless of how few input splits the source has (the same
  layout-decoupling as the linkage operator's pre-explosion
  repartition).
* segments: ``slice`` between consecutive anchors via one
  ``zip_with`` over (starts, ends).
* dedup: explode segments → md5 → the standard content-hash
  group-by family (exact dedup), with (doc, position) provenance.

Scale shape: per-doc work is linear-ish in text length; the only
shuffle is the final chunk-hash aggregate — same budget class as
token explode. Runt segments are possible (two adjacent anchors);
production chunkers impose a min length with sequential state — this
operator deliberately stays stateless (every anchor cuts), trading a
slightly wider segment-length distribution for layout independence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["cdc_segments", "cdc_chunk_dedup"]


def _anchors(text: Column, k: int, divisor: int) -> Column:
    """1-based END positions p (k ≤ p ≤ len) whose trailing k-gram is
    an anchor: md5 of substring(p-k+1, k) ≡ 0 (mod divisor).

    One native md5 per position beats any multi-term arithmetic here:
    higher-order-function lambdas run INTERPRETED (not codegen), so a
    k-term polynomial pays k interpreted substring+ascii calls per
    position — measured 3× slower than the single md5 it was tried
    against. The real throughput lever is partitioning (see
    cdc_segments).
    """
    if 256 % divisor == 0:
        # conv(md5-hex[1:15], 16, 10) mod divisor depends only on the
        # last two of those hex chars when divisor | 256 (16^j ≡ 0 mod
        # divisor for j ≥ 2), so hash just substring(md5, 14, 2): the
        # SAME anchors for ~7x less interpreted per-position conv work
        # (the lambda below runs on the non-codegen expression
        # evaluator once per character of the corpus)
        gram_hash = lambda p: F.conv(  # noqa: E731
            F.substring(F.md5(F.substring(text, p - k + 1, k)), 14, 2),
            16, 10,
        ).cast("long")
    else:
        gram_hash = lambda p: F.conv(  # noqa: E731
            F.substring(F.md5(F.substring(text, p - k + 1, k)), 1, 15),
            16, 10,
        ).cast("long")
    # guard the short-text case with one per-row conditional instead of
    # a per-position `p <= length` term: for length >= k the sequence
    # holds exactly the valid positions already, and shorter (or null)
    # texts anchor nowhere — identical output, one fewer interpreted
    # comparison per character
    anchors = F.filter(
        F.sequence(F.lit(k), F.length(text)),
        lambda p: F.pmod(gram_hash(p), F.lit(divisor)) == 0,
    )
    return F.when(F.length(text) >= k, anchors).otherwise(
        F.array().cast("array<int>")
    )


def cdc_segments(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    divisor: int = 64,
) -> DataFrame:
    """``(id, seg_idx, start, seg)``: content-defined segments.

    Expected segment length ≈ ``divisor`` chars (anchor probability
    1/divisor per position). Boundaries cut AFTER each anchor
    position; the final partial segment is always emitted.
    """
    spark_parallelism = df.sparkSession.sparkContext.defaultParallelism
    df = df.repartition(2 * spark_parallelism)
    text = F.col(text_col)
    anchors = _anchors(text, k, divisor)
    # starts = [1, a1+1, a2+1, ...]; ends = [a1, a2, ..., len]
    starts = F.concat(
        F.array(F.lit(1)), F.transform(anchors, lambda a: a + 1)
    )
    ends = F.concat(anchors, F.array(F.length(text)))
    segs = F.zip_with(
        starts,
        ends,
        lambda s, e: F.struct(
            s.alias("start"), F.substring(text, s, e - s + 1).alias("seg")
        ),
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(
                F.filter(segs, lambda x: x["seg"] != "")
            ).alias("seg_idx", "x"),
        )
        .select("id", "seg_idx", F.col("x.start").alias("start"),
                F.col("x.seg").alias("seg"))
    )


def cdc_chunk_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    divisor: int = 64,
) -> DataFrame:
    """Chunk-level dedup stats: per distinct segment content, how many
    (doc, position) sites carry it — ``(seg_md5, n_sites, n_docs,
    seg_len)`` for segments appearing more than once.

    This is deduplicated-storage math (how many bytes would a
    chunk store save?) and the insertion-robust complement of the
    document-level MinHash family.
    """
    segs = cdc_segments(df, id_col, text_col, k=k, divisor=divisor)
    return (
        segs.groupBy(F.md5("seg").alias("seg_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_sites"),
            F.count_distinct("id").alias("n_docs"),
            F.max(F.length("seg")).alias("seg_len"),
        )
        .where(F.col("n_sites") > 1)
    )
