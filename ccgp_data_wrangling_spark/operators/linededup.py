"""Corpus-wide line deduplication with document REWRITE — the C4
recipe (Raffel et al. 2020, §2.2 "we discard all but one of any
three-sentence span occurring more than once"): boilerplate lines
(navigation, license headers, share buttons) repeat across millions
of pages, and dropping them changes model quality more than most
other curation steps. Unlike span_dedup (which SCORES duplication),
this operator rewrites each document keeping only the lines whose
FIRST corpus occurrence lives in that document.

First-wins semantics: a line's owner is the globally smallest
(doc_id, position) pair that contains it — deterministic on any
partitioning, no rand(), replayable as a window MIN in SQL. All
other occurrences (later docs AND later repeats inside the owner)
are dropped.

Scale shape: one explode (line rows ∝ corpus tokens / line length),
ONE window over the line key (hash-partitioned by line — the same
shuffle a groupBy would cost), one per-doc reassembly aggregate.
``hash_keys=True`` partitions that window by ``xxhash64(line)`` (an
8-byte sort/partition key instead of the full line string — the same
keying span_dedup's ``hash_spans`` and the incremental
LineDedupState use, with the same documented ~n²/2⁶⁵ collision
acceptance); the reassembly carries (pos, line) pairs only for KEPT
lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.operators.corpus_stats import corpus_tokens

__all__ = ["dedup_lines_first_wins"]


def dedup_lines_first_wins(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    line_tokens: int = 8,
    hash_keys: bool = False,
) -> DataFrame:
    """Rewrite documents with corpus-duplicated lines removed.

    Lines are non-overlapping ``line_tokens``-token chunks of the
    whitespace tokenization (a corpus with real newlines would split
    on those instead — the dedup logic is line-definition agnostic).
    Returns (id, text_clean, n_lines, n_kept) — ``text_clean`` joins
    the kept lines in document order; a document whose every line is
    owned elsewhere keeps an empty string (dropping the ROW is the
    caller's policy decision, not the operator's).

    ``hash_keys=True`` keys the ownership window by ``xxhash64(line)``
    instead of the line string — the keying the incremental
    :class:`~ccgp_data_wrangling_spark.streaming.linededup_stream.LineDedupState`
    always uses, so chunked-stream ≡ batch stays byte-identical under
    it. A 64-bit collision would merge unrelated lines (~n²/2⁶⁵).
    """
    toks = corpus_tokens(text_col)
    n_lines = F.ceil(F.size(toks) / F.lit(line_tokens)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.array_join(
            F.slice(toks, i * line_tokens + 1, line_tokens), " "
        ),
    )
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.when(F.size(toks) > 0, lines).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("pos", "line"),
    )
    w = Window.partitionBy(
        F.xxhash64("line") if hash_keys else F.col("line")
    )
    kept = (
        exploded.withColumn("__owner", F.min(F.struct("id", "pos")).over(w))
        .where(
            (F.col("id") == F.col("__owner.id"))
            & (F.col("pos") == F.col("__owner.pos"))
        )
        .drop("__owner")
    )
    rebuilt = kept.groupBy("id").agg(
        F.count(F.lit(1)).cast("int").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s.getField("line"),
            ),
            " ",
        ).alias("text_clean"),
    )
    totals = df.select(
        F.col(id_col).alias("id"),
        F.ceil(F.size(corpus_tokens(text_col)) / F.lit(line_tokens))
        .cast("int")
        .alias("n_lines"),
    )
    return totals.join(rebuilt, "id", "left").select(
        "id",
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )
