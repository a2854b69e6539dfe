"""Bloom-filter pre-join pruning — the semi-join pushdown a 100 TB
fact-scan wants when the dimension's KEY SET fits a few kilobytes
but the dimension itself is too wide/large to broadcast: build a
Bloom filter over the small side's join keys, filter the fact scan
with pure bit arithmetic BEFORE the shuffle, then run the exact join
on the survivors. False positives cost only wasted shuffle rows; the
exact join removes them, so the RESULT is identical to the plain
join — which is exactly what the oracle checks.

Spark's own runtime bloom pushdown (`spark.sql.optimizer.
runtime.bloomFilter.enabled`) covers shuffle-join cases the planner
recognizes; this operator is the explicit form for when the caller
KNOWS the key set is small (e.g. a curated allowlist) and wants the
filter in the logical plan — visible, testable, and applied at the
scan regardless of join strategy.

Implementation: k positions per key via the engine-standard md5 hash
(sketches._element_hash) with per-seed suffixes; the filter is
``m_bits/64`` longs. The build collects AT MOST ``m_bits`` distinct
bit positions (bounded driver materialization, like the centroid
samples); membership is codegen bit arithmetic over a literal array
— no UDF anywhere. For filters past ~64 K bits, prefer a broadcast
(word_idx, word) table join over the literal-array carrier (same
trade the knn centroid carrier makes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["build_bloom_words", "bloom_contains", "bloom_semi_join"]


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    from ccgp_data_wrangling_spark.operators.sketches import _element_hash

    return [
        (
            _element_hash(F.concat(key.cast("string"), F.lit(f"#bf{s}")))
            % m_bits
        )
        for s in range(k)
    ]


def build_bloom_words(
    df: DataFrame, key_col: str, *, m_bits: int = 8192, k: int = 4
) -> list[int]:
    """Build the filter: ``m_bits // 64`` longs. Distinct bit
    positions are collected (≤ ``m_bits`` rows however large the key
    set) and folded driver-side."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos_col = F.explode(
        F.array(*_positions(F.col(key_col), m_bits, k))
    ).alias("p")
    rows = df.select(pos_col).distinct().collect()
    words = [0] * (m_bits // 64)
    for r in rows:
        p = int(r.p)
        words[p // 64] |= 1 << (p % 64)
    # clamp to signed 64-bit (Spark LongType literals)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_contains(
    key: Column, words: list[int], *, m_bits: int, k: int = 4
) -> Column:
    """Membership test: all ``k`` bits set — pure bit arithmetic in
    whole-stage codegen."""
    lit_words = F.array(*[F.lit(w) for w in words])
    cond = F.lit(True)
    for h in _positions(key, m_bits, k):
        word = F.element_at(lit_words, (h / 64).cast("int") + 1)
        # call_function: pyspark's shiftright() helper takes only a
        # Python-int shift amount; the SQL function takes a Column
        bit = F.call_function(
            "shiftright", word, (h % 64).cast("int")
        ).bitwiseAND(F.lit(1))
        cond = cond & (bit == 1)
    return cond


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    *,
    m_bits: int = 8192,
    k: int = 4,
    how: str = "inner",
) -> DataFrame:
    """``big ⋈ small`` with the bloom prefilter applied to ``big``
    before the shuffle. Result rows are IDENTICAL to the plain join
    (false positives die in the exact join); only the shuffle volume
    changes."""
    words = build_bloom_words(small, small_key, m_bits=m_bits, k=k)
    pruned = big.where(
        bloom_contains(F.col(big_key), words, m_bits=m_bits, k=k)
    )
    return pruned.join(
        small, pruned[big_key] == small[small_key], how
    )
