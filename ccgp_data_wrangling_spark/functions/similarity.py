"""String-similarity Column functions.

``thefuzz.fuzz.ratio`` (reference: update_reads.py:176-179) is the
indel ratio ``2·LCS(a,b)/(|a|+|b|)·100`` (python-Levenshtein fast
path; difflib agrees on real-world cases). Spark has ``levenshtein``
(substitution cost 1) natively, but that measurably disagrees with
fuzz.ratio on prefix-containment cases — exactly the shape linkage
conflicts take — so we compute LCS exactly, as a pure Column
expression: the classic rolling-row DP, expressed with nested
``aggregate`` higher-order functions. All JVM-side; O(|a|·|b|) per
pair, fine for identifier-length strings on the (rare) conflict path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _chars(col: Column) -> Column:
    return F.filter(F.split(col, ""), lambda x: x != "")


def lcs_length(a: Column, b: Column) -> Column:
    """Length of the longest common subsequence of two strings."""
    a_chars = _chars(a)
    b_chars = _chars(b)
    la = F.size(a_chars)
    init_row = F.array_repeat(F.lit(0), la + 1)

    def next_row(orow: Column, cb: Column) -> Column:
        # new[i] = a[i-1]==cb ? old[i-1]+1 : max(old[i], new[i-1])
        return F.aggregate(
            F.sequence(F.lit(1), la),
            F.array(F.lit(0)),
            lambda nrow, i: F.concat(
                nrow,
                F.array(
                    F.when(
                        F.element_at(a_chars, i) == cb,
                        F.element_at(orow, i) + 1,
                    ).otherwise(
                        F.greatest(
                            F.element_at(orow, i + 1),
                            F.element_at(nrow, i),
                        )
                    )
                ),
            ),
        )

    final_row = F.aggregate(b_chars, init_row, next_row)
    lcs = F.element_at(final_row, la + 1)
    return F.when((la == 0) | (F.size(b_chars) == 0), F.lit(0)).otherwise(lcs)


def fuzz_ratio(a: Column, b: Column) -> Column:
    """thefuzz-compatible similarity: 100 · 2·LCS / (|a|+|b|)."""
    total = F.length(a) + F.length(b)
    return F.when(total == 0, F.lit(100.0)).otherwise(
        200.0 * lcs_length(a, b) / total
    )
