"""Text-analysis Column functions for the training-data pipeline
surface (token counting, fingerprinting). All JVM-side expressions —
no Python in the hot path; every function documents the DuckDB
equivalent its oracle uses.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MERSENNE31 = (1 << 31) - 1

#: BPE-ish pretokenizer: a word (with optional leading space), a digit
#: run (ditto), or a punctuation run (ditto) — the GPT-2 pattern family
#: stripped of constructs whose semantics differ between Java regex and
#: DuckDB's RE2. Token count over this pattern tracks real BPE token
#: counts to within a small constant factor on natural text.
BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def ws_token_count(text: Column) -> Column:
    """Whitespace token count (trim + split on ``\\s+``).

    DuckDB oracle: ``LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'))``.
    """
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_ish_token_count(text: Column) -> Column:
    """Count of :data:`BPE_ISH_PATTERN` matches.

    DuckDB oracle: ``LEN(REGEXP_EXTRACT_ALL(text, <pattern>))``.
    """
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN))


def rolling_hash(text: Column, base: int = 31, mod: int = _MERSENNE31) -> Column:
    """Polynomial rolling hash (Horner fold) over the character codes:
    ``h = fold(h*base + code mod mod)``. ``base`` · ``mod`` must stay
    below 2^63 (ANSI mode throws on int64 overflow).

    DuckDB oracle::

        LIST_REDUCE(
          LIST_PREPEND(0, LIST_TRANSFORM(RANGE(LENGTH(text)),
                          i -> ASCII(SUBSTR(text, CAST(i+1 AS INT), 1)))),
          (acc, x) -> (acc * base + x) % mod)
    """
    codes = F.transform(F.split(text, ""), F.ascii)
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * base + x, F.lit(mod)),
    )
