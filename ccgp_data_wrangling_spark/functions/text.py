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


#: PII patterns kept to the regex subset Java regex and RE2 share (no
#: backreferences, no lookaround) so the DuckDB oracle can apply the
#: identical expressions. Ordering matters: emails first (an email
#: contains digit runs a later pattern would half-redact).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}", "[PHONE]"),
    (r"[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}", "[PHONE]"),
    (r"[0-9]{13,19}", "[NUM]"),  # card-length digit runs
]


def scrub_pii(text: Column) -> Column:
    """Redact email / phone / long-digit-run spans with typed
    sentinels — the standard pre-training privacy scrub. A chain of
    JVM ``regexp_replace`` passes (one per pattern), whole-stage
    codegen'd; at 100 TB this is a map-only stage with zero shuffle.

    DuckDB oracle: the same chain via nested
    ``REGEXP_REPLACE(..., 'g')`` (DuckDB replaces only the first
    match unless the 'g' flag is given; Spark is global by default).
    """
    out = text
    for pattern, sentinel in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, sentinel)
    return out
