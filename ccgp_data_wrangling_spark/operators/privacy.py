"""Privacy operators: deterministic column tokenization and
k-anonymity auditing.

The reference's privacy surface is coordinate masking for sensitive
species (create_sheets_ultimate.py masking path; re-expressed in
operators/sheets.mask_coordinates). A data platform needs the two
generic companions:

* **Tokenization** — replace identifying values with salted
  deterministic tokens. Determinism (same value → same token) is the
  point: referential integrity survives, joins on the tokenized
  column still work, but the raw value is gone. Salting prevents
  rainbow lookup of low-entropy values; rotating the salt rotates
  the token space.
* **k-anonymity audit** — before publishing a "de-identified"
  extract, verify every quasi-identifier combination matches at
  least k rows; the groups below k are exactly the re-identifiable
  ones.

Both are single hash-aggregate / projection shapes — nothing here
shuffles more than once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["tokenize_columns", "k_anonymity_audit", "pii_redact", "PII_PATTERNS"]


def _token(col: Column, salt: str) -> Column:
    """Salted deterministic token: md5(salt ':' value); NULL stays
    NULL (a tokenized null would fabricate a value and break
    null-semantics of downstream joins/aggregates)."""
    return F.when(
        col.isNotNull(),
        F.md5(F.concat_ws(":", F.lit(salt), col.cast("string"))),
    )


def tokenize_columns(
    df: DataFrame, cols: list[str], *, salt: str
) -> DataFrame:
    """Replace each named column with its salted token (same name,
    string type). Pure projection — codegen, no shuffle."""
    out = df
    for c in cols:
        out = out.withColumn(c, _token(F.col(c), salt))
    return out


def k_anonymity_audit(
    df: DataFrame, quasi_cols: list[str], *, k: int
) -> DataFrame:
    """Quasi-identifier groups with fewer than ``k`` rows:
    ``quasi_cols + (group_size, deficit)``.

    Empty result == the extract satisfies k-anonymity. One map-side-
    combining hash aggregate; NULLs group as their own value (a NULL
    quasi value is still a quasi value to an attacker)."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .where(F.col("group_size") < k)
        .withColumn("deficit", (F.lit(k) - F.col("group_size")).cast("int"))
    )


# -- PII redaction ---------------------------------------------------------

#: (placeholder, pattern) in application order. Patterns restrict
#: themselves to the regex subset Java (Spark) and RE2 (DuckDB,
#: oracle side) interpret identically: char classes, bounded repeats,
#: \d, word boundaries — no lookaround, no backrefs. Order matters
#: only in that earlier replacements insert bracketed placeholders no
#: later pattern can match.
PII_PATTERNS: list[tuple[str, str]] = [
    ("[EMAIL]", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("[SSN]", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("[PHONE]", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
    ("[IP]", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def pii_redact(text: Column) -> tuple[Column, dict[str, Column]]:
    """Redact common PII shapes (emails, SSNs, US-style phone numbers,
    IPv4 addresses) from a text Column.

    Returns ``(redacted, counts)`` where ``redacted`` replaces every
    match with its bracketed placeholder and ``counts`` maps pattern
    name → per-row match count (computed BEFORE redaction). The whole
    thing is chained ``regexp_replace`` / ``regexp_count`` — pure
    whole-stage codegen, no UDFs, no shuffle — which is the only form
    that holds when the scrub runs over every document of a 100 TB
    corpus. SSN is matched before the phone shape so the 3-2-4
    grouping is never half-claimed by the 3-3-4 one (the two are
    disjoint, but the order documents the intent).
    """
    counts: dict[str, Column] = {}
    redacted = text
    for name, pat in PII_PATTERNS:
        key = name.strip("[]").lower()
        counts[f"n_{key}"] = F.regexp_count(text, F.lit(pat)).cast("int")
        redacted = F.regexp_replace(redacted, pat, name.replace("$", r"\$"))
    return redacted, counts
