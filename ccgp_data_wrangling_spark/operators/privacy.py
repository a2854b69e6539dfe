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

__all__ = ["tokenize_columns", "k_anonymity_audit"]


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
