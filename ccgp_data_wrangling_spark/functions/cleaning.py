"""Cleaning/parsing Column functions — reference-parity semantics.

Each function mirrors a row-wise Python transform in the reference's
``utils/parse.py`` / ingest scripts (file:line cited per function),
re-expressed as a native Column expression so it runs JVM-side under
whole-stage codegen. Where the reference's behavior on garbage input
is an artifact (e.g. raising ValueError mid-pipeline), we take the
stricter deterministic choice of yielding NULL and note it
(SURVEY.md §7.4 "null-sentinel zoo").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# X1 — lat/long extraction from composite strings.
# Reference: utils/parse.py:16-39 (split_lat/split_long). Strip ascii
# letters, then: "a,b" → (a, b); "38.05 N 120.62 W" (4 space-separated
# tokens after letter-strip) → (tok0, tok2); "a_b" → (a, b); else NULL.
# ---------------------------------------------------------------------------


def _letters_stripped(col: Column) -> Column:
    return F.regexp_replace(col, "[A-Za-z]", "")


def split_lat(col: Column) -> Column:
    s = _letters_stripped(col)
    return (
        F.when(F.size(F.split(s, ",")) == 2, F.split(s, ",")[0])
        .when(F.size(F.split(s, " ")) == 4, F.split(s, " ")[0])
        .when(F.size(F.split(s, "_")) == 2, F.split(s, "_")[0])
    )


def split_long(col: Column) -> Column:
    s = _letters_stripped(col)
    return (
        F.when(F.size(F.split(s, ",")) == 2, F.split(s, ",")[1])
        .when(F.size(F.split(s, " ")) == 4, F.split(s, " ")[2])
        .when(F.size(F.split(s, "_")) == 2, F.split(s, "_")[1])
    )


# ---------------------------------------------------------------------------
# X2 — DMS → signed decimal degrees.
# Reference: utils/parse.py:43-69 (dms2dd). If the string contains any of
# ° ' ": split on [°'"]+; 4 parts = D°M'S"dir, 3 parts = D°M'dir;
# S/W negate; malformed numerics → 0. Otherwise pass through.
# Output is DoubleType: the passthrough branch is try_cast'd (the
# reference leaves the string and lets a later float() throw; we null).
# ---------------------------------------------------------------------------


def dms2dd(col: Column) -> Column:
    s = col.cast("string")
    has_dms = s.rlike("[°'\"]")
    parts = F.split(s, "[°'\"]+")
    n = F.size(parts)
    deg = parts[0].try_cast("double")
    mins = parts[1].try_cast("double")
    secs = parts[2].try_cast("double")
    dir4 = parts[3]
    dir3 = parts[2]
    dd4 = deg + mins / 60 + secs / 3600
    dd3 = deg + mins / 60
    return (
        F.when(
            has_dms & (n == 4),
            F.when(dd4.isNull(), F.lit(0.0)).otherwise(
                F.when(dir4.isin("S", "W"), -dd4).otherwise(dd4)
            ),
        )
        .when(
            has_dms & (n == 3),
            F.when(dd3.isNull(), F.lit(0.0)).otherwise(
                F.when(dir3.isin("S", "W"), -dd3).otherwise(dd3)
            ),
        )
        .when(has_dms, F.lit(None).cast("double"))  # ref: falls through → None
        .otherwise(s.try_cast("double"))
    )


# ---------------------------------------------------------------------------
# X3 — date normalization with passthrough.
# Reference: utils/parse.py:72-83 (check_date). "y1,y2" → "y1/y2";
# "M/D/Y" → "Y-MM-DD" (zero-padded); anything else passes through
# verbatim (NCBI wants text; this is NOT to_date).
# ---------------------------------------------------------------------------


def check_date(col: Column) -> Column:
    s = col.cast("string")
    comma = F.split(s, ",")
    slash = F.split(s, "/")
    return (
        F.when(F.size(comma) == 2, F.concat_ws("/", comma[0], comma[1]))
        .when(
            F.size(slash) == 3,
            F.concat_ws(
                "-", slash[2], F.lpad(slash[0], 2, "0"), F.lpad(slash[1], 2, "0")
            ),
        )
        .otherwise(col)
    )


# ---------------------------------------------------------------------------
# X4 — coordinate sign normalization: latitude ≥ 0, longitude ≤ 0,
# exact zero preserved. Reference: utils/parse.py:86-105.
# ---------------------------------------------------------------------------


def check_lat(col: Column) -> Column:
    d = col.cast("string").try_cast("double")
    return F.when(d == 0.0, 0.0).otherwise(F.abs(d))


def check_long(col: Column) -> Column:
    d = col.cast("string").try_cast("double")
    return F.when(d == 0.0, 0.0).otherwise(-F.abs(d))


# ---------------------------------------------------------------------------
# X5 — identifier cleaning: '.' and ' ' → '_'.
# Reference: utils/parse.py:275-279,286-289; also applied to the NCBI
# side before the accession join (update_metadata.py:144-147).
# ---------------------------------------------------------------------------


def clean_name(col: Column) -> Column:
    return F.translate(col.cast("string"), ". ", "__")


# ---------------------------------------------------------------------------
# X6 — sentinel scrubbing → NULL.
# Reference: utils/parse.py:250-254 ("Not determined…"→NaN),
# utils/gsheets.py:21-23 (whitespace-only→NaN), update_reads.py:190-193
# (""/"NaN" pulled out of arrays).
# ---------------------------------------------------------------------------

_DEFAULT_SENTINELS = ("", "nan", "na", "none", "missing", "not provided")


def scrub_sentinels(col: Column) -> Column:
    s = col.cast("string")
    return (
        F.when(s.rlike("^Not determined"), F.lit(None))
        .when(s.rlike(r"^\s*$"), F.lit(None))
        .when(F.lower(s).isin(*_DEFAULT_SENTINELS), F.lit(None))
        .otherwise(s)
    )


def scrub_array(col: Column) -> Column:
    """Remove ""/"NaN" pollution from an array column (update_reads.py:190-193)."""
    return F.filter(col, lambda x: (x != "") & (F.lower(x) != "nan"))


# ---------------------------------------------------------------------------
# X8 — default imputation: ""/null → literal default.
# Reference: create_sheets_ultimate.py:324-329,369-385.
# ---------------------------------------------------------------------------


def impute_default(col: Column, default: str) -> Column:
    return F.coalesce(F.nullif(col.cast("string"), F.lit("")), F.lit(default))


# ---------------------------------------------------------------------------
# X12 — Levenshtein similarity ratio (0-100), the engine's stand-in for
# fuzz.ratio. Reference: update_reads.py:176-179.
# ---------------------------------------------------------------------------


def fuzzy_ratio(a: Column, b: Column) -> Column:
    total = F.length(a) + F.length(b)
    return 100.0 * (total - F.levenshtein(a, b)) / total
