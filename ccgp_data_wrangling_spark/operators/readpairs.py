"""Read-pair assembly from per-sample file sets.

Two generations of semantics exist in the reference:

* **Modern** (create_sheets_ultimate.py:387-423): files sorted, paired
  adjacently — r1_adjacent_pairs in queries/relational.py.
* **Legacy** (create_sheets.py:22-64, this module): per-sample file
  sets are paired by PREFIX DERIVATION — every file contributes the
  prefix before its ``_R<digit>[._]`` read marker; each distinct
  prefix then claims the two files that best fuzzy-match it. The
  fuzzy step exists because a prefix can be a substring of another
  (``samp_a1`` vs ``samp_a1_L001``), so plain substring containment
  over-matches (reference comment at create_sheets.py:43-46).

Scoring: Levenshtein ratio ``100·(|a|+|b|-lev)/(|a|+|b|)`` (JVM
``levenshtein``), ties broken by file name ascending — deterministic,
and it selects the same top-2 as the reference's ``thefuzz``
``process.extract`` on well-formed read sets: the two files sharing
the prefix outscore every other lane/sample file.

Shape & scale: one explode to (sample, prefix) keys, one equi-join
back to the sample's files (fan-out bounded by files-per-sample), a
window over (sample, prefix) — all shuffle-partitioned by sample;
no cross join anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["legacy_prefix_pairs"]

_READ_MARKER = r"_R\d[._]"


def legacy_prefix_pairs(
    samples: DataFrame,
    sample_col: str = "sample_id",
    files_col: str = "files",
) -> DataFrame:
    """Pair reads per sample with the legacy prefix-derivation rules.

    ``samples``: one row per sample with an ``array<string>`` of file
    names. Output: (sample_col, library_id, filename, filename2), one
    row per derived pair:

    * exactly 2 files → that pair, sorted (create_sheets.py:28-33)
    * ≥ 4 files → one pair per distinct derived prefix: the top-2
      files by fuzzy score against the prefix (create_sheets.py:36-59)
    * 0, 1 or 3 files → dropped (no branch in the reference either)

    ``library_id`` = filename split on ``_R1``, first part
    (create_sheets.py:31).
    """
    base = samples.select(
        F.col(sample_col), F.array_distinct(files_col).alias("__files")
    ).withColumn("__n", F.size("__files"))

    lib = lambda c: F.split(c, "_R1").getItem(0)  # noqa: E731

    # exactly-2 branch: the sorted pair directly
    two = base.where(F.col("__n") == 2).select(
        sample_col,
        F.array_min("__files").alias("filename"),
        F.array_max("__files").alias("filename2"),
    )

    multi = base.where(F.col("__n") >= 4)
    files = multi.select(sample_col, F.explode("__files").alias("file_name"))
    prefixes = files.select(
        sample_col,
        F.split("file_name", _READ_MARKER).getItem(0).alias("__prefix"),
    ).distinct()

    # score every (prefix, file) pair WITHIN a sample: equi-join on the
    # sample key, fan-out = prefixes × files per sample (both small and
    # bounded by the sample's own read count)
    tot = F.length("__prefix") + F.length("file_name")
    scored = prefixes.join(files, sample_col).select(
        sample_col,
        "__prefix",
        "file_name",
        F.round(
            100.0 * (tot - F.levenshtein("__prefix", "file_name")) / tot, 3
        ).alias("__ratio"),
    )
    w = W.partitionBy(sample_col, "__prefix").orderBy(
        F.desc("__ratio"), F.asc("file_name")
    )
    top2 = scored.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= 2)
    pairs = top2.groupBy(sample_col, "__prefix").agg(
        F.max(F.when(F.col("__rn") == 1, F.col("file_name"))).alias("filename"),
        F.max(F.when(F.col("__rn") == 2, F.col("file_name"))).alias("filename2"),
    )

    return (
        two.unionByName(pairs.select(sample_col, "filename", "filename2"))
        .select(
            sample_col,
            lib(F.col("filename")).alias("library_id"),
            "filename",
            "filename2",
        )
    )
