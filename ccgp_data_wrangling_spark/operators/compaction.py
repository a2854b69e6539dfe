"""Small-file compaction planning — the table-maintenance operator a
100 TB lakehouse runs nightly: streaming ingest and per-partition
MERGE output leave thousands of KB-scale files per partition, and
every downstream scan then pays a task per file. The planner turns a
file listing into merge groups of ~``target_bytes`` each; an executor
then rewrites each group as one file.

Policy: CUMULATIVE-QUANTILE BINNING — order files deterministically
within a partition (path ASC), running byte total, group =
``floor(exclusive_cumsum / target_bytes)``. One window sum, no
driver-side loop, replayable verbatim in SQL. Groups can overshoot
``target_bytes`` by at most one file (the classic greedy-reset
packer's property too), and a partition already consisting of one
big file lands alone in group 0 where ``skip_single`` drops it — a
no-op rewrite is pure write amplification.

Scale shape: the input is a FILE LISTING (one row per file — at
100 TB with 256 MB files that's ~400k rows, trivially small next to
the data); the only shuffle is the per-partition window. The
expensive part — the rewrite — is the caller's `spark.read…`.`write`
per group, embarrassingly parallel across groups.

Reference parity: cademirch/ccgp-data-wrangling manages no file
layout; beyond-reference lakehouse surface (same family as the
Z-order layout operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["plan_compaction", "compaction_summary"]


def plan_compaction(
    files: DataFrame,
    *,
    partition_col: str,
    path_col: str = "path",
    bytes_col: str = "bytes",
    target_bytes: int,
    skip_single: bool = True,
) -> DataFrame:
    """Assign every file to a merge group: (partition, path, bytes,
    group_id). ``skip_single`` removes groups that contain exactly
    one file (rewriting a lone file is pure write amplification —
    keep it where it is)."""
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    w = (
        Window.partitionBy(partition_col)
        .orderBy(path_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = files.select(
        F.col(partition_col).alias("partition"),
        F.col(path_col).alias("path"),
        F.col(bytes_col).alias("bytes"),
        F.floor(
            F.coalesce(F.sum(bytes_col).over(w), F.lit(0))
            / F.lit(target_bytes)
        )
        .cast("long")
        .alias("group_id"),
    )
    if skip_single:
        gw = Window.partitionBy("partition", "group_id")
        planned = (
            planned.withColumn("__n", F.count(F.lit(1)).over(gw))
            .where(F.col("__n") > 1)
            .drop("__n")
        )
    return planned


def compaction_summary(planned: DataFrame) -> DataFrame:
    """Per merge group: file count and total bytes — what the rewrite
    scheduler consumes (one rewrite task per row)."""
    return planned.groupBy("partition", "group_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_files"),
        F.sum("bytes").cast("long").alias("group_bytes"),
    )
