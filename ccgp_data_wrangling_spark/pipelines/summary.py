"""The dashboard summary — reference ``utils/parse.py:294-340``
(``get_summary_df``, A1) feeding ``update_gsheet.py``: one row per
project with sample counts, linked-file coverage, terabyte sums, the
dominant project type, and the missing-sample list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def project_summary(
    samples: DataFrame, expected: DataFrame | None = None
) -> DataFrame:
    """A1: per-project dashboard row.

    ``expected`` (project_id, expected_n) is the ExpectedWGS dimension
    (broadcast); % done = samples-with-files / expected when present,
    else vs the sample count. Sorted by pct_done desc (R5,
    utils/parse.py:338).
    """
    has_files = F.col("files").isNotNull() & (F.size("files") > 0)
    agg = samples.groupBy("ccgp_project_id").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum(has_files.cast("int")).alias("n_with_files"),
        F.round(F.sum(F.coalesce(F.col("filesize_sum"), F.lit(0))) / 1e12, 4).alias(
            "filesize_tb"
        ),
        F.mode("project_type").alias("project_type"),
        F.array_sort(
            F.collect_list(F.when(~has_files, F.col("sample_name")))
        ).alias("samples_missing_files"),
    )
    if expected is not None:
        agg = agg.join(
            F.broadcast(
                expected.select(
                    F.col("project_id").alias("ccgp_project_id"), "expected_n"
                )
            ),
            "ccgp_project_id",
            "left",
        )
    else:
        agg = agg.withColumn("expected_n", F.lit(None).cast("long"))
    denom = F.coalesce(F.col("expected_n"), F.col("n_samples"))
    return agg.withColumn(
        "pct_done",
        F.round(100.0 * F.col("n_with_files") / denom, 2),
    ).orderBy(F.desc("pct_done"), "ccgp_project_id")
