"""The reads-sync pipeline — reference ``update_reads.py:375-379``
(§3.1), as one Spark job chain instead of driver loops:

1. S3 listing → insert-only MERGE into ``reads`` (M2 — never
   overwrites, update_reads.py:19,44-56).
2. Linkage J1 (tiered substring via candidate-span equi-join) + J2
   conflict resolution + A5 per-sample aggregation.
3. ``samples`` MERGE: ``files`` array-union + filesize_sum/received
   $set (M3, update_reads.py:255-272) — scrubbing ""/"NaN" pollution
   from existing arrays on the way (X6, update_reads.py:190-193).
4. ``reads`` update: ``orphan = false`` + backfill ``sample_name`` on
   matched files (M5, update_reads.py:277-284).

Idempotent end-to-end: re-running with the same listing is a no-op
(tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.functions.cleaning import scrub_array
from ccgp_data_wrangling_spark.operators.linkage import (
    linkage_pairs,
    resolve_conflicts,
)
from ccgp_data_wrangling_spark.operators.merge import ParquetTable


def run_update_reads(
    listing: DataFrame,
    reads_tbl: ParquetTable,
    samples_tbl: ParquetTable,
    *,
    project_filter: str | None = None,
) -> dict[str, int]:
    """Run the full sync; returns row-count stats for observability."""
    # 1 — discovery (M2 insert-only; listing keys become read rows)
    discovered = listing.select(
        F.col("key").alias("file_name"),
        F.col("size").alias("filesize"),
        F.col("last_modified").alias("mdate"),
    )
    reads_tbl.insert_only(discovered)

    # 2 — linkage (J1) + conflicts (J2)
    samples = samples_tbl.read()
    if project_filter:
        samples = samples.where(F.col("ccgp_project_id") == project_filter)
    # localCheckpoint truncates lineage: the MERGEs below atomically
    # swap the table directories the linkage plan reads from, so the
    # pair set must be materialized before the first rewrite
    pairs = resolve_conflicts(
        linkage_pairs(samples, reads_tbl.read())
    ).localCheckpoint(eager=True)
    linked = pairs.groupBy("sample_name").agg(
        F.array_sort(F.collect_list("file_name")).alias("files"),
        F.sum("filesize").alias("filesize_sum"),
        F.min("mdate").alias("received"),
    )
    n_linked = linked.count()

    # 3 — samples MERGE (M3): array-union files, set sums; scrub the
    # existing array's ""/"NaN" pollution within the same rewrite
    samples_tbl.array_union_set(
        linked.select("sample_name", "files", "filesize_sum", "received"),
        "files",
        set_exprs={
            "filesize_sum": F.col("s.filesize_sum"),
            "received": F.col("s.received"),
        },
        target_array_prep=scrub_array,
    )

    # 4 — reads update (M5): orphan=false + owning sample
    matched_files = pairs.select(
        "file_name", F.col("sample_name").alias("__owner")
    )
    reads_tbl.update_where_in(
        matched_files,
        {
            "orphan": F.lit(False),
            "sample_name": F.col("s.__owner"),
        },
    )
    orphans = reads_tbl.read().where(
        F.col("orphan").isNull() | F.col("orphan")
    )
    return {
        "discovered": discovered.count(),
        "samples_linked": n_linked,
        "files_matched": matched_files.count(),
        "orphans": orphans.count(),
    }
