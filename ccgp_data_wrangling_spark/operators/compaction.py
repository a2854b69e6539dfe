"""Small-file compaction for parquet tables.

Incremental sinks (streaming folds, per-batch appends, partitioned
MERGE) accumulate many small files; at 100 TB the failure mode is
concrete — every scan pays a task per file, the driver pays listing
and footer reads, and row-group statistics stop pruning because each
file is a sliver. Compaction is the standing maintenance op: rewrite
a table (or only its oversplit partitions) into files of a target
size, atomically.

Spark-first shape: ``repartitionByRange`` on the caller's sort key
(keeps min/max stats tight after the rewrite — compaction is the
natural moment to restore clustering, including a z-order key from
operators/zorder) or plain ``repartition`` when no key is given;
the swap reuses ParquetTable's copy-on-write tmp-write + rename, so
readers never observe a half-compacted table.
"""

from __future__ import annotations

import math
import pathlib

from pyspark.sql import Column, DataFrame, SparkSession

from ccgp_data_wrangling_spark.operators.merge import ParquetTable

__all__ = ["table_file_stats", "compact_parquet_table"]


def table_file_stats(path: str) -> dict:
    """Driver-side listing of a parquet dir: file count + byte sizes.
    Metadata-sized by definition (one stat per FILE, not per row)."""
    files = [
        p for p in pathlib.Path(path).glob("*.parquet") if p.is_file()
    ]
    sizes = [p.stat().st_size for p in files]
    return {
        "n_files": len(files),
        "total_bytes": sum(sizes),
        "max_bytes": max(sizes, default=0),
        "min_bytes": min(sizes, default=0),
    }


def compact_parquet_table(
    spark: SparkSession,
    path: str,
    *,
    target_bytes_per_file: int = 128 * 1024 * 1024,
    sort_key: Column | str | None = None,
) -> dict:
    """Rewrite ``path`` into ≈ ``total_bytes / target`` files.

    The file count comes from the CURRENT on-disk footprint (parquet
    stays parquet, so compression ratios carry over within a few
    percent); pass ``sort_key`` to range-partition + sort the rewrite
    so min/max pruning survives the compaction. Returns before/after
    stats so maintenance jobs can log their effect.
    """
    before = table_file_stats(path)
    n_files = max(1, math.ceil(before["total_bytes"] / target_bytes_per_file))
    df = spark.read.parquet(path)
    if sort_key is not None:
        out = df.repartitionByRange(n_files, sort_key).sortWithinPartitions(
            sort_key
        )
    else:
        out = df.repartition(n_files)
    ParquetTable(spark, path, key=[])._swap_in(out)
    after = table_file_stats(path)
    return {"before": before, "after": after, "target_files": n_files}
