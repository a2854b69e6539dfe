"""Compaction maintenance op (operators/compaction.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ccgp_data_wrangling_spark.operators.compaction import (
    compact_parquet_table,
    table_file_stats,
)


def _fragmented_table(spark, path, n_appends=30, rows_per=200):
    for j in range(n_appends):
        spark.range(j * rows_per, (j + 1) * rows_per).select(
            F.col("id"), (F.col("id") % 97).alias("k")
        ).coalesce(1).write.mode("append").parquet(path)


def test_compaction_reduces_files_keeps_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    _fragmented_table(spark, path)
    before_rows = sorted(
        map(tuple, spark.read.parquet(path).collect())
    )
    assert table_file_stats(path)["n_files"] == 30

    stats = compact_parquet_table(
        spark, path, target_bytes_per_file=64 * 1024
    )
    assert stats["after"]["n_files"] < stats["before"]["n_files"]
    assert (
        sorted(map(tuple, spark.read.parquet(path).collect())) == before_rows
    )


def test_compaction_with_sort_key_restores_pruning(spark, tmp_path):
    """After a keyed compaction each file covers a disjoint id range,
    so footer min/max prune point lookups to one file."""
    import pathlib

    import pyarrow.parquet as pq

    path = str(tmp_path / "t")
    _fragmented_table(spark, path)  # every append spans its own range
    compact_parquet_table(
        spark, path, target_bytes_per_file=16 * 1024, sort_key="id"
    )
    spans = []
    for f in pathlib.Path(path).glob("*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo = min(
            md.row_group(i).column(0).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(0).statistics.max
            for i in range(md.num_row_groups)
        )
        spans.append((lo, hi))
    assert len(spans) > 1
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2  # disjoint ranges — a point lookup reads 1 file


def test_compaction_single_file_floor(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(10).coalesce(1).write.parquet(path)
    stats = compact_parquet_table(spark, path)
    assert stats["after"]["n_files"] == 1
    assert spark.read.parquet(path).count() == 10
