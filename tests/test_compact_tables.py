"""OPTIMIZE (small-file compaction) on the MERGE table layer: data
identity, file-count reduction, no-op guard, partition pruning."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.operators.merge import (
    ParquetTable,
    PartitionedParquetTable,
)


def _rows(t):
    return sorted(tuple(r) for r in t.read().collect())


def test_base_table_compact_identity(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    t = ParquetTable(spark, str(tmp_path / "t"), "k")
    t.init(df.repartition(12))
    assert len(t.data_files()) == 12
    before = _rows(t)
    stats = t.compact(target_bytes=1 << 30)
    assert stats["rewritten"] and stats["n_files_after"] == 1
    assert _rows(t) == before
    # second run is a no-op
    assert t.compact(target_bytes=1 << 30)["rewritten"] is False


def test_partitioned_compact_touches_only_fragmented_leaves(
    spark, tmp_path
):
    df = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(300)],
        "k long, p long, payload string",
    )
    t = PartitionedParquetTable(
        spark, str(tmp_path / "pt"), ["k", "p"], partition_by="p",
        partition_type="bigint",
    )
    t.init(df.repartition(8))
    files_before = {
        leaf: n
        for leaf, n in _leaf_counts(str(tmp_path / "pt")).items()
    }
    assert all(n > 1 for n in files_before.values())
    before = _rows(t)
    stats = t.compact(target_bytes=1 << 30)
    assert stats["rewritten"] and stats["n_leaves_touched"] == 3
    after = _leaf_counts(str(tmp_path / "pt"))
    assert all(n == 1 for n in after.values())
    assert _rows(t) == before
    # already-compact leaves: second run touches nothing
    assert t.compact(target_bytes=1 << 30) == {
        "rewritten": False, "n_leaves_touched": 0,
    }


def test_partitioned_compact_skips_oversize_leaves(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i % 2, "x" * 50) for i in range(200)],
        "k long, p long, payload string",
    )
    t = PartitionedParquetTable(
        spark, str(tmp_path / "pt2"), ["k", "p"], partition_by="p",
        partition_type="bigint",
    )
    t.init(df.repartition(6))
    # target below any leaf's combined bytes → nothing qualifies
    assert t.compact(target_bytes=10) == {
        "rewritten": False, "n_leaves_touched": 0,
    }
    assert all(n > 1 for n in _leaf_counts(str(tmp_path / "pt2")).values())


def _leaf_counts(path: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for dirpath, _dirs, files in os.walk(path):
        n = sum(1 for f in files if f.endswith(".parquet"))
        if n and "=" in os.path.basename(dirpath):
            out[os.path.basename(dirpath)] = n
    return out
