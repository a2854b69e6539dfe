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


def test_partitioned_compact_escaped_partition_values(spark, tmp_path):
    """Partition values Spark %-escapes in directory names (space,
    colon, '=', '%') must survive compact with zero row loss — the
    touched-leaf re-select goes through UNESCAPED values, not raw
    directory strings (regression: raw-dirname filter matched zero
    rows and the swap deleted the live leaf)."""
    vals = ["plain", "a b", "x:y", "p=q", "100%", "semi;colon"]
    df = spark.createDataFrame(
        [(i, vals[i % len(vals)], f"v{i}") for i in range(120)],
        "k long, p string, payload string",
    )
    t = PartitionedParquetTable(
        spark, str(tmp_path / "esc"), ["k", "p"], partition_by="p",
        partition_type="string",
    )
    t.init(df.repartition(6))
    before = _rows(t)
    assert len(before) == 120
    stats = t.compact(target_bytes=1 << 30)
    assert stats["rewritten"] and stats["n_leaves_touched"] == len(vals)
    assert _rows(t) == before
    assert all(
        n == 1 for n in _leaf_counts(str(tmp_path / "esc")).values()
    )


def test_partitioned_compact_null_partition_value(spark, tmp_path):
    """NULL partition values land in __HIVE_DEFAULT_PARTITION__; compact
    must re-select them via isNull, not a string compare against the
    sentinel directory name."""
    df = spark.createDataFrame(
        [(i, None if i % 3 == 0 else f"g{i % 2}", i) for i in range(90)],
        "k long, p string, v long",
    )
    t = PartitionedParquetTable(
        spark, str(tmp_path / "nullp"), ["k", "p"], partition_by="p",
        partition_type="string",
    )
    t.init(df.repartition(5))
    before = _rows(t)
    stats = t.compact(target_bytes=1 << 30)
    assert stats["rewritten"] and stats["n_leaves_touched"] == 3
    assert _rows(t) == before


def test_partitioned_upsert_escaped_partition_leaf_swap(spark, tmp_path):
    """The merge-path leaf swap must also match escaped directory names:
    upserting into a 'x:y'-valued partition previously reconstructed a
    raw 'p=x:y' path that never matched Spark's escaped leaf."""
    t = PartitionedParquetTable(
        spark, str(tmp_path / "mesc"), ["k", "p"], partition_by="p",
        partition_type="string",
    )
    t.init(
        spark.createDataFrame(
            [(1, "x:y", "old"), (2, "a b", "keep"), (3, "plain", "keep")],
            "k long, p string, v string",
        )
    )
    t.upsert(
        spark.createDataFrame(
            [(1, "x:y", "new"), (9, "x:y", "ins")],
            "k long, p string, v string",
        )
    )
    got = {r["k"]: (r["p"], r["v"]) for r in t.read().collect()}
    assert got == {
        1: ("x:y", "new"),
        2: ("a b", "keep"),
        3: ("plain", "keep"),
        9: ("x:y", "ins"),
    }


def _leaf_counts(path: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for dirpath, _dirs, files in os.walk(path):
        n = sum(1 for f in files if f.endswith(".parquet"))
        if n and "=" in os.path.basename(dirpath):
            out[os.path.basename(dirpath)] = n
    return out
