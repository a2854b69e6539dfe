"""JSONL source/sink: explicit-schema reads, corrupt-record
quarantine, shard layout, bounded inference; plus the ORC round trip
(partition pruning proven on the plan)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.sources.jsonl import (
    infer_jsonl_schema,
    read_jsonl,
    write_jsonl,
)


def test_jsonl_roundtrip_types_and_shards(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 2.5, True), (2, "b", -0.5, False), (3, None, 0.0, True)],
        "id bigint, s string, x double, flag boolean",
    )
    path = str(tmp_path / "shards")
    write_jsonl(df, path, compression="gzip", shards=2)
    files = [f for f in os.listdir(path) if f.endswith(".json.gz")]
    assert len(files) == 2  # one shard file per partition
    back = read_jsonl(
        spark, path, "id bigint, s string, x double, flag boolean",
        mode="FAILFAST",
    )
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_jsonl_corrupt_quarantine_and_failfast(spark, tmp_path):
    path = str(tmp_path / "bad")
    spark.createDataFrame(
        [('{"id": 1, "s": "ok"}',), ('{"id": 2, "s": ',), ("not json",)],
        "value string",
    ).coalesce(1).write.text(path)
    back = read_jsonl(
        spark, path, "id bigint, s string", keep_corrupt=True
    ).collect()
    good = [r for r in back if r._corrupt_record is None]
    bad = [r for r in back if r._corrupt_record is not None]
    assert [(r.id, r.s) for r in good] == [(1, "ok")]
    # corrupt rows keep the raw line and null out parsed columns
    assert sorted(r._corrupt_record for r in bad) == [
        "not json",
        '{"id": 2, "s": ',
    ]
    assert all(r.id is None for r in bad)
    with pytest.raises(Exception, match="Malformed|FAILFAST"):
        read_jsonl(spark, path, "id bigint, s string",
                   mode="FAILFAST").collect()


def test_jsonl_schema_inference_is_bounded(spark, tmp_path):
    df = spark.range(10).select(
        F.col("id"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    path = str(tmp_path / "probe")
    write_jsonl(df, path, compression=None, shards=3)
    ddl = infer_jsonl_schema(spark, path, sample_files=2)
    assert ddl == "id bigint, name string"
    # the DDL round-trips into an explicit-schema read
    assert read_jsonl(spark, path, ddl, mode="FAILFAST").count() == 10


def test_jsonl_schema_inference_sees_nested_partition_dirs(
    spark, tmp_path
):
    # Spark writers nest k=v partition subdirectories; enumeration now
    # goes through the Hadoop FileSystem recursively (r6 advice), so a
    # partitioned layout and an explicit file:// URI both work.
    df = spark.createDataFrame(
        [(1, "A", "x"), (2, "B", "y")], "id bigint, part string, s string"
    )
    path = str(tmp_path / "nested")
    df.write.mode("overwrite").partitionBy("part").json(path)
    ddl = infer_jsonl_schema(spark, "file://" + path)
    assert ddl == "id bigint, s string"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no shard files"):
        infer_jsonl_schema(spark, str(tmp_path / "missing"))


def test_jsonl_hidden_filter_applies_below_base_only(spark, tmp_path):
    """A corpus rooted under a dot/underscore-named directory (e.g.
    ~/.cache/data, /data/_staging/corpus) must list its shards — the
    hidden/metadata filter applies only to components BELOW the listed
    base path (r7 advice), while _SUCCESS/dotfiles inside are still
    skipped."""
    base = tmp_path / ".cache" / "_staging" / "corpus"
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, s string")
    df.coalesce(1).write.mode("overwrite").json(str(base))
    # _SUCCESS exists inside; shards must still be found
    ddl = infer_jsonl_schema(spark, str(base))
    assert ddl == "id bigint, s string"
    from ccgp_data_wrangling_spark.sources.jsonl import _list_shard_files

    files = _list_shard_files(spark, str(base))
    assert files and all("_SUCCESS" not in f for f in files)
    assert all(".crc" not in f for f in files)


def test_orc_partition_pruning_plan(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, "A", 30.0), (4, "C", 5.0)],
        "k bigint, part string, v double",
    )
    path = str(tmp_path / "orc")
    df.write.mode("overwrite").partitionBy("part").orc(path)
    back = spark.read.orc(path).where(F.col("part") == "A")
    assert sorted(r.k for r in back.collect()) == [1, 3]
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the partition filter must prune at the scan, not post-filter
    assert "PartitionFilters" in plan and "isnotnull(part" in plan
