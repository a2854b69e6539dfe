"""Sources (S3/S4/S5/S8) and sinks (K1/K3/K5/K6) round-trips."""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.sources import (
    lookup_csv_dim,
    read_delimited,
    read_submitted_sheet,
    s3_listing_frame,
    sniff_header_row,
)
from ccgp_data_wrangling_spark.sources.sinks import (
    export_rows,
    write_single_tsv,
    write_text_report,
)


def test_s3_listing_frame(spark):
    df = s3_listing_frame(
        spark,
        [
            ("proj/a_R1.fastq.gz", 100, datetime(2023, 1, 1)),
            ("proj/a_R2.fastq.gz", 120, datetime(2023, 1, 2)),
        ],
    )
    assert df.columns == ["key", "size", "last_modified"]
    assert df.count() == 2
    assert df.where("size > 100").count() == 1


def test_header_sniff_and_submitted_sheet(spark, tmp_path):
    p = tmp_path / "submitted.tsv"
    p.write_text(
        "CCGP submission form\n"
        "please fill every column\t\n"
        "*sample_name\tlat\tlong\n"
        "HYLA_01\t38.1\t-120.2\n"
        "HYLA_02\t39.0\t-121.5\n"
    )
    assert sniff_header_row(str(p)) == 2
    df = read_submitted_sheet(spark, str(p))
    assert df.columns == ["*sample_name", "lat", "long"]
    assert df.count() == 2
    names = {r["*sample_name"] for r in df.collect()}
    assert names == {"HYLA_01", "HYLA_02"}


def test_header_sniff_missing_marker(tmp_path):
    p = tmp_path / "bad.tsv"
    p.write_text("a\tb\n1\t2\n")
    with pytest.raises(ValueError, match="could not find header"):
        sniff_header_row(str(p))


def test_read_delimited_plain(spark, tmp_path):
    p = tmp_path / "plain.tsv"
    p.write_text("x\ty\n1\t2\n3\t4\n")
    df = read_delimited(spark, str(p))
    assert df.columns == ["x", "y"]
    assert df.count() == 2


def test_lookup_csv_dim_broadcast_join(spark, tmp_path):
    p = tmp_path / "dim.csv"
    p.write_text("species,project\nHyla regilla,12-Hyla\nRana draytonii,7-Rana\n")
    dim = lookup_csv_dim(spark, str(p))
    facts = spark.createDataFrame(
        [("Hyla regilla",), ("Unknown sp",)], ["species"]
    )
    out = facts.join(dim, "species", "left").collect()
    by_sp = {r.species: r.project for r in out}
    assert by_sp == {"Hyla regilla": "12-Hyla", "Unknown sp": None}
    plan = facts.join(dim, "species", "left")._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_write_single_tsv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    out = tmp_path / "out.tsv"
    write_single_tsv(df, str(out))
    lines = out.read_text().strip().split("\n")
    assert lines[0] == "k\tv"
    assert sorted(lines[1:]) == ["1\ta", "2\tb"]


def test_write_text_report(spark, tmp_path):
    df = spark.createDataFrame([("line one",), ("line two",)], ["value"])
    out = tmp_path / "report.txt"
    write_text_report(df, str(out))
    assert sorted(out.read_text().strip().split("\n")) == ["line one", "line two"]


def test_export_rows_pushes_and_guards(spark):
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    captured = {}

    def push(cols, rows):
        captured["cols"], captured["rows"] = cols, rows

    n = export_rows(df, push)
    assert n == 1
    assert captured["cols"] == ["k", "v"]
    assert captured["rows"] == [[1, "a"]]

    big = spark.range(30).select("id")
    with pytest.raises(ValueError, match="refuses"):
        export_rows(big, push, max_rows=10)


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketed-by-key tables join without an Exchange (co-location)."""
    import contextlib
    import io

    from ccgp_data_wrangling_spark.sources.sinks import write_bucketed_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("a")
        )
        right = spark.range(500).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("b")
        )
        write_bucketed_table(left, "bk_left", ["k"], 4)
        write_bucketed_table(right, "bk_right", ["k"], 4)
        joined = spark.table("bk_left").join(spark.table("bk_right"), "k")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain()
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert joined.count() == 500
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """A dim-side filter prunes fact PARTITIONS at runtime (DPP):
    the fact scan must carry a dynamicpruning subquery filter, so at
    100 TB only the matching partition directories are read."""
    from pyspark.sql import functions as F

    fact = spark.range(10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).cast("int").alias("part"),
        (F.col("id") * 2.0).alias("v"),
    )
    fact.write.mode("overwrite").partitionBy("part").parquet(
        str(tmp_path / "fact")
    )
    dim = spark.createDataFrame(
        [(3, "keep"), (7, "keep")], "part int, tag string"
    )
    f = spark.read.parquet(str(tmp_path / "fact"))
    joined = f.join(dim.where(F.col("tag") == "keep"), "part").agg(
        F.sum("v").alias("s")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    # and the answer is right
    got = joined.collect()[0]["s"]
    want = sum(i * 2.0 for i in range(10_000) if i % 10 in (3, 7))
    assert got == want
