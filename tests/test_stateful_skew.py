"""applyInPandasWithState operators + skew-safe aggregation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.operators.skew import salted_aggregate
from ccgp_data_wrangling_spark.streaming.stateful import (
    running_totals,
    seen_key_filter,
)


def test_running_totals_accumulates_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.csv").write_text("user_id,amount\n1,10.0\n1,5.0\n2,1.0\n")
    stream = (
        spark.readStream.schema("user_id long, amount double")
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    got: dict[tuple, tuple] = {}

    def sink(b, epoch):
        for r in b.collect():
            got[(epoch, r.user_id)] = (r.n_events, r.amount_sum)

    q = (
        running_totals(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert got[(0, 1)] == (2, 15.0)
    assert got[(0, 2)] == (1, 1.0)

    # second batch: state carries over from the checkpoint
    (src / "b2.csv").write_text("user_id,amount\n1,2.5\n3,7.0\n")
    stream2 = (
        spark.readStream.schema("user_id long, amount double")
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    q2 = (
        running_totals(stream2)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert got[(1, 1)] == (3, 17.5)  # cumulative across batches
    assert got[(1, 3)] == (1, 7.0)
    assert (1, 2) not in got  # user 2 absent from batch 2 → no emit


def test_seen_key_filter_dedups_stream(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.csv").write_text("k,ts\na,2023-01-01T00:00:00\nb,2023-01-01T01:00:00\n")
    (src / "b2.csv").write_text("k,ts\na,2023-01-02T00:00:00\nc,2023-01-03T00:00:00\n")
    stream = (
        spark.readStream.schema("k string, ts timestamp")
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    rows = []

    def sink(b, _):
        rows.extend(b.collect())

    q = (
        seen_key_filter(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    seen = sorted(r.k for r in rows)
    # 'a' appears in both batches but is emitted exactly once
    assert seen == ["a", "b", "c"]


def test_salted_aggregate_matches_plain_groupby(spark):
    # heavy-hitter key: 90% of rows share one key
    df = spark.range(2000).select(
        F.when(F.col("id") % 10 != 0, "hot").otherwise(
            F.concat(F.lit("k"), (F.col("id") % 7).cast("string"))
        ).alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    salted = salted_aggregate(
        df,
        ["k"],
        {"c": F.count(F.lit(1)), "s": F.sum("v"), "m": F.max("v")},
        {"c": F.sum("c"), "s": F.sum("s"), "m": F.max("m")},
    )
    plain = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("c"), F.sum("v").alias("s"), F.max("v").alias("m")
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_matches_plain_join(spark):
    from ccgp_data_wrangling_spark.operators.skew import salted_join

    # heavy-hitter key "hot": 5000 of 5200 fact rows
    fact = spark.range(5200).select(
        F.when(F.col("id") < 5000, "hot")
        .otherwise(F.concat(F.lit("k"), F.col("id") % 40))
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.createDataFrame(
        [("hot", 1), ("k1", 2), ("k3", 3)], "k string, tag int"
    )
    got = salted_join(fact, dim, ["k"], n_salts=8)
    want = fact.join(dim, "k")
    assert got.count() == want.count()
    assert (
        got.groupBy("k").count().orderBy("k").collect()
        == want.groupBy("k").count().orderBy("k").collect()
    )


def test_salted_left_join_keeps_unmatched_once(spark):
    from ccgp_data_wrangling_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [("a", 1), ("b", 2), ("b", 3)], "k string, v int"
    )
    dim = spark.createDataFrame([("a", 10)], "k string, tag int")
    got = sorted(
        (r.k, r.v, r.tag) for r in salted_join(fact, dim, ["k"], how="left").collect()
    )
    assert got == [("a", 1, 10), ("b", 2, None), ("b", 3, None)]


def test_salted_join_rejects_right_join(spark):
    from ccgp_data_wrangling_spark.operators.skew import salted_join

    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="inner|left"):
        salted_join(df, df, ["k"], how="right")
