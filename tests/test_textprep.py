"""Training-data prep operators: packing boundaries, chunk fan-out,
deterministic sampling, shuffle shape, decontamination skew guard,
PII scrub patterns.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.functions.text import scrub_pii
from ccgp_data_wrangling_spark.operators.textprep import (
    chunk_text,
    contamination_pairs,
    pack_sequences,
    sample_bucket,
    stratified_sample,
    train_order,
)


def test_pack_sequences_concat_chunk_boundaries(spark):
    # budget 10; docs of 4,4,4 tokens: third doc starts at cum_before=8
    # → assigned to pack 0, spilling 2 tokens past the 10-token boundary
    df = spark.createDataFrame(
        [("a", 1, 4), ("a", 2, 4), ("a", 3, 4), ("a", 4, 3), ("b", 1, 25)],
        "g string, ord int, n_tok int",
    )
    out = {
        (r.g, r.ord): (r.pack_id, r.spill)
        for r in pack_sequences(
            df, group_col="g", order_col="ord", token_col="n_tok", budget=10
        ).collect()
    }
    assert out[("a", 1)] == (0, 0)
    assert out[("a", 2)] == (0, 0)  # ends exactly at 8, fits pack 0
    assert out[("a", 3)] == (0, 2)  # starts at 8: 2 tokens spill to pack 1
    assert out[("a", 4)] == (1, 0)  # starts at 12 → pack 1, ends at 15 < 20
    assert out[("b", 1)] == (0, 15)  # 25-token doc spans packs 0-2


def test_pack_sequences_no_spill_inside_pack(spark):
    df = spark.createDataFrame([("a", 1, 3), ("a", 2, 3)], "g string, ord int, n_tok int")
    rows = pack_sequences(
        df, group_col="g", order_col="ord", token_col="n_tok", budget=10
    ).collect()
    assert all(r.spill == 0 and r.pack_id == 0 for r in rows)


def test_chunk_text_fanout_and_coverage(spark):
    df = spark.createDataFrame([(1, "x" * 350), (2, "y" * 10)], "id int, t string")
    chunks = chunk_text(df, "id", "t", size=200, stride=150).collect()
    by_id = {}
    for r in chunks:
        by_id.setdefault(r.id, []).append((r.chunk_id, r.chunk))
    # 350 chars: chunk 0 = [0:200), chunk 1 = [150:350) → 2 chunks
    assert sorted(c for c, _ in by_id[1]) == [0, 1]
    assert len(by_id[1][0][1]) == 200 and len(by_id[1][1][1]) == 200
    # short doc: single (short) chunk
    assert by_id[2] == [(0, "y" * 10)]


def test_stratified_sample_deterministic_and_rated(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(2000)], "k long, g string"
    )
    a = stratified_sample(df, "k", "g", {"en": 30}, default_pct=100)
    b = stratified_sample(df, "k", "g", {"en": 30}, default_pct=100)
    rows_a = {r.k for r in a.collect()}
    assert rows_a == {r.k for r in b.collect()}  # rerun == same rows
    en_kept = sum(1 for k in rows_a if k % 2 == 0)
    assert 200 < en_kept < 400  # ~30% of 1000
    assert sum(1 for k in rows_a if k % 2 == 1) == 1000  # de all kept


def test_sample_bucket_range(spark):
    df = spark.range(1000).select(sample_bucket(F.col("id")).alias("b"))
    mn, mx = df.agg(F.min("b"), F.max("b")).first()
    assert 0 <= mn and mx <= 99


def test_train_order_is_permutation_per_shard(spark):
    df = spark.range(500).withColumnRenamed("id", "k")
    out = train_order(df, "k", n_shards=4).collect()
    assert len(out) == 500
    assert {r.k for r in out} == set(range(500))
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(4))
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(len(positions)))  # dense 0..n-1


def test_contamination_pairs_and_skew_guard(spark):
    boiler = "lorem ipsum dolor sit amet consectetur"
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog " + boiler),
            (2, "completely different content with no overlap " + boiler),
            (3, "unrelated text entirely about something else here now"),
        ],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog indeed")],
        "doc_id int, text string",
    )
    hits = contamination_pairs(
        train, bench, "doc_id", "text", n=5, min_shared=2, max_gram_df=None
    ).collect()
    assert {(r.train_id, r.bench_id) for r in hits} == {(1, 100)}
    # skew guard: a gram in > max_gram_df training docs is dropped
    bench2 = spark.createDataFrame(
        [(101, boiler + " and some trailing words here")], "doc_id int, text string"
    )
    guarded = contamination_pairs(
        train, bench2, "doc_id", "text", n=5, min_shared=1, max_gram_df=1
    ).collect()
    assert guarded == []  # boilerplate grams (df=2 > 1) were pruned


def test_scrub_pii_patterns(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b-c_1@sub.example.org now"),
            (2, "call +1 415 555 0199 or 415-555-0199"),
            (3, "card 4111111111111111 but keep 1234 and year 2024"),
            (4, "clean text stays clean"),
        ],
        "id int, t string",
    )
    out = {r.id: r.s for r in df.select("id", scrub_pii(F.col("t")).alias("s")).collect()}
    assert out[1] == "mail [EMAIL] now"
    assert out[2] == "call [PHONE] or [PHONE]"
    assert out[3] == "card [NUM] but keep 1234 and year 2024"
    assert out[4] == "clean text stays clean"


def test_domain_mixture_exact_integer_factors(spark):
    # budget 600, weights a:2 b:1 → targets a=400, b=200.
    # a has 100 tokens total → r=4.0 exactly (4 copies each, no
    # fractional draw); b has 200 → r=1.0 (1 copy each).
    from ccgp_data_wrangling_spark.operators.textprep import domain_mixture

    df = spark.createDataFrame(
        [(1, "a", 60), (2, "a", 40), (3, "b", 120), (4, "b", 80)],
        "doc_id long, source string, n_tok long",
    )
    out = domain_mixture(df, {"a": 2.0, "b": 1.0}, 600)
    got = {
        (r.doc_id, r.copy_idx) for r in out.collect()
    }
    assert got == {(1, 1), (1, 2), (1, 3), (1, 4),
                   (2, 1), (2, 2), (2, 3), (2, 4),
                   (3, 1), (4, 1)}


def test_domain_mixture_hits_token_budget(spark):
    # fractional factors: realized token mass per source lands within
    # one max-doc of its target share
    from ccgp_data_wrangling_spark.operators.textprep import domain_mixture

    rows = [(i, "a" if i % 3 else "b", 50 + (i * 37) % 100) for i in range(1, 401)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    budget = 30_000
    out = domain_mixture(df, {"a": 3.0, "b": 1.0}, budget)
    realized = {
        r.source: r.tok
        for r in out.join(df, ["doc_id", "source"])
        .groupBy("source")
        .agg(F.sum("n_tok").alias("tok"))
        .collect()
    }
    assert abs(realized["a"] - budget * 0.75) < 2500  # hash-draw noise band
    assert abs(realized["b"] - budget * 0.25) < 2500


def test_domain_mixture_drops_unweighted_groups(spark):
    from ccgp_data_wrangling_spark.operators.textprep import domain_mixture

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "zz", 10)], "doc_id long, source string, n_tok long"
    )
    out = domain_mixture(df, {"a": 1.0}, 10)
    assert {r.source for r in out.collect()} == {"a"}


def test_length_bucket_summary_quartiles(spark):
    from ccgp_data_wrangling_spark.operators.textprep import length_bucket_summary

    # 1..8 tokens: quartile bounds 2.75/4.5/6.25 → buckets of 2 each
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(1, 9)], "doc_id long, n_tok long"
    )
    df = df.withColumn("n_tok", F.col("n_tok") / 10)
    out = {r.bucket: r for r in length_bucket_summary(df, n_buckets=4).collect()}
    assert {b: out[b].n_docs for b in sorted(out)} == {1: 2, 2: 2, 3: 2, 4: 2}
    assert out[4].max_tok == 8
    # waste: bucket 4 holds 7,8 → padded 16, sum 15
    assert abs(out[4].waste_ratio - round(1 / 16, 4)) < 1e-9


def test_length_bucket_rejects_single_bucket(spark):
    import pytest

    from ccgp_data_wrangling_spark.operators.textprep import length_bucket_summary

    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tok long")
    with pytest.raises(ValueError):
        length_bucket_summary(df, n_buckets=1)


# ---------------------------------------------------------------------------
# quantile_bucket_sample
# ---------------------------------------------------------------------------


def test_quantile_bucket_sample_rates(spark):
    from ccgp_data_wrangling_spark.operators.textprep import (
        quantile_bucket_sample,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 401)], "doc_id long, score double"
    )
    out = quantile_bucket_sample(df, "score", [0, 100, 100, 0]).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["kept"])
    assert set(by_bucket) == {1, 2, 3, 4}
    # 0% buckets keep nothing, 100% buckets keep everything
    assert not any(by_bucket[1]) and not any(by_bucket[4])
    assert all(by_bucket[2]) and all(by_bucket[3])
    # equi-probability quartiles over 400 distinct scores
    assert all(len(v) == 100 for v in by_bucket.values())


def test_quantile_bucket_sample_growth_stable(spark):
    """A surviving doc's fate never flips when the corpus grows —
    the property that keeps incremental re-mixes consistent."""
    from ccgp_data_wrangling_spark.operators.textprep import (
        quantile_bucket_sample,
    )

    small = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(200)], "doc_id long, score double"
    )
    # grow with rows whose scores straddle the old range: cutpoints
    # move, buckets may shift, but kept-ness per (bucket, key) is a
    # pure hash — verify the keep decision is the md5 rule everywhere
    out = {
        r["doc_id"]: (r["bucket"], r["kept"])
        for r in quantile_bucket_sample(
            small, "score", [30, 60, 90, 100]
        ).collect()
    }
    from ccgp_data_wrangling_spark.operators.sketches import _element_hash
    from pyspark.sql import functions as F

    expect = {
        r["doc_id"]: r["h"] % 100
        for r in small.select(
            "doc_id", _element_hash(F.col("doc_id")).alias("h")
        ).collect()
    }
    rates = {1: 30, 2: 60, 3: 90, 4: 100}
    for doc, (bucket, kept) in out.items():
        assert kept == (expect[doc] < rates[bucket])
