"""Non-ASCII text through the text-operator families: correctness
and layout determinism for CJK (no spaces), emoji, combining marks,
and mixed-script corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.operators.cdc import cdc_segments
from ccgp_data_wrangling_spark.operators.dedup import minhash_neardup_pairs
from ccgp_data_wrangling_spark.operators.embed import hashed_embedding

_ROWS = [
    (1, "机器学习 数据 处理 管道 机器学习 数据 处理 管道 机器学习 数据"),
    (2, "机器学习 数据 处理 管道 机器学习 数据 处理 管道 机器学习 数据 zzq"),
    (3, "café résumé naïve café résumé naïve café résumé naïve déjà"),
    (4, "🚀 data 🚀 pipeline 🚀 rocket 🚀 emoji 🚀 tokens 🚀 here 🚀 ok"),
    (5, "plain ascii words that should never match the others at all"),
]


def test_minhash_unicode_pairs_and_determinism(spark):
    a = spark.createDataFrame(_ROWS, "doc_id long, text string")
    out = {
        (r["id_a"], r["id_b"])
        for r in minhash_neardup_pairs(
            a, "doc_id", "text", threshold=0.5, shingle_k=3
        ).collect()
    }
    assert (1, 2) in out  # CJK near-dups found
    assert all({p} & {3, 4, 5} == set() or p in ((1, 2),) for p in out)
    b = spark.createDataFrame(_ROWS, "doc_id long, text string").repartition(7)
    out2 = {
        (r["id_a"], r["id_b"])
        for r in minhash_neardup_pairs(
            b, "doc_id", "text", threshold=0.5, shingle_k=3
        ).collect()
    }
    assert out == out2


def test_hashed_embedding_unicode_exact(spark):
    df = spark.createDataFrame(_ROWS, "id long, text string")
    out = {r["id"]: r["vec"] for r in hashed_embedding(df, "text", ["id"], dim=32).collect()}
    # token multiplicities preserved for every script
    assert sum(out[1]) == 10 and sum(out[4]) == 14
    # identical CJK prefix → vectors differ by exactly the one extra token
    diff = [y - x for x, y in zip(out[1], out[2])]
    assert sum(diff) == 1 and all(d >= 0 for d in diff)


def test_cdc_segments_cover_multibyte_text(spark):
    df = spark.createDataFrame(_ROWS[:1], "id long, text string")
    segs = sorted(
        (r["seg_idx"], r["seg"])
        for r in cdc_segments(df, "id", "text", k=4, divisor=8).collect()
    )
    assert "".join(s for _, s in segs) == _ROWS[0][1]
