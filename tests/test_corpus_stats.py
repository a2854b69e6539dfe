"""Corpus-quality operators: n-gram repetition metrics, bigram-LM
cross entropy, TF-IDF ranking — hand-computed expectations on tiny
corpora.
"""

from __future__ import annotations

import math

from ccgp_data_wrangling_spark.operators.corpus_stats import (
    bigram_cross_entropy,
    repetition_stats,
    tfidf_top_terms,
    word_ngram_counts,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_ngram_counts_bigrams(spark):
    df = _docs(spark, [(1, "a b a b c")])
    got = {
        (r.doc_id, r.gram): r.cnt
        for r in word_ngram_counts(df, 2).collect()
    }
    assert got == {(1, "a b"): 2, (1, "b a"): 1, (1, "b c"): 1}


def test_repetition_stats_spam_flagged(spark):
    # "x y" repeated 5 times: top bigram "x y" count 5, len 3;
    # n_chars = 19; top_frac = 15/19 > 0.2 → dropped
    spam = "x y x y x y x y x y"
    # all-distinct bigrams, long enough that no single bigram covers
    # 20% of the characters
    clean = " ".join(f"word{i}" for i in range(12))
    df = _docs(spark, [(1, spam), (2, clean)])
    out = {r.doc_id: r for r in repetition_stats(df, n=2).collect()}
    assert out[1].top_gram == "x y"
    assert out[1].top_cnt == 5
    assert abs(out[1].top_frac - round(15 / 19, 4)) < 1e-9
    assert not out[1].keep
    assert out[2].top_cnt == 1
    assert out[2].keep


def test_repetition_stats_tie_breaks_smallest_gram(spark):
    # "b c" and "a b" both occur once... craft counts: "a b a b c d c d"
    # → "a b":2, "c d":2 tie on count → smallest gram "a b" wins
    df = _docs(spark, [(1, "a b a b c d c d")])
    row = repetition_stats(df, n=2).collect()[0]
    assert row.top_gram == "a b"


def test_bigram_cross_entropy_uniform_corpus(spark):
    # corpus = one doc "a b a b": bigrams ab(2), ba(1); ctx a:2 b:1;
    # V=2, k=0.5 → p(ab)=(2+.5)/(2+1)=5/6, p(ba)=(1+.5)/(1+1)=3/4
    df = _docs(spark, [(1, "a b a b")])
    row = bigram_cross_entropy(df).collect()[0]
    lp_ab = round(math.log2((2 + 0.5) / (2 + 0.5 * 2)), 6)
    lp_ba = round(math.log2((1 + 0.5) / (1 + 0.5 * 2)), 6)
    expected = round(-(2 * lp_ab + 1 * lp_ba) / 3, 4)
    assert row.n_bigrams == 3
    assert abs(row.bits_per_token - expected) < 1e-9


def test_bigram_cross_entropy_outlier_scores_higher(spark):
    # doc 3 uses bigrams seen nowhere else → higher bits/token than
    # docs drawn from the repeated majority pattern
    rows = [(i, "spark reads parquet fast") for i in range(1, 6)]
    rows.append((6, "zebra quantum volcano whisper"))
    df = _docs(spark, rows)
    out = {r.doc_id: r.bits_per_token for r in bigram_cross_entropy(df).collect()}
    assert out[6] > out[1]


def test_tfidf_top_terms_rare_term_wins(spark):
    # equal tf inside doc 1: the corpus-rare term out-scores the
    # everywhere-term on idf alone
    df = _docs(
        spark,
        [
            (1, "common rare"),
            (2, "common common common"),
            (3, "common filler words"),
        ],
    )
    out = {r.doc_id: r.top_terms for r in tfidf_top_terms(df, top_k=1).collect()}
    assert out[1] == "1:rare"
    assert out[2] == "1:common"


def test_whitespace_variants_tokenize_identically(spark):
    # Tabs, newlines, repeated spaces, and leading/trailing whitespace
    # must produce the same n-grams as the single-spaced form — the
    # shared corpus_tokens tokenizer guarantees every curation stage
    # (and the DuckDB oracles' REGEXP_SPLIT_TO_ARRAY(TRIM(..), '\s+'))
    # sees the same token stream.
    messy = "  a\tb\na  b\t\tc "
    clean = "a b a b c"
    df = _docs(spark, [(1, messy), (2, clean)])
    got = {
        (r.doc_id, r.gram): r.cnt
        for r in word_ngram_counts(df, 2).collect()
    }
    for doc in (1, 2):
        assert got[(doc, "a b")] == 2
        assert got[(doc, "b a")] == 1
        assert got[(doc, "b c")] == 1

    # repetition_stats keeps the messy doc in its join (the single-space
    # split used to yield zero bigrams and silently drop it)
    rep = {r.doc_id for r in repetition_stats(df, n=2).collect()}
    assert rep == {1, 2}
