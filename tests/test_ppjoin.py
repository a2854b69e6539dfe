"""Prefix-filtered exact Jaccard join (operators/dedup.
ngram_jaccard_pairs_prefix) must return exactly the same pairs as the
plain inverted-index path — the prefix filter is a candidate-pruning
optimization, never an approximation."""

from __future__ import annotations

import pytest

from ccgp_data_wrangling_spark.operators.dedup import (
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_prefix,
)


def _zipf_corpus(spark, n_docs=120):
    """Zipfian-ish gram dfs: a few very common words, a long tail."""
    rows = []
    for d in range(n_docs):
        words = []
        for j in range(30):
            r = (d * 31 + j * 7) % 100
            if r < 40:
                words.append(f"common{r % 5}")  # heavy head
            else:
                words.append(f"rare{d}_{j}")  # doc-unique tail
        rows.append((d, " ".join(words)))
    # plant near-dup pairs: doc i and doc i+1000 share most text
    for d in range(0, 20):
        base = rows[d][1]
        rows.append((1000 + d, base + " extraword"))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("threshold", [0.5, 0.8])
def test_prefix_path_matches_plain(spark, threshold):
    docs = _zipf_corpus(spark)
    plain = sorted(
        map(
            tuple,
            ngram_jaccard_pairs(
                docs, "doc_id", "text", n=3, threshold=threshold, max_df=None
            ).collect(),
        )
    )
    prefix = sorted(
        map(
            tuple,
            ngram_jaccard_pairs_prefix(
                docs, "doc_id", "text", n=3, threshold=threshold
            ).collect(),
        )
    )
    assert plain == prefix
    assert len(plain) >= 20  # the planted pairs are found


def test_prefix_path_finds_exact_duplicates(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "x y z w v u t s")],
        "doc_id long, text string",
    )
    got = ngram_jaccard_pairs_prefix(
        docs, "doc_id", "text", n=3, threshold=0.9
    ).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in got] == [(1, 2, 1.0)]
