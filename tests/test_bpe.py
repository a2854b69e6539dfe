"""BPE tokenizer: distributed training vs a pure-Python Sennrich
reference, training-replay encoding, and the operator's edge gates."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.operators.bpe import (
    bpe_encode_expr,
    bpe_token_count_expr,
    bpe_train,
)


def _ref_train(texts, n, min_count):
    """Pure-Python Sennrich BPE: count all adjacent pairs weighted by
    word frequency, merge argmax (count desc, pair asc), greedy
    left-to-right application."""
    vocab = Counter()
    for t in texts:
        for w in t.split():
            vocab[tuple(list(w) + ["</w>"])] += 1
    out = []
    for _ in range(n):
        pc = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        out.append((a, b, cnt))
        nv = Counter()
        for syms, c in vocab.items():
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            nv[tuple(ns)] += c
        vocab = nv
    return out, vocab


def _ref_encode(text, merges):
    toks = []
    for w in text.split():
        syms = list(w) + ["</w>"]
        for a, b, *_ in merges:
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            syms = ns
        toks.extend(syms)
    return toks


TEXTS = [
    "low lower lowest low low",
    "new newer newest new lower",
    "the newest of the new low lows",
]


def test_train_matches_python_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = bpe_train(docs, "text", n_merges=10, min_count=2)
    exp, _ = _ref_train(TEXTS, 10, 2)
    assert got == exp


def test_encode_is_training_replay(spark):
    """Encoding any text with the learned merges applies them in
    training order — on the training corpus itself this reproduces the
    reference tokenization exactly."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges = bpe_train(docs, "text", n_merges=6, min_count=2)
    rows = docs.select(
        "doc_id",
        bpe_encode_expr(F.col("text"), merges).alias("toks"),
        bpe_token_count_expr(F.col("text"), merges).alias("n"),
    ).collect()
    for r in rows:
        exp = _ref_encode(TEXTS[r.doc_id], merges)
        assert list(r.toks) == exp
        assert r.n == len(exp)


def test_overlapping_pair_is_greedy_left_to_right(spark):
    """'aaa' under merge (a,a) must tokenize [aa, a] — the replace
    representation's non-overlapping guarantee."""
    docs = spark.createDataFrame([(1, "aaa aaaa")], "doc_id long, text string")
    toks = docs.select(
        bpe_encode_expr(F.col("text"), [("a", "a")]).alias("t")
    ).collect()[0].t
    assert list(toks) == ["aa", "a", "</w>", "aa", "aa", "</w>"]


def test_min_count_stops_training(spark):
    docs = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    # every pair occurs once; min_count=2 stops immediately
    assert bpe_train(docs, "text", n_merges=5, min_count=2) == []
    # min_count=1 learns deterministically: ties break (l, r) ascending
    got = bpe_train(docs, "text", n_merges=2, min_count=1)
    exp, _ = _ref_train(["ab cd"], 2, 1)
    assert got == exp


def test_separator_bytes_in_input_are_stripped(spark):
    """The reserved \\x1f separator cannot forge symbol boundaries:
    it is stripped from input words before symbolization."""
    docs = spark.createDataFrame(
        [(1, "a\x1fb a\x1fb ab")], "doc_id long, text string"
    )
    got = bpe_train(docs, "text", n_merges=1, min_count=1)
    exp, _ = _ref_train(["ab ab ab"], 1, 1)
    assert got == exp


def test_property_random_corpora_match_reference(spark):
    """Randomized corpora — including '<', '/', 'w', '>' so merged
    symbols can collide with the '</w>' terminal spelling, and
    repeated-char runs exercising greedy overlap — train and encode
    exactly like the pure-Python reference."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    words = st.lists(
        st.text(alphabet="ab</w>x", min_size=1, max_size=6),
        min_size=1,
        max_size=8,
    )
    corpora = st.lists(words, min_size=1, max_size=3)

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[
            HealthCheck.function_scoped_fixture,
            HealthCheck.too_slow,
        ],
    )
    @given(corpora)
    def run(corpus):
        texts = [" ".join(ws) for ws in corpus]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = bpe_train(docs, "text", n_merges=4, min_count=1)
        exp, _ = _ref_train(texts, 4, 1)
        assert got == exp
        if got:
            rows = docs.select(
                "doc_id", bpe_encode_expr(F.col("text"), got).alias("t")
            ).collect()
            for r in rows:
                assert list(r.t) == _ref_encode(texts[r.doc_id], got)

    run()


def test_bpe_delta_equals_full_recount_and_touches_few_words(spark):
    """The delta-maintained pair-count table must reproduce the full
    recount's merges exactly, and on a planted Zipf-ish corpus the
    affected set (words containing the winning pattern) is a small
    fraction of the vocab — the property that makes the round cost
    sublinear in vocab size."""
    # many distinct filler words, one tiny planted family carrying the
    # two most frequent pairs: (z,q) x3 per occurrence, then (zq,zq)
    texts = []
    for i in range(300):
        texts.append(f"unique{i}x word{i % 7}")  # broad vocab
    texts += ["zqzqzq"] * 200
    df = spark.createDataFrame([(t,) for t in texts], "text string")

    fast = bpe_train(df, "text", n_merges=6, min_count=2, delta=True)
    slow = bpe_train(df, "text", n_merges=6, min_count=2, delta=False)
    ref, _ = _ref_train(texts, 6, 2)
    assert fast == slow == ref

    # sublinearity witness: after the first merge, words containing the
    # winning pattern are a small slice of the distinct-word vocab
    from ccgp_data_wrangling_spark.operators.bpe import (
        CLOSE,
        OPEN,
        _merge_expr,
        _vocab,
    )

    vocab = _vocab(df, "text")
    n_vocab = vocab.count()
    l, r, _ = fast[0]
    pattern = OPEN + l + CLOSE + OPEN + r + CLOSE
    state = F.col("s")
    for m in fast[:1]:
        state = _merge_expr(state, m[0], m[1])
    l2, r2, _ = fast[1]
    pattern2 = OPEN + l2 + CLOSE + OPEN + r2 + CLOSE
    affected2 = vocab.select(state.alias("s")).where(
        F.col("s").contains(pattern2)
    ).count()
    assert n_vocab > 300
    assert affected2 <= 5
    assert (l, r) == ("z", "q") and (l2, r2) == ("zq", "zq")


def test_roundtrip_oracle_exact_on_adversarial_text(spark, tmp_path):
    """The round-trip query and its DuckDB oracle must agree byte-for-
    byte on text containing reserved marker bytes (\\x1f/\\x1e, which
    the encoder strips) and the LITERAL '</w>' spelling (which decodes
    to a space, indistinguishable from the terminal marker) — the r7
    advice divergence, now mirrored exactly in the oracle SQL."""
    import duckdb

    from ccgp_data_wrangling_spark.queries.bpe_queries import (
        _ROUNDTRIP_SQL,
        bpe_roundtrip_identity,
    )

    texts = [
        "plain words here",
        "mark\x1fer by\x1etes stripped",
        "lit</w>eral marker and</w> alone </w> end",
        "\x1f \x1e\x1f empty-after-strip",
        "a</w  <</w  tail< mixed\x1f</w\x1e>ok",
    ]
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(sf / "documents.parquet"))

    got = bpe_roundtrip_identity(spark, str(sf))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet/*.parquet'"
    )
    from tests.oracle import compare

    compare(got, con, _ROUNDTRIP_SQL)
    con.close()
