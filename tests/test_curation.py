"""End-to-end curation pipeline: each stage drops exactly its planted
offenders and nothing else.
"""

from __future__ import annotations

from ccgp_data_wrangling_spark.pipelines.curation import curate_corpus


def test_each_stage_drops_its_planted_offender(spark):
    good = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu one two three four"
    )
    good2 = (
        "ein zwei drei vier funf sechs sieben acht neun zehn elf zwolf "
        "dreizehn vierzehn funfzehn sechzehn siebzehn achtzehn neunzehn "
        "zwanzig einund zweiund dreiund vierund funfund sechsund sieben2 "
        "acht2 neun2 zehn2"
    )
    short = "too short"
    spammy = "spam ham " * 40  # top bigram dominates -> repetition drop
    near_dup = good + " extra"  # high 3-gram Jaccard with good
    contaminated = (
        "qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg hh jj kk ll zz "
        "xx cc vv bb nn mm q2 w2 e2 r2"
    )
    bench_text = contaminated  # shares all 5-grams
    docs = spark.createDataFrame(
        [
            (1, "s0", good),
            (2, "s0", good2),
            (3, "s0", short),
            (4, "s0", spammy),
            (5, "s0", good),        # exact dup of 1 -> dropped (1 kept)
            (6, "s0", near_dup),    # near-dup of 1 -> dropped
            (7, "s0", contaminated),
        ],
        "doc_id long, source string, text string",
    )
    bench = spark.createDataFrame(
        [(100, bench_text)], "doc_id long, text string"
    )
    out = curate_corpus(docs, bench)
    assert {r.doc_id for r in out.collect()} == {1, 2}


def test_survivors_carry_source_and_tokens(spark):
    text = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, "web", text)], "doc_id long, source string, text string"
    )
    bench = spark.createDataFrame(
        [(9, "completely different benchmark words here")],
        "doc_id long, text string",
    )
    row = curate_corpus(docs, bench).collect()[0]
    assert row.source == "web"
    assert row.n_tok == 40
