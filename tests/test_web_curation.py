"""Web-curation operator invariants (beyond the DuckDB parity suite).

* repeat scrub is idempotent and only ever removes adjacent dups;
* URL canonicalization is idempotent (canon(canon(u)) == canon(u))
  and case/port/tracking-insensitive.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.queries import all_queries


def test_repeat_scrub_idempotent(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a b b c"),
            (2, "x y x y"),          # alternation is NOT an adjacent dup
            (3, "  padded   pad pad\tpad  "),
            (4, ""),
            (5, "solo"),
        ],
        "doc_id long, text string",
    )
    # same expression pipeline as the registered query, inlined so it
    # can run over this fixture frame (the query fn takes sf_dir)
    from ccgp_data_wrangling_spark.operators.corpus_stats import corpus_tokens

    def scrub(df, text_col):
        toks = corpus_tokens(text_col)
        prev = F.concat(
            F.array(F.lit(" ")),
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        )
        kept = F.filter(
            F.zip_with(toks, prev, lambda t, p: F.when(t != p, t)),
            lambda x: x.isNotNull(),
        )
        return df.select(
            "doc_id", F.array_join(kept, " ").alias("scrubbed_text")
        )

    first = scrub(docs, "text")
    second = scrub(
        first.withColumnRenamed("scrubbed_text", "text"), "text"
    )
    got1 = dict(first.collect())
    got2 = dict(second.collect())
    assert got1 == got2  # idempotent
    assert got1[1] == "a b c"
    assert got1[2] == "x y x y"
    assert got1[3] == "padded pad"
    assert got1[5] == "solo"


def test_url_canonicalization_is_idempotent_at_fixture_scale(spark):
    q = all_queries()["url_normalize_dedup"]
    out = q(spark, "/root/testdata/sf0.001")
    urls = [r.url_canon for r in out.collect()]
    assert urls, "fixture produced no URLs"
    for u in urls:
        # canonical invariants: lowercase authority, no default port,
        # no fragment, no tracking params, no trailing slash
        host = u.split("://", 1)[1].split("/", 1)[0]
        assert host == host.lower()
        assert ":443" not in u and ":80" not in u
        assert "#" not in u
        assert "utm_" not in u
        assert not u.endswith("/")
