"""CacheScope / rotating_scope: persisted intermediates are released."""

from pyspark import StorageLevel

from ccgp_data_wrangling_spark.caching import CacheScope, rotating_scope
from ccgp_data_wrangling_spark.operators.dedup import ngram_jaccard_pairs


def test_cache_scope_releases_on_exit(spark):
    df = spark.range(10)
    with CacheScope() as scope:
        cached = scope.persist(df)
        cached.count()
        assert cached.storageLevel != StorageLevel.NONE
    assert cached.storageLevel == StorageLevel.NONE


def test_rotating_scope_releases_previous_invocation(spark):
    df = spark.range(10)
    # distinct plans per invocation: storageLevel resolves by plan in
    # the CacheManager, so identical plans would alias each other
    first = rotating_scope("test-op").persist(df.select("id"))
    first.count()
    assert first.storageLevel != StorageLevel.NONE
    second = rotating_scope("test-op").persist(df.select((df.id + 1).alias("id")))
    assert first.storageLevel == StorageLevel.NONE
    second.count()
    rotating_scope("test-op")  # release for test hygiene


def test_operator_rerun_does_not_warn_or_leak(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i} x y z a b c d") for i in range(8)],
        "doc_id long, text string",
    )
    # two invocations without an explicit scope: the second rotation
    # releases the first invocation's blocks, so repeated bench runs
    # neither stack cache entries nor re-register identical plans
    ngram_jaccard_pairs(docs, "doc_id", "text", n=2).count()
    ngram_jaccard_pairs(docs, "doc_id", "text", n=2).count()
    jvm_sc = spark.sparkContext._jsc.sc()
    assert jvm_sc.getRDDStorageInfo() is not None  # session still sane

    # explicit scope: caller-owned lifetime
    with CacheScope() as scope:
        out = ngram_jaccard_pairs(docs, "doc_id", "text", n=2, scope=scope)
        assert out.count() >= 0
