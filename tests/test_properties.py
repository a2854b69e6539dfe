"""Property tests (SURVEY.md §5.4): linkage recall/conflict invariants,
MERGE idempotency, and similarity-function correctness against pure
Python reference implementations.

Each property runs a bounded number of hypothesis examples — every
example executes Spark jobs, so examples are few and data is small;
the value is in the generated shapes, not the volume.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.functions.similarity import fuzz_ratio
from ccgp_data_wrangling_spark.operators.linkage import link_reads_to_samples
from ccgp_data_wrangling_spark.operators.merge import ParquetTable

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

TS = datetime(2023, 5, 1)

# prefix-free ids: a unique leading token per sample makes matches exact
_token = st.text(alphabet="ABCDEFGHJKMNPQRSTUVWXYZ", min_size=2, max_size=5)
_sep = st.sampled_from(["_", "-", "."])


@st.composite
def _id_lists(draw):
    n = draw(st.integers(min_value=1, max_value=5))
    ids = []
    for i in range(n):
        parts = draw(st.lists(_token, min_size=1, max_size=3))
        seps = [draw(_sep) for _ in range(len(parts) - 1)]
        uid = f"U{i}" + "".join(
            s + p for s, p in zip([""] + seps, [parts[0]] + parts[1:])
        )
        ids.append(uid)
    return ids


@given(_id_lists())
@SETTINGS
def test_linkage_recall_property(spark, ids):
    """Every file named ``<id><sep>...`` links back to its sample when
    ids are prefix-free (unique leading token)."""
    samples = spark.createDataFrame(
        [(f"S{i}", uid, "YES") for i, uid in enumerate(ids)],
        "sample_name string, minicore_seq_id string, minicore_sequenced string",
    )
    reads = spark.createDataFrame(
        [
            (f"{uid}_L001_R{r}_001.fastq.gz", 10 + i, TS)
            for i, uid in enumerate(ids)
            for r in (1, 2)
        ],
        "file_name string, filesize long, mdate timestamp",
    )
    linked = {
        r.sample_name: r for r in link_reads_to_samples(samples, reads).collect()
    }
    assert set(linked) == {f"S{i}" for i in range(len(ids))}
    for i in range(len(ids)):
        row = linked[f"S{i}"]
        assert row.n_files == 2
        assert all(f.startswith(ids[i]) for f in row.files_found)


@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 100)),
        min_size=0,
        max_size=8,
    )
)
@SETTINGS
def test_merge_upsert_idempotent_property(spark, tmp_path_factory, src_rows):
    """upsert(upsert(T, S), S) == upsert(T, S) for arbitrary sources
    (including duplicate-key-free random overlaps with the target)."""
    tmp = tmp_path_factory.mktemp("m")
    tbl = ParquetTable(spark, str(tmp / "t"), "k")
    tbl.init(
        spark.createDataFrame([(k, -1) for k in range(4)], "k long, v long")
    )
    src = spark.createDataFrame(
        list({k: (k, v) for k, v in src_rows}.values()) or [],
        "k long, v long",
    )
    tbl.upsert(src)
    once = sorted(map(tuple, tbl.read().collect()))
    tbl.upsert(src)
    twice = sorted(map(tuple, tbl.read().collect()))
    assert once == twice
    # upsert semantics: every source key present with source value
    got = dict(once)
    for k, v in dict(src_rows).items():
        assert got[k] == v


def _py_lcs(a: str, b: str) -> int:
    prev = [0] * (len(a) + 1)
    for cb in b:
        cur = [0]
        for i, ca in enumerate(a, 1):
            cur.append(prev[i - 1] + 1 if ca == cb else max(prev[i], cur[-1]))
        prev = cur
    return prev[len(a)]


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcXYZ_-.0123456789", max_size=12),
            st.text(alphabet="abcXYZ_-.0123456789", max_size=12),
        ),
        min_size=1,
        max_size=20,
    )
)
@SETTINGS
def test_fuzz_ratio_matches_reference(spark, pairs):
    """fuzz_ratio == 100·2·LCS/(|a|+|b|) per the pure-Python DP, with
    100.0 for the empty-empty pair — one Spark job for all examples."""
    df = spark.createDataFrame(pairs, "a string, b string")
    rows = df.select("a", "b", fuzz_ratio(F.col("a"), F.col("b")).alias("r")).collect()
    for row in rows:
        a, b = row.a, row.b
        expected = (
            100.0 if not a and not b else 200.0 * _py_lcs(a, b) / (len(a) + len(b))
        )
        assert row.r == pytest.approx(expected, abs=1e-9), (a, b)


def test_ann_natural_corpus_recall(spark):
    """Wide-and-shallow LSH (16 tables x 6 bits) and IVF keep useful
    recall of the exact top-10 even on the natural corpus, whose
    nearest neighbors sit at cosine ~ 0.37 (near-random — the hard
    case LSH theory promises least about). Deterministic: seeded
    planes / seeded centroid sample. Complements the planted-corpus
    driver oracles (queries/llm_scale.py), which prove exact recovery
    of true near-duplicates.
    """
    from ccgp_data_wrangling_spark.catalog import load_table
    from ccgp_data_wrangling_spark.operators.knn import (
        ann_topk,
        brute_force_topk,
        ivf_topk,
    )
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    qrow = emb.where(F.col("vec_id") == 0).select("embedding").head()
    qv = [float(x) for x in qrow[0]]
    corpus = emb.where(F.col("vec_id") != 0)

    exact = {r.vec_id for r in brute_force_topk(corpus, qv, 10).collect()}
    lsh = {r.vec_id for r in ann_topk(corpus, qv, 10, n_tables=16, n_bits=6).collect()}
    ivf = {r.vec_id for r in ivf_topk(corpus, qv, 10, n_centroids=32, n_probe=8).collect()}

    lsh_recall = len(exact & lsh) / 10
    ivf_recall = len(exact & ivf) / 10
    print(f"natural-corpus recall: lsh={lsh_recall} ivf={ivf_recall}")
    assert lsh_recall >= 0.5
    assert ivf_recall >= 0.5


def test_ann_topk_carriers_agree(spark):
    """ann_topk returns the identical ranked rows whichever carrier
    ships the plane set (literal Columns, one-row broadcast table, or
    the Arrow matmul kernel) — the registered defaults (8x12x64 =
    6144 doubles) auto-select the kernel, so pin it against the
    literal reference the oracle was built on."""
    from ccgp_data_wrangling_spark.catalog import load_table
    from ccgp_data_wrangling_spark.operators.knn import ann_topk
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    qrow = emb.where(F.col("vec_id") == 0).select("embedding").head()
    qv = [float(x) for x in qrow[0]]
    corpus = emb.where(F.col("vec_id") != 0)

    def rows(carrier):
        return sorted(
            map(
                tuple,
                ann_topk(
                    corpus, qv, 5, n_tables=8, n_bits=12, carrier=carrier
                ).collect(),
            )
        )

    ref = rows("literal")
    assert ref  # natural corpus: >=1 random bucket collision survives
    assert rows("kernel") == ref
    assert rows("table") == ref
    assert rows("auto") == ref  # 6144 doubles -> kernel


# ---------------------------------------------------------------------------
# Sketch merge laws over arbitrary inputs
# ---------------------------------------------------------------------------

_vals = st.lists(
    st.integers(min_value=0, max_value=500), min_size=1, max_size=120
)


@given(_vals, _vals)
@SETTINGS
def test_kmv_merge_law_property(spark, xs, ys):
    """merge(sketch(A), sketch(B)) ≡ sketch(A ∪ B) for arbitrary
    multisets, including heavy overlap and duplicates."""
    from ccgp_data_wrangling_spark.operators.sketches import (
        kmv_distinct,
        kmv_merge,
        kmv_partial,
        kmv_readout,
    )

    a = spark.createDataFrame([("g", v) for v in xs], "g string, v int")
    b = spark.createDataFrame([("g", v) for v in ys], "g string, v int")
    whole = spark.createDataFrame(
        [("g", v) for v in xs + ys], "g string, v int"
    )
    merged = kmv_merge(
        [kmv_partial(a, "g", "v", k=16), kmv_partial(b, "g", "v", k=16)],
        k=16,
    )
    got = kmv_readout(merged, "g", k=16).collect()[0].asDict()
    want = kmv_distinct(whole, "g", "v", k=16).collect()[0].asDict()
    assert got == want
    # below k the sketch must be EXACT
    true_distinct = len(set(xs + ys))
    if true_distinct < 16:
        assert got["distinct_est"] == true_distinct


@given(_vals)
@SETTINGS
def test_priority_sample_invariance_property(spark, xs):
    """The sample is a pure function of the data — identical under
    any partitioning and any input row order."""
    from ccgp_data_wrangling_spark.operators.sampling import priority_sample

    rows = [("g", i, v + 1) for i, v in enumerate(xs)]
    df1 = spark.createDataFrame(rows, "src string, id long, w long").repartition(1)
    df2 = spark.createDataFrame(
        list(reversed(rows)), "src string, id long, w long"
    ).repartition(7)
    s1 = sorted(map(tuple, priority_sample(df1, "src", "id", "w", k=5).collect()))
    s2 = sorted(map(tuple, priority_sample(df2, "src", "id", "w", k=5).collect()))
    assert s1 == s2
    assert len(s1) == min(5, len(rows))


def test_ivf_topk_multi_full_probe_equals_brute_force(spark):
    """Probing every centroid makes ivf_topk_multi exact: per query it
    must equal brute_force_topk (same ids, same rounded cosines, same
    ranks)."""
    import random

    from ccgp_data_wrangling_spark.operators.knn import (
        brute_force_topk,
        ivf_topk_multi,
    )

    rng = random.Random(3)
    corpus_rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(80)
    ]
    emb = spark.createDataFrame(
        corpus_rows, "vec_id long, embedding array<double>"
    )
    queries = spark.createDataFrame(
        [(100 + j, [rng.gauss(0, 1) for _ in range(8)]) for j in range(5)],
        "query_id long, qvec array<double>",
    )
    multi = {
        (r.query_id, r.rank): (r.vec_id, r.cos_sim)
        for r in ivf_topk_multi(
            emb, queries, 3, n_centroids=8, n_probe=8
        ).collect()
    }
    for qrow in queries.collect():
        exact = brute_force_topk(emb, list(qrow.qvec), 3).collect()
        for e in exact:
            assert multi[(qrow.query_id, e.rank)] == (e.vec_id, e.cos_sim)


def test_ivf_topk_multi_never_crosses_queries(spark):
    """Each query's results rank 1..k with no leakage between query
    ids, even when queries share probe cells."""
    from ccgp_data_wrangling_spark.operators.knn import ivf_topk_multi

    emb = spark.createDataFrame(
        [(i, [float(i % 4 == j) + 0.01 for j in range(4)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(0, [1.0, 0.01, 0.01, 0.01]), (1, [0.01, 1.0, 0.01, 0.01])],
        "query_id long, qvec array<double>",
    )
    out = ivf_topk_multi(emb, queries, 5, n_centroids=4, n_probe=4).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert set(per_q) == {0, 1}
    for ranks in per_q.values():
        assert sorted(ranks) == [1, 2, 3, 4, 5]


def test_ivf_multiquery_planted_probe_inclusion(spark):
    """The ann_ivf_multiquery_planted oracle claims each planted
    near-copy is FOUND by the 8-probe IVF path.  That holds only if
    the near-copy's assigned centroid lands in its query's probe set
    for the fixed (seed=42, n_centroids=32, n_probe=8) parameters —
    an empirical fact of this corpus, not a structural guarantee.
    Assert it with the plan's own JVM arithmetic (same _assign_centroid
    / probe-sort expressions ivf_topk_multi compiles), so any future
    seed/parameter change that breaks the oracle fails HERE first."""
    from ccgp_data_wrangling_spark.catalog import load_table
    from ccgp_data_wrangling_spark.operators.knn import (
        _assign_centroid,
        _centroid_lit,
        _sample_centroids,
        cosine_sim,
    )

    PLANT_BASE = 2_000_000  # queries/llm_scale.py _PLANT_BASE
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    qdf = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qvec"),
    )
    planted = qdf.select(
        "query_id",
        F.explode(F.array(F.lit(1), F.lit(2))).alias("j"),
        "qvec",
    ).select(
        "query_id",
        (F.lit(PLANT_BASE) + F.col("query_id") * 10 + F.col("j")).alias("vec_id"),
        F.concat(
            F.array(F.element_at("qvec", 1) + 0.01 * F.col("j")),
            F.slice("qvec", 2, 63),
        ).alias("embedding"),
    )
    corpus = (
        emb.where(F.col("vec_id") >= 10)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .unionByName(planted.select("vec_id", "embedding"))
    )
    centroids = _sample_centroids(corpus, "vec_id", "embedding", 32, 42)
    cent_lit = _centroid_lit(centroids)

    qv = F.col("qvec")
    probe_arr = F.transform(
        F.slice(
            F.array_sort(
                F.transform(
                    cent_lit,
                    lambda c: F.struct(
                        (-cosine_sim(qv, c["cv"])).alias("nsim"),
                        c["idx"].alias("idx"),
                    ),
                )
            ),
            1,
            8,
        ),
        lambda p: p["idx"],
    )
    probes = qdf.select("query_id", probe_arr.alias("probes"))
    assigned = planted.select(
        "query_id",
        "vec_id",
        _assign_centroid(F.col("embedding"), cent_lit).alias("centroid"),
    )
    rows = assigned.join(probes, "query_id").collect()
    assert len(rows) == 20
    for r in rows:
        assert r.centroid in r.probes, (
            f"planted vec {r.vec_id} assigned to centroid {r.centroid} "
            f"outside query {r.query_id}'s probe set {r.probes}"
        )
