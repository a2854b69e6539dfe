"""Web-corpus curation queries (round-3 additions): URL canonical
dedup, in-document repeat scrubbing, robust winsorization, seeded
topic clustering, language-mix diagnostics, anchor-text aggregation,
robots-policy filtering, and session-level event dedup.

Beyond-reference training-data-pipeline surface (brief: "operations a
large-scale training-data pipeline would need"), in the spirit of the
published CommonCrawl/C4/RefinedWeb preparation steps. Every query has
a full DuckDB oracle; float discipline follows the repo rules (round
identically on both sides; no rounding where interpolation ulp noise
is absorbed by the driver's %.6f canonicalization).

Scale notes: every query is explode → hash-agg / broadcast-dim join /
per-key window — no corpus-wide windows, no driver collects beyond
bounded seed sets (topic centroids: 8 rows, same bound class as
knn.py's IVF sample).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.catalog import load_table
from ccgp_data_wrangling_spark.functions.temporal import epoch_seconds
from ccgp_data_wrangling_spark.operators.corpus_stats import corpus_tokens
from ccgp_data_wrangling_spark.queries import register

# ---------------------------------------------------------------------------
# URL canonicalization + dedup: the CommonCrawl-style first dedup pass.
# Synthetic URLs derive from doc_id; canonicalization lowercases the
# authority, strips default ports, fragments, utm_* tracking params and
# trailing slashes — then exact-dedup on the canonical form keeps the
# smallest doc_id. All string ops are identical regexes on both
# engines (DuckDB needs the 'g' flag to match Spark's replace-all).
# ---------------------------------------------------------------------------

_URL_SQL = """
WITH raw AS (
  SELECT doc_id,
         'https://WWW.Site' || CAST(doc_id % 7 AS VARCHAR) || '.COM:443/path/'
           || CAST(doc_id % 211 AS VARCHAR)
           || CASE CAST(doc_id % 4 AS INT)
                WHEN 0 THEN '?utm_source=feed&id=7'
                WHEN 1 THEN '/'
                WHEN 2 THEN '#sec2'
                ELSE '?id=9&utm_campaign=x' END AS url
  FROM documents
),
step1 AS (
  SELECT doc_id,
         REGEXP_REPLACE(
           REGEXP_REPLACE(
             REGEXP_REPLACE(url, '#.*', '', 'g'),
             'utm_[a-z]+=[^&#]*&?', '', 'g'),
           '[?&]$', '', 'g') AS u
  FROM raw
),
canon AS (
  SELECT doc_id,
         REGEXP_REPLACE(
           REGEXP_REPLACE(LOWER(REGEXP_EXTRACT(u, '^(https?://[^/?#]+)', 1)),
                          ':(443|80)$', '', 'g')
           || REGEXP_REPLACE(u, '^https?://[^/?#]+', '', 'g'),
           '/$', '', 'g') AS url_canon
  FROM step1
)
SELECT url_canon, MIN(doc_id) AS canonical_doc,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM canon GROUP BY url_canon
"""


@register("url_normalize_dedup", _URL_SQL)
def url_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    url = F.concat(
        F.lit("https://WWW.Site"),
        (d % 7).cast("string"),
        F.lit(".COM:443/path/"),
        (d % 211).cast("string"),
        F.when(d % 4 == 0, F.lit("?utm_source=feed&id=7"))
        .when(d % 4 == 1, F.lit("/"))
        .when(d % 4 == 2, F.lit("#sec2"))
        .otherwise(F.lit("?id=9&utm_campaign=x")),
    )
    u = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(url, "#.*", ""), r"utm_[a-z]+=[^&#]*&?", ""
        ),
        r"[?&]$",
        "",
    )
    head = F.regexp_replace(
        F.lower(F.regexp_extract(u, r"^(https?://[^/?#]+)", 1)),
        r":(443|80)$",
        "",
    )
    canon = F.regexp_replace(
        F.concat(head, F.regexp_replace(u, r"^https?://[^/?#]+", "")), "/$", ""
    )
    return (
        docs.select(d.alias("doc_id"), canon.alias("url_canon"))
        .groupBy("url_canon")
        .agg(
            F.min("doc_id").alias("canonical_doc"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


# ---------------------------------------------------------------------------
# In-document consecutive-repeat scrub: collapse immediately repeated
# tokens (stutter artifacts of OCR/scraping). Pure array HOF — the
# filter lambda's index argument makes this a single O(tokens) pass
# with no explode, no shuffle at all beyond the scan.
# ---------------------------------------------------------------------------

_SCRUB_SQL = """
WITH tok AS (
  SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+') AS toks
  FROM documents
),
scrubbed AS (
  SELECT doc_id, toks,
         LIST_FILTER(toks, (x, i) -> i = 1 OR x <> toks[i - 1]) AS kept
  FROM tok
)
SELECT doc_id,
       CAST(LEN(toks) AS INT) AS n_tok,
       CAST(LEN(kept) AS INT) AS n_kept,
       ARRAY_TO_STRING(kept, ' ') AS scrubbed_text
FROM scrubbed
"""


@register("ngram_repeat_scrub", _SCRUB_SQL)
def ngram_repeat_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = corpus_tokens("text")
    # compare each token to its predecessor via a shifted copy +
    # zip_with. An index-lambda formulation (element_at(toks, i)
    # inside F.filter) re-evaluates the whole split expression per
    # ELEMENT — O(tokens²) per doc, measured 2.0 s vs 0.6 s here.
    # The sentinel head can never collide: tokens cannot contain
    # whitespace, so " " never equals a real token.
    prev = F.concat(
        F.array(F.lit(" ")),
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
    )
    kept = F.filter(
        F.zip_with(toks, prev, lambda t, p: F.when(t != p, t)),
        lambda x: x.isNotNull(),
    )
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tok"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, " ").alias("scrubbed_text"),
    )


# ---------------------------------------------------------------------------
# Winsorized quality score: per-source exact p05/p95 of n_chars, clip
# to the band, flag the outliers. Percentile dim is source-sized
# (tiny) and broadcast back; F.percentile ↔ QUANTILE_CONT use the same
# linear interpolation (see percentiles_by_flag).
# ---------------------------------------------------------------------------

_WINSOR_SQL = """
WITH bands AS (
  SELECT source,
         QUANTILE_CONT(n_chars, 0.05) AS p05,
         QUANTILE_CONT(n_chars, 0.95) AS p95
  FROM documents GROUP BY source
)
SELECT d.doc_id, d.source,
       CAST(d.n_chars AS BIGINT) AS n_chars,
       GREATEST(LEAST(CAST(d.n_chars AS DOUBLE), b.p95), b.p05) AS clipped,
       d.n_chars < b.p05 OR d.n_chars > b.p95 AS is_outlier
FROM documents d JOIN bands b USING (source)
"""


@register("winsorize_quality", _WINSOR_SQL)
def winsorize_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bands = docs.groupBy("source").agg(
        F.percentile("n_chars", F.lit(0.05)).alias("p05"),
        F.percentile("n_chars", F.lit(0.95)).alias("p95"),
    )
    n = F.col("n_chars").cast("double")
    return (
        docs.join(F.broadcast(bands), "source")
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.greatest(F.least(n, F.col("p95")), F.col("p05")).alias("clipped"),
            ((n < F.col("p05")) | (n > F.col("p95"))).alias("is_outlier"),
        )
    )


# ---------------------------------------------------------------------------
# Seeded topic clustering: assign every embedding to its nearest of 8
# deterministic seed centroids (vec_id 0..7) by cosine; report cluster
# populations. The centroid set is a bounded 8-row collect (same bound
# class as knn.py's IVF sample); assignment is a broadcast-literal
# array — no join, no shuffle until the final tiny groupBy.
# ---------------------------------------------------------------------------

_TOPIC_SQL = """
WITH cent AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < 8
),
sims AS (
  SELECT e.vec_id, c.cid,
         LIST_COSINE_SIMILARITY(CAST(e.embedding AS DOUBLE[]), c.cv) AS sim
  FROM embeddings e CROSS JOIN cent c
),
best AS (
  SELECT vec_id, cid, sim,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY sim DESC, cid ASC) AS rk
  FROM sims
)
SELECT cid AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       ROUND(AVG(sim), 4) AS avg_sim
FROM best WHERE rk = 1 GROUP BY cid
"""


@register("doc_topic_cluster", _TOPIC_SQL)
def doc_topic_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccgp_data_wrangling_spark.operators.knn import cosine_sim

    emb = load_table(spark, sf_dir, "embeddings")
    cents = (
        emb.where(F.col("vec_id") < 8)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .orderBy("vec_id")
        .collect()
    )
    v = F.col("embedding").cast("array<double>")
    sims = F.array(
        *[cosine_sim(v, F.lit(r.v).cast("array<double>")) for r in cents]
    )
    # first position of the max = smallest cluster id on ties
    cluster = F.array_position(sims, F.array_max(sims)) - 1
    assigned = emb.select(
        cluster.cast("bigint").alias("cluster"),
        F.element_at(sims, F.array_position(sims, F.array_max(sims)).cast("int"))
        .alias("sim"),
    )
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.avg("sim"), 4).alias("avg_sim"),
    )


# ---------------------------------------------------------------------------
# Language-mix diagnostics per source: language counts, majority share
# and Shannon entropy of the language distribution — the standard
# mixture dashboard before setting sampling weights. Two chained hash
# aggregates; the per-source relation is vocabulary-tiny.
# ---------------------------------------------------------------------------

_XLING_SQL = """
WITH by_lang AS (
  SELECT source, lang, COUNT(*) AS n
  FROM documents GROUP BY source, lang
),
tot AS (
  SELECT source, SUM(n) AS n_docs FROM by_lang GROUP BY source
)
SELECT b.source,
       CAST(ANY_VALUE(t.n_docs) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS INT) AS n_langs,
       ROUND(MAX(b.n) * 1.0 / ANY_VALUE(t.n_docs), 4) AS majority_share,
       ROUND(-SUM((b.n * 1.0 / t.n_docs) * LN(b.n * 1.0 / t.n_docs)), 4)
         AS lang_entropy
FROM by_lang b JOIN tot t USING (source)
GROUP BY b.source
"""


@register("cross_lingual_ratio", _XLING_SQL)
def cross_lingual_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    by_lang = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    tot = by_lang.groupBy("source").agg(F.sum("n").alias("n_docs"))
    p = F.col("n") / F.col("n_docs")
    return (
        by_lang.join(F.broadcast(tot), "source")
        .groupBy("source")
        .agg(
            F.any_value("n_docs").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("int").alias("n_langs"),
            F.round(F.max("n") / F.any_value("n_docs"), 4).alias(
                "majority_share"
            ),
            F.round(-F.sum(p * F.log(p)), 4).alias("lang_entropy"),
        )
    )


# ---------------------------------------------------------------------------
# Anchor-text aggregation: the web-graph enrichment step — collect the
# anchor strings of all links pointing at each target page. Links are
# synthesized from doc_id; anchors are each source doc's first three
# tokens. Explode-free: one row per doc already IS one link; the
# aggregation is a hash groupBy on the target key.
# ---------------------------------------------------------------------------

_ANCHOR_SQL = """
WITH links AS (
  SELECT (doc_id * 7 + 3) % 997 AS target_id,
         ARRAY_TO_STRING(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')[1:3], ' ')
           AS anchor
  FROM documents
)
SELECT target_id,
       CAST(COUNT(*) AS BIGINT) AS n_links,
       CAST(COUNT(DISTINCT anchor) AS BIGINT) AS n_uniq_anchors,
       ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT anchor)), '|') AS anchors
FROM links GROUP BY target_id
"""


@register("anchor_text_agg", _ANCHOR_SQL)
def anchor_text_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = corpus_tokens("text")
    return (
        docs.select(
            ((F.col("doc_id") * 7 + 3) % 997).alias("target_id"),
            F.array_join(F.slice(toks, 1, 3), " ").alias("anchor"),
        )
        .groupBy("target_id")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("anchor").alias("n_uniq_anchors"),
            F.array_join(F.array_sort(F.collect_set("anchor")), "|").alias(
                "anchors"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Robots-policy filter: apply a per-host crawl policy (a tiny dim) to
# the corpus — the compliance gate every web pipeline runs before
# training. The policy dim is broadcast; the filter is a pure
# predicate after the join, so the corpus is scanned once and never
# shuffled.
# ---------------------------------------------------------------------------

_ROBOTS_SQL = """
WITH policy AS (
  SELECT source, LENGTH(source) % 4 AS deny_below
  FROM (SELECT DISTINCT source FROM documents)
),
tagged AS (
  SELECT d.doc_id, d.source, d.doc_id % 10 AS path_bucket, p.deny_below
  FROM documents d JOIN policy p USING (source)
)
SELECT source,
       CAST(ANY_VALUE(deny_below) AS INT) AS deny_below,
       CAST(SUM(CASE WHEN path_bucket >= deny_below THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN path_bucket < deny_below THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dropped
FROM tagged GROUP BY source
"""


@register("robots_policy_filter", _ROBOTS_SQL)
def robots_policy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    policy = (
        docs.select("source")
        .distinct()
        .select("source", (F.length("source") % 4).alias("deny_below"))
    )
    tagged = docs.join(F.broadcast(policy), "source").select(
        "source",
        "deny_below",
        (F.col("doc_id") % 10).alias("path_bucket"),
    )
    keep = F.col("path_bucket") >= F.col("deny_below")
    return tagged.groupBy("source").agg(
        F.any_value("deny_below").cast("int").alias("deny_below"),
        F.sum(keep.cast("long")).alias("n_kept"),
        F.sum((~keep).cast("long")).alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# Session-level event dedup: drop an event when the same user fired
# the same event type within 60 s of the previous one (double-click /
# retry artifacts). Per-(user, type) window — millions of small
# partitions, the scalable direction; ts arithmetic via epoch_seconds
# keeps microsecond precision exactly on both engines.
# ---------------------------------------------------------------------------

_SESSION_DEDUP_SQL = """
WITH flagged AS (
  SELECT user_id, event_type, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > 60.0
              THEN 1 ELSE 0 END AS kept
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
)
SELECT user_id, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(kept) AS BIGINT) AS n_kept
FROM flagged GROUP BY user_id, event_type
"""


@register("session_dedup_window", _SESSION_DEDUP_SQL)
def session_dedup_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    kept = F.when(
        prev.isNull() | (epoch_seconds(F.col("ts")) - epoch_seconds(prev) > 60.0),
        1,
    ).otherwise(0)
    return (
        ev.select("user_id", "event_type", kept.alias("kept"))
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("kept").cast("long").alias("n_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Link-graph PageRank (document-quality prior): 10 synchronous rounds
# of the iterative join+agg operator (operators/pagerank.py) on a
# synthetic doc-derived graph, verified against a DuckDB recursive
# CTE running the identical rounds. The graph (src = doc_id mod 211,
# dst = (7·doc_id + 3) mod 211; 7 invertible mod 211) covers every
# node with both out- and in-edges at sf >= 0.01, so the oracle needs
# no dangling-mass term and the recursive table is referenced once.
# ---------------------------------------------------------------------------

_PAGERANK_SQL = """
WITH RECURSIVE
edges AS (
  SELECT doc_id % 211 AS src, (doc_id * 7 + 3) % 211 AS dst FROM documents
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
n AS (SELECT COUNT(DISTINCT src) AS n FROM edges),
pr(iter, node, rank) AS (
  SELECT 0, src, 1.0 / (SELECT n FROM n) FROM (SELECT DISTINCT src FROM edges)
  UNION ALL
  SELECT m.iter + 1, m.dst,
         0.15 / (SELECT n FROM n) + 0.85 * m.mass
  FROM (
    SELECT ANY_VALUE(pr.iter) AS iter, e.dst,
           SUM(pr.rank / deg.deg) AS mass
    FROM pr
    JOIN edges e ON pr.node = e.src
    JOIN deg ON e.src = deg.src
    WHERE pr.iter < 10
    GROUP BY e.dst
  ) m
)
SELECT node, ROUND(rank, 4) AS rank FROM pr WHERE iter = 10
"""


@register("pagerank_link_graph", _PAGERANK_SQL)
def pagerank_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccgp_data_wrangling_spark.operators.pagerank import pagerank

    docs = load_table(spark, sf_dir, "documents")
    edges = docs.select(
        (F.col("doc_id") % 211).alias("src"),
        ((F.col("doc_id") * 7 + 3) % 211).alias("dst"),
    )
    return pagerank(edges, n_iter=10)


# ---------------------------------------------------------------------------
# JL random projection (embedding dimensionality reduction, 64 → 16):
# the oracle inlines the SAME seeded Gaussian matrix as SQL literals
# (repr() round-trips doubles exactly), so both engines compute the
# identical projection — generated programmatically below.
# ---------------------------------------------------------------------------


def _jl_oracle() -> str:
    import math

    from ccgp_data_wrangling_spark.operators.knn import _seeded_planes

    planes = _seeded_planes(1, 16, 64, 7)[0]
    scale = repr(1.0 / math.sqrt(16))
    terms = ",\n       ".join(
        f"ROUND(LIST_DOT_PRODUCT(v, [{', '.join(repr(w) for w in row)}])"
        f" * {scale}, 6) AS y{i:02d}"
        for i, row in enumerate(planes)
    )
    return (
        "WITH src AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)\n"
        f"SELECT vec_id,\n       {terms}\nFROM src"
    )


@register("jl_projection_16d", _jl_oracle())
def jl_projection_16d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ccgp_data_wrangling_spark.operators.knn import jl_project

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", *jl_project(emb, "embedding", dim=64, out_dim=16, seed=7)
    )


# ---------------------------------------------------------------------------
# Label propagation communities over the synthetic link graph. The
# oracle unrolls the three synchronous rounds as explicit CTE stages
# (round t+1 reads only round t) with the same (count DESC, label
# ASC) winner rule — a fixed-round pure function of the edge set.
# ---------------------------------------------------------------------------

def _lpa_oracle() -> str:
    stage = """
r{t} AS (
  SELECT s.a AS node, l.label, COUNT(*) AS c
  FROM sym s JOIN l{p} l ON l.node = s.b GROUP BY 1, 2
),
l{t} AS (
  SELECT node, label FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
    FROM r{t}) WHERE rn = 1
)"""
    rounds = ",".join(stage.format(t=t, p=t - 1) for t in (1, 2, 3))
    return f"""
WITH e0 AS (
  SELECT DISTINCT doc_id % 211 AS a, (doc_id * 7 + 3) % 211 AS b
  FROM documents WHERE doc_id % 211 != (doc_id * 7 + 3) % 211
),
sym AS (
  SELECT DISTINCT a, b FROM (SELECT a, b FROM e0 UNION SELECT b, a FROM e0)
),
l0 AS (SELECT DISTINCT a AS node, a AS label FROM sym),{rounds}
SELECT node, label FROM l3
"""


@register("label_propagation_communities", _lpa_oracle())
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Communities on the link graph via 3-round deterministic LPA
    (operators/labelprop.py).

    Complements pagerank (importance) and connected components
    (reachability): LPA finds dense regions. One shuffle join + one
    argmax aggregate per round, constant plan size via checkpoint
    truncation.
    """
    from ccgp_data_wrangling_spark.operators.labelprop import (
        label_propagation,
    )

    docs = load_table(spark, sf_dir, "documents")
    edges = docs.select(
        (F.col("doc_id") % 211).alias("src"),
        ((F.col("doc_id") * 7 + 3) % 211).alias("dst"),
    )
    return label_propagation(edges, n_rounds=3)


# ---------------------------------------------------------------------------
# Triangle count on the link graph: degree-ordered orientation
# (Suri & Vassilvitskii) vs a brute-force 3-way oracle join.
# ---------------------------------------------------------------------------

# the affine link graph (i → 7i+3 mod 211) is algebraically
# triangle-free, so the triangle relation is built on md5-derived
# random endpoints instead — ~500 edges, 18 triangles at sf0.01
_TRI_SQL = """
WITH raw AS (
  SELECT (CAST(('0x' || SUBSTR(md5('ta:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1) % 211 AS a,
         (CAST(('0x' || SUBSTR(md5('tb:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1) % 211 AS b
  FROM documents
),
e0 AS (
  SELECT DISTINCT LEAST(a, b) AS a, GREATEST(a, b) AS b FROM raw WHERE a != b
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM e0 x
JOIN e0 y ON y.a = x.a AND y.b > x.b
JOIN e0 z ON z.a = x.b AND z.b = y.b
"""


@register("triangle_count_links", _TRI_SQL)
def triangle_count_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the synthetic link graph via degree-ordered
    orientation (operators/pagerank.triangle_count): wedge volume is
    Σ out-degree² ≤ O(|E|^1.5) on ANY degree distribution — the hub
    explosion a naive 3-way self-join suffers is structurally
    impossible. Oracle: brute-force ordered 3-way join.
    """
    from ccgp_data_wrangling_spark.operators.pagerank import triangle_count

    from ccgp_data_wrangling_spark.operators.sketches import _element_hash

    docs = load_table(spark, sf_dir, "documents")
    hid = lambda s_: F.pmod(  # noqa: E731
        _element_hash(
            F.concat(F.lit(s_ + ":"), F.col("doc_id").cast("string"))
        ),
        F.lit(211),
    )
    edges = docs.select(hid("ta").alias("src"), hid("tb").alias("dst"))
    return triangle_count(edges)


# ---------------------------------------------------------------------------
# Bounded-hop reachability: nodes within ≤3 directed hops of the
# seed set, with minimal hop distance. Three unrolled join rounds
# (frontier ⋈ edges, min-combine) — the bounded-depth BFS whose
# per-round shuffle is frontier-sized; the oracle is a depth-capped
# recursive CTE arriving at the same fixpoint.
# ---------------------------------------------------------------------------

_REACH_SQL = """
WITH RECURSIVE edges AS (
  SELECT DISTINCT doc_id % 211 AS src, (doc_id * 7 + 3) % 211 AS dst
  FROM documents WHERE doc_id % 211 != (doc_id * 7 + 3) % 211
),
reach(node, hops) AS (
  SELECT src, 0 FROM edges WHERE src % 50 = 0
  UNION
  SELECT e.dst, r.hops + 1
  FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.hops < 3
)
SELECT node, CAST(MIN(hops) AS INT) AS hops FROM reach GROUP BY 1
"""


@register("reachability_3hops", _REACH_SQL)
def reachability_3hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal hop distance (≤3) from seed nodes over the link graph.

    Frontier BFS, one equi-join + min-combine per round; rounds are
    bounded by the hop cap so the plan is static. At 100 TB the
    frontier rides hash-partitioned joins against a bucketed edge
    table — per-round cost ∝ frontier out-degree, never |V|.
    """
    docs = load_table(spark, sf_dir, "documents")
    edges = docs.select(
        (F.col("doc_id") % 211).alias("src"),
        ((F.col("doc_id") * 7 + 3) % 211).alias("dst"),
    ).where(F.col("src") != F.col("dst")).dropDuplicates()
    seeds = (
        edges.select(F.col("src").alias("node"))
        .where(F.col("node") % 50 == 0)
        .dropDuplicates()
        .withColumn("hops", F.lit(0))
    )
    best = seeds
    frontier = seeds
    for _ in range(3):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(
                F.col("dst").alias("node"), (F.col("hops") + 1).alias("hops")
            )
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
        )
        best = (
            best.unionByName(nxt)
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
        )
        frontier = nxt
    return best.select("node", F.col("hops").cast("int").alias("hops"))


# ---------------------------------------------------------------------------
# WARC ingest through the driver gate (sources/warc.py): per event a
# REAL gzipped 3-record web archive (request + 200 response + 404
# response, one gzip member each — the Common Crawl layout) is
# synthesized inside the Arrow batch, parsed back by the real parser
# (multi-member gunzip → header walk → Content-Length slicing → HTTP
# split → tag-strip), and every output field is a closed form of the
# construction. The request record must be filtered by the parser
# (response_only), so each event yields exactly two rows.
# ---------------------------------------------------------------------------

_WARC_SQL = """
WITH ev AS (
  SELECT event_id AS id, (event_id % 12) + 3 AS k
  FROM events WHERE event_id % 20 = 6
),
w AS (
  SELECT id, k,
         array_to_string(
           list_transform(range(0, k), i -> 'tok' || CAST((id + i) % 7 AS VARCHAR)),
           ' ') AS words
  FROM ev
)
SELECT id,
       'http://site' || CAST(id % 50 AS VARCHAR) || '.test/page' || CAST(id % 10 AS VARCHAR) AS target_uri,
       CAST(200 AS INT) AS http_status,
       words AS text,
       CAST(LENGTH('<html><body>' || words || '</body></html>') AS BIGINT) AS n_body_bytes
FROM w
UNION ALL
SELECT id,
       'http://site' || CAST(id % 50 AS VARCHAR) || '.test/missing',
       CAST(404 AS INT),
       'gone',
       CAST(LENGTH('<html>gone</html>') AS BIGINT)
FROM ev
"""


@register("warc_ingest_extract", _WARC_SQL)
def warc_ingest_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real WARC ingest end-to-end: build_warc fixture archives →
    sources/warc.warc_records (gunzip members, record walk, HTTP
    split, tag-strip text) → per-record rows, driver-checked against
    the construction's closed forms. Request records are dropped by
    the response_only gate, so row count doubles the event filter."""
    from collections.abc import Iterator

    import pandas as pd

    from ccgp_data_wrangling_spark.sources.warc import build_warc, warc_records

    # repartition BEFORE the Python stages (see llm_scale gate queries)
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_id") % 20 == 6
    ).select(F.col("event_id").alias("archive_id")).repartition(
        spark.sparkContext.defaultParallelism
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for eid in pdf["archive_id"]:
                eid = int(eid)
                k = (eid % 12) + 3
                words = " ".join(f"tok{(eid + i) % 7}" for i in range(k))
                page = f"http://site{eid % 50}.test/page{eid % 10}"
                payloads.append(
                    build_warc(
                        [
                            {
                                "warc_type": "request",
                                "target_uri": page,
                                "payload": b"GET / HTTP/1.1\r\n\r\n",
                            },
                            {
                                "warc_type": "response",
                                "target_uri": page,
                                "http_status": 200,
                                "body": (
                                    "<html><body>" + words + "</body></html>"
                                ).encode(),
                            },
                            {
                                "warc_type": "response",
                                "target_uri": f"http://site{eid % 50}.test/missing",
                                "http_status": 404,
                                "body": b"<html>gone</html>",
                            },
                        ]
                    )
                )
            yield pd.DataFrame(
                {"archive_id": pdf["archive_id"].values, "payload": payloads}
            )

    # fused: one Arrow stage — blobs stay inside the Python worker
    return warc_records(ev, pre=synth).select(
        F.col("archive_id").alias("id"),
        "target_uri",
        "http_status",
        "text",
        "n_body_bytes",
    )


# ---------------------------------------------------------------------------
# Triangle counting (operators/triangles.py): degree-ordered edge
# orientation → one wedge per triangle at its smallest vertex → one
# closure join. The oracle brute-forces the canonical 3-way join over
# the deduped undirected edge set — a completely different plan that
# must agree node-for-node.
# ---------------------------------------------------------------------------

_TRIANGLE_SQL = """
WITH e AS (
  SELECT DISTINCT LEAST(doc_id % 97, (doc_id // 97) % 97) AS a,
                  GREATEST(doc_id % 97, (doc_id // 97) % 97) AS b
  FROM documents
  WHERE doc_id % 97 <> (doc_id // 97) % 97
),
t AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM (
  SELECT x AS node FROM t
  UNION ALL SELECT y FROM t
  UNION ALL SELECT z FROM t
)
GROUP BY node
"""


@register("triangle_count_linkgraph", _TRIANGLE_SQL)
def triangle_count_linkgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation over the doc-derived link
    graph — the clustering signal web-graph curation pairs with
    PageRank. Orientation bounds wedge fan-out by √(2m), the hub
    guard that survives power-law graphs."""
    from ccgp_data_wrangling_spark.operators.triangles import (
        triangle_counts,
    )

    docs = load_table(spark, sf_dir, "documents")
    edges = docs.select(
        (F.col("doc_id") % 97).alias("src"),
        ((F.col("doc_id") / 97).cast("long") % 97).alias("dst"),
    )
    return triangle_counts(edges)


# ---------------------------------------------------------------------------
# Multi-source BFS link distance (operators/bfs.py): hop distance
# from a trusted seed set over the same doc-derived graph as the
# triangle query — the distance-to-seeds quality signal. The oracle
# is a recursive CTE taking MIN(dist) over all ≤ max_iter walks,
# a completely different evaluation strategy that must agree.
# ---------------------------------------------------------------------------

_BFS_SQL = """
WITH RECURSIVE e AS (
  SELECT doc_id % 97 AS a, (doc_id // 97) % 97 AS b FROM documents
  UNION
  SELECT (doc_id // 97) % 97 AS a, doc_id % 97 AS b FROM documents
),
walk (node, dist) AS (
  SELECT node, 0 FROM (VALUES (0), (1), (2)) v(node)
  UNION
  SELECT e.b, w.dist + 1
  FROM walk w JOIN e ON e.a = w.node
  WHERE w.dist < 6 AND e.a <> e.b
)
SELECT node, CAST(MIN(dist) AS INT) AS dist
FROM walk GROUP BY node
"""


@register("bfs_seed_distance", _BFS_SQL)
def bfs_seed_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance from seed nodes {0,1,2} over the undirected link
    graph, frontier rounds with one shuffle each."""
    from ccgp_data_wrangling_spark.operators.bfs import bfs_distances

    docs = load_table(spark, sf_dir, "documents")
    edges = docs.select(
        (F.col("doc_id") % 97).alias("src"),
        ((F.col("doc_id") / 97).cast("long") % 97).alias("dst"),
    )
    seeds = spark.range(3).select(F.col("id").alias("node"))
    out = bfs_distances(edges, seeds, max_iter=6)
    return out.select("node", F.col("dist").cast("int").alias("dist"))
