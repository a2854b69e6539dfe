"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exact baseline
  (queries/llm_ops.py:knn_top10_cosine carries the DuckDB oracle)
* SRP-LSH (signed random projections) bucketed search — the scale
  path: hash each vector to ``n_bits`` sign bits per table; a query
  probes only its buckets, turning a full-scan re-rank into a
  candidate re-rank.

Dot products / norms are ``zip_with``+``aggregate`` Column
expressions (JVM-side). Projection planes are seeded and embedded as
nested array literals — deterministic across runs.

Scale notes: corpus signatures are computed in ONE narrow scan (all
tables at once), no shuffle; the probe filter prunes before the
exact re-rank, and the final top-k is a rank over ≤ candidates.
For a persisted 100 TB corpus you'd write the bucketed table
partitioned by (table, bucket) so a query is partition-pruned I/O,
and periodically rebuild signatures as vectors churn.
"""

from __future__ import annotations

import random
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _seeded_planes(
    n_tables: int, n_bits: int, dim: int, seed: int
) -> list[list[list[float]]]:
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]
        for _ in range(n_tables)
    ]


def _planes_lit(planes: list[list[float]]) -> Column:
    return F.array(
        *[F.array(*[F.lit(float(w)) for w in p]) for p in planes]
    )


def srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket id (one sign bit per plane).

    The sign bits and the bit-packing are ONE expression pass: packing
    via per-plane powers inside the same transform, then a single sum
    fold. (Referencing a bits-array subexpression once per bit would
    let projection collapse duplicate the n_bits dot products n_bits
    times — interpreted HOFs make that an O(n_bits²·dim) per-row cost.)
    """
    bits = F.transform(
        _planes_lit(planes),
        lambda p: F.when(
            F.aggregate(
                F.zip_with(vec, p, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    # positional fold: first plane = most-significant bit; _py_bucket
    # mirrors this convention for the query side
    return F.aggregate(
        bits, F.lit(0).cast("long"), lambda acc, b: acc * 2 + b
    )


def _py_bucket(query_vec: list[float], planes: list[list[float]]) -> int:
    """Driver-side twin of :func:`srp_bucket` (same MSB-first fold)."""
    b = 0
    for plane in planes:
        bit = 1 if sum(x * w for x, w in zip(query_vec, plane)) >= 0 else 0
        b = b * 2 + bit
    return b


def cosine_sim(a: Column, b: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def _ranked_topk(scored: DataFrame, k: int, id_col: str) -> DataFrame:
    """Deterministic top-k with a rank column, scale-safe.

    orderBy+limit compiles to TakeOrderedAndProject (each partition
    keeps a local top-k, the driver merges) — a global row_number
    window would instead move EVERY scored row to one partition. The
    rank window afterwards only ever sees k rows.
    """
    order = [F.desc("cos_sim"), F.asc(id_col)]
    top = scored.orderBy(*order).limit(k)
    return top.withColumn("rank", F.row_number().over(W.orderBy(*order)))


def ann_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 8,
    n_bits: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k by cosine.

    One scan computes every table's bucket for each vector; a vector
    is a candidate if ANY table agrees with the query's bucket; exact
    cosine re-ranks candidates. Recall grows with n_tables, candidate
    count shrinks with n_bits.
    """
    tables = _seeded_planes(n_tables, n_bits, len(query_vec), seed)
    q_buckets = [_py_bucket(query_vec, t) for t in tables]
    v = F.col(vec_col).cast("array<double>")

    hit = reduce(
        lambda a, b: a | b,
        [srp_bucket(v, planes) == qb for planes, qb in zip(tables, q_buckets)],
    )
    cand = emb.where(hit)

    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = cand.select(
        id_col,
        F.round(cosine_sim(v, qcol), 4).alias("cos_sim"),
    )
    return _ranked_topk(scored, k, id_col)


def brute_force_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k (the recall baseline for ann_topk)."""
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb.select(
        id_col,
        F.round(cosine_sim(F.col(vec_col).cast("array<double>"), qcol), 4).alias(
            "cos_sim"
        ),
    )
    return _ranked_topk(scored, k, id_col)


def _sample_centroids(
    emb: DataFrame, id_col: str, vec_col: str, n_centroids: int, seed: int
) -> list[list[float]]:
    """Deterministic coarse-quantizer centroids: the corpus rows
    minimizing ``xxhash64(id, seed)`` — a seeded uniform sample with
    no RNG state, bounded collect (n_centroids rows)."""
    rows = (
        emb.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .withColumn("hk", F.xxhash64(F.col(id_col), F.lit(seed)))
        .orderBy("hk")
        .limit(n_centroids)
        .collect()
    )
    return [[float(x) for x in r.v] for r in rows]


def _centroid_lit(centroids: list[list[float]]) -> Column:
    """(idx, vector) struct-array literal — rides into executors inside
    the plan, broadcast-equivalent, no shuffle."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("idx"),
                F.array(*[F.lit(float(x)) for x in c]).alias("cv"),
            )
            for i, c in enumerate(centroids)
        ]
    )


def _assign_centroid(v: Column, cent_lit: Column) -> Column:
    """Nearest-centroid index by cosine, lowest-index tie-break.

    argmax via array_max over (sim, -idx) structs: each centroid's
    cosine is evaluated ONCE inside the transform (a when/otherwise
    fold would evaluate it twice — condition + selected value).
    """
    best = F.array_max(
        F.transform(
            cent_lit,
            lambda c: F.struct(
                cosine_sim(v, c["cv"]).alias("sim"), (-c["idx"]).alias("nidx")
            ),
        )
    )
    return -best["nidx"]


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 32,
    n_probe: int = 8,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k by cosine.

    Coarse quantizer: ``n_centroids`` centroids drawn deterministically
    from the corpus itself (rows minimizing xxhash64(id, seed) — a
    seeded uniform sample with no RNG state). Every vector is assigned
    to its nearest centroid by cosine; a query probes the ``n_probe``
    centroids nearest to IT and exact-cosine re-ranks only vectors
    assigned there.

    Scale: the centroid table is tiny and rides into the executors as
    expression literals (broadcast-equivalent, no shuffle). At 100 TB
    the assignment is precomputed once and the corpus PERSISTED
    partitioned by ``centroid_id`` so a query's scan is partition-pruned
    to n_probe/n_centroids of the data; here the assignment is computed
    inline in the same scan. Assignment cost is O(n_centroids·dim) per
    row of JVM codegen arithmetic, shuffle-free.
    """
    centroids = _sample_centroids(emb, id_col, vec_col, n_centroids, seed)

    def _py_cos(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dot / (na * nb) if na and nb else 0.0

    probe = sorted(
        range(len(centroids)),
        key=lambda c: (-_py_cos(query_vec, centroids[c]), c),
    )[:n_probe]

    v = F.col(vec_col).cast("array<double>")
    cent_lit = _centroid_lit(centroids)
    assigned = _assign_centroid(v, cent_lit)

    cand = emb.withColumn("centroid_id", assigned).where(
        F.col("centroid_id").isin(*probe)
    )
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = cand.select(
        id_col,
        F.round(cosine_sim(v, qcol), 4).alias("cos_sim"),
    )
    return _ranked_topk(scored, k, id_col)


def ivf_topk_multi(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
    n_centroids: int = 32,
    n_probe: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Batch IVF retrieval: top-k corpus neighbors for EVERY row of a
    query DataFrame, in one distributed plan — the multi-query layout
    the single-query :func:`ivf_topk` docstring promises at 100 TB,
    with no per-query driver loop.

    Shape:

    1. coarse quantizer = the same deterministic corpus sample as
       ``ivf_topk`` (tiny, inlined as literals);
    2. corpus rows assign to their nearest centroid (pure codegen
       arithmetic, shuffle-free);
    3. each QUERY row computes its ``n_probe`` nearest centroids as an
       array Column (sorted (−sim, idx) structs — same ordering as the
       single-query driver-side probe) and explodes to
       ``(query_id, centroid)`` probe rows;
    4. probes equi-join the assigned corpus on the centroid id —
       candidate volume per query is the occupancy of its probed
       cells, never |corpus|;
    5. exact cosine re-rank per query via a per-key window (millions
       of small ``query_id`` partitions — the scalable direction; no
       global sort).

    At 100 TB the assigned corpus is PERSISTED partitioned by
    ``centroid_id`` (write once), making step 4 a partition-pruned
    scan; here assignment runs inline in the same job. Output:
    ``(query_id, id, cos_sim, rank)`` with rank 1..k per query.
    """
    centroids = _sample_centroids(emb, id_col, vec_col, n_centroids, seed)
    cent_lit = _centroid_lit(centroids)

    v = F.col(vec_col).cast("array<double>")
    corpus = emb.select(
        id_col, v.alias("__v"), _assign_centroid(v, cent_lit).alias("__centroid")
    )

    qv = F.col(query_vec_col).cast("array<double>")
    # per-query probe list: ascending sort on (−sim, idx) structs ==
    # descending sim with lowest-index tie-break, then keep n_probe
    probe_arr = F.slice(
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
        n_probe,
    )
    qp = queries.select(
        query_id_col,
        qv.alias("__qv"),
        F.explode(F.transform(probe_arr, lambda p: p["idx"])).alias("__centroid"),
    )

    scored = qp.join(corpus, "__centroid").select(
        query_id_col,
        id_col,
        F.round(cosine_sim(F.col("__v"), F.col("__qv")), 4).alias("cos_sim"),
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def jl_project(
    df: DataFrame,
    vec_col: str,
    *,
    dim: int,
    out_dim: int = 16,
    seed: int = 7,
) -> list[Column]:
    """Johnson–Lindenstrauss random projection: ``out_dim`` Columns
    ``y00..`` projecting ``vec_col`` (width ``dim``) onto seeded
    Gaussian directions, scaled by 1/√out_dim.

    The cheap, distribution-free dimensionality reduction an embedding
    pipeline runs before clustering / dedup at scale: distances are
    preserved within (1±ε) w.h.p., and the projection is a pure
    per-row Column expression — O(out_dim·dim) arithmetic, no shuffle,
    no model state beyond the seeded literal matrix (out_dim·dim
    doubles, inlined into the plan exactly like the SRP planes).

    Returns the projection Columns (rounded to 6 dp) so callers
    compose them into their own select.
    """
    import math

    planes = _seeded_planes(1, out_dim, dim, seed)[0]
    v = F.col(vec_col).cast("array<double>")
    scale = 1.0 / math.sqrt(out_dim)
    out = []
    for i, row in enumerate(planes):
        r = F.array(*[F.lit(float(w)) for w in row])
        dot = F.aggregate(
            F.zip_with(v, r, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out.append(F.round(dot * scale, 6).alias(f"y{i:02d}"))
    return out
