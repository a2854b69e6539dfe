"""Training-data preparation operators: sampling, packing, chunking,
train-order sharding, and benchmark decontamination.

These are the pipeline stages between "cleaned corpus" and "tokens on
a trainer": deterministic stratified sampling, context-window packing
(concat-and-chunk), overlapping document chunking, sharded shuffle
order, and n-gram contamination checks against an eval set. All are
pure Column/DataFrame compositions — no Python UDFs — so every stage
stays inside whole-stage codegen and scales with partition count.

Determinism policy: anything that needs "randomness" (sampling,
shuffle order) uses an arithmetic multiplicative hash over the row
key instead of rand(). Same inputs → same sample/order on any engine,
any partitioning, any retry — which is what makes 100 TB runs
reproducible and lets a SQL oracle state the same relation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Knuth's multiplicative constants (golden-ratio / Fibonacci hashing).
_KNUTH_A = 2654435761  # 2^32 / phi, the classic 32-bit multiplier
_KNUTH_B = 2246822519  # xxhash's PRIME32_2 — an independent mixer
_M32 = 4294967296  # 2^32
_M31 = 2147483648  # 2^31


def mult_hash(key: Column, multiplier: int = _KNUTH_A) -> Column:
    """Engine-portable multiplicative hash of an integer key → [0, 2^32).

    ``((key mod 2^31) * A) mod 2^32`` in pure BIGINT arithmetic: the
    product is < 2^31 * A < 2^63, so it never overflows 64-bit math on
    Spark, DuckDB, or any ANSI engine. For string keys at production
    scale prefer ``xxhash64`` (JVM-side, 64-bit avalanche); this form
    exists for cross-engine reproducibility of integer-keyed corpora.
    """
    return F.pmod(F.pmod(key.cast("bigint"), F.lit(_M31)) * F.lit(multiplier), F.lit(_M32))


def sample_bucket(key: Column, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) for rate-based sampling."""
    return F.pmod(mult_hash(key), F.lit(buckets))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    rates_pct: dict[str, int],
    *,
    default_pct: int = 100,
) -> DataFrame:
    """Keep a deterministic per-group percentage of rows.

    ``rates_pct`` maps group value → keep-percentage (0-100); groups
    absent from the map keep ``default_pct``. The keep decision is a
    pure filter on :func:`sample_bucket` — fully pushed down, no
    shuffle, no rand(): re-running at 100 TB reselects the exact same
    rows, and up-weighting a language is a one-line config change.
    (The down-sample-dominant-language stage of every big corpus mix.)
    """
    rate = F.lit(default_pct)
    for value, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(group_col) == value, F.lit(pct)).otherwise(rate)
    return df.where(sample_bucket(F.col(key_col)) < rate)


def pack_sequences(
    df: DataFrame,
    *,
    group_col: str,
    order_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Concat-and-chunk context packing: assign each document to a
    pack (context window) of ``budget`` tokens, filling packs in
    ``order_col`` order within each ``group_col`` stream.

    ``pack_id = floor(tokens_before / budget)`` — the standard
    pretraining layout where documents are concatenated per stream and
    the token stream is cut every ``budget`` tokens. A document is
    assigned to the pack where it STARTS; ``spill`` reports how many
    of its tokens overflow past that pack's boundary (0 when it fits).

    Scale: the cumulative sum is one window per group — groups
    (language × source shard) are processed in parallel, the sequential
    dependency is inherent to packing semantics. At 100 TB, pre-shard
    big groups (e.g. hash-bucket en into 1024 streams) so no single
    window partition exceeds executor memory.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    before = cum - F.col(token_col)
    pack_id = F.floor(before / budget).cast("long")
    boundary = (pack_id + 1) * budget
    return df.withColumns(
        {
            "pack_id": pack_id,
            "spill": F.greatest(cum - boundary, F.lit(0)).cast("long"),
        }
    )


def chunk_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    size: int,
    stride: int,
) -> DataFrame:
    """Split each document into overlapping fixed-width windows
    (``size`` chars every ``stride`` chars) — the retrieval/embedding
    chunking stage. One row in → ceil(max(len-size,0)/stride)+1 rows
    out via sequence+explode; substring stays JVM-side, so the fan-out
    is pure codegen with no Python in the loop.
    """
    n_chunks = (
        F.ceil(
            F.greatest(F.length(text_col) - size, F.lit(0)).cast("double") / stride
        ).cast("int")
        + 1
    )
    return (
        df.withColumn("__idx", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .select(
            id_col,
            F.col("__idx").alias("chunk_id"),
            F.substring(
                F.col(text_col), F.col("__idx") * stride + 1, size
            ).alias("chunk"),
        )
    )


def train_order(
    df: DataFrame, key_col: str, *, n_shards: int
) -> DataFrame:
    """Deterministic global shuffle for training: shard by one hash,
    order within each shard by an independent hash. Equivalent to a
    uniform random permutation delivered as ``n_shards`` independent
    files — which is how trainers actually consume it (each data-loader
    worker reads a shard sequentially). The per-shard row_number
    windows run in parallel; no global ordering bottleneck exists
    because no consumer needs one.
    """
    shard = F.pmod(mult_hash(F.col(key_col), _KNUTH_A), F.lit(n_shards))
    order = mult_hash(F.col(key_col), _KNUTH_B)
    w = Window.partitionBy("shard").orderBy("__ord", key_col)
    return (
        df.withColumns({"shard": shard.cast("int"), "__ord": order})
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("__ord")
    )


def contamination_pairs(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 5,
    min_shared: int = 2,
    max_gram_df: int | None = 1000,
) -> DataFrame:
    """Benchmark decontamination: find training docs sharing ≥
    ``min_shared`` distinct word n-grams with any benchmark doc.

    Inverted-index join on the gram (pairs exist only where a gram is
    shared — never all-pairs). ``max_gram_df`` drops grams that occur
    in more than that many TRAINING docs before the join: ubiquitous
    boilerplate grams are both useless contamination evidence and the
    classic skew bomb at scale (one stop-phrase gram joining 10^6 ×
    10^3 rows). The benchmark side is small by definition — broadcast.

    Returns (train_id, bench_id, n_shared).
    """
    from ccgp_data_wrangling_spark.operators.dedup import word_ngrams

    def grams(frame: DataFrame, out: str) -> DataFrame:
        return frame.select(
            F.col(id_col).alias(out),
            F.explode(word_ngrams(F.col(text_col), n=n)).alias("gram"),
        )

    tg = grams(train, "train_id")
    if max_gram_df is not None:
        common = (
            tg.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_gram_df)
            .select("gram")
        )
        tg = tg.join(F.broadcast(common), "gram", "left_anti")
    bg = grams(bench, "bench_id")
    return (
        tg.join(F.broadcast(bg), "gram")
        .groupBy("train_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def domain_mixture(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    *,
    id_col: str = "doc_id",
    group_col: str = "source",
    token_col: str = "n_tok",
    precision: int = 1_000_000,
) -> DataFrame:
    """Materialize a weighted domain mixture with replacement.

    Classic trainer-side mixing (fixed domain weights à la The
    Pile / Gopher): each group g should contribute
    ``weights[g] / Σweights × token_budget`` tokens. With repeat
    factor r_g = target_g / actual_g, every doc gets ``floor(r_g)``
    full copies plus one more iff its deterministic hash bucket (of
    ``precision``) falls below ``round(frac(r_g) · precision)`` — so
    up-sampling (r > 1: epoch repetition) and down-sampling (r < 1)
    come out of the same arithmetic, reproducibly on any engine, any
    partitioning, any retry. Groups absent from ``weights`` are
    dropped.

    Output: one row per materialized copy — (id, group, copy_idx
    1-based). Shape: one map-side-combined aggregate for the group
    totals (a domains-sized dim, broadcast back), then a pure
    projection + explode; no window, no rand(), no driver state.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    wsum = float(sum(weights.values()))
    w = F.lit(0.0)
    for g, wt in sorted(weights.items()):
        w = F.when(F.col(group_col) == g, F.lit(float(wt))).otherwise(w)
    totals = df.groupBy(group_col).agg(
        F.sum(F.col(token_col)).cast("double").alias("__tok")
    )
    r = (w / F.lit(wsum)) * F.lit(float(token_budget)) / F.col("__tok")
    dim = totals.select(
        group_col,
        F.floor(r).cast("long").alias("__full"),
        F.round((r - F.floor(r)) * precision, 0).alias("__thresh"),
    )
    n_copies = F.col("__full") + (
        F.pmod(mult_hash(F.col(id_col)), F.lit(precision)) < F.col("__thresh")
    ).cast("long")
    return (
        df.join(F.broadcast(dim), group_col)
        .withColumn("__n", n_copies)
        .where(F.col("__n") > 0)
        .select(
            id_col,
            group_col,
            F.explode(F.sequence(F.lit(1), F.col("__n"))).alias("copy_idx"),
        )
    )


def length_bucket_summary(
    df: DataFrame,
    *,
    n_buckets: int = 4,
    id_col: str = "doc_id",
    token_col: str = "n_tok",
) -> DataFrame:
    """Quantile length buckets + per-bucket padding waste.

    Batching docs of similar length is the classic padding-efficiency
    lever: a batch pads every sequence to its longest member, so
    mixing a 10-token doc into a 2000-token bucket wastes 1990 slots.
    Bucket boundaries are EXACT percentiles of ``token_col`` delivered
    as a scalar subquery — no global sort, no NTILE window over the
    corpus (the single-partition trap); assignment is a pure
    projection, and the summary is one hash aggregate.

    Returns (bucket 1-based, n_docs, min_tok, max_tok, sum_tok,
    padded_slots = max_tok·n_docs, waste_ratio).
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    probs = F.array(
        *[F.lit(i / n_buckets) for i in range(1, n_buckets)]
    )
    bounds = df.agg(F.percentile(F.col(token_col), probs).alias("q")).scalar()
    bucket = F.lit(1)
    for i in range(1, n_buckets):
        bucket = bucket + (
            F.col(token_col) > F.element_at(bounds, i)
        ).cast("int")
    assigned = df.select(
        id_col, token_col, bucket.alias("bucket")
    )
    return assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(token_col).alias("min_tok"),
        F.max(token_col).alias("max_tok"),
        F.sum(token_col).cast("long").alias("sum_tok"),
        (F.max(token_col) * F.count(F.lit(1))).cast("long").alias("padded_slots"),
        F.round(
            (F.max(token_col) * F.count(F.lit(1)) - F.sum(token_col)).cast("double")
            / (F.max(token_col) * F.count(F.lit(1))),
            4,
        ).alias("waste_ratio"),
    )


def quantile_bucket_sample(
    df: DataFrame,
    score_col: str,
    keep_pcts: list[int],
    *,
    key_col: str = "doc_id",
) -> DataFrame:
    """Quantile-bucket the corpus on ``score_col`` and keep a
    deterministic hash-sample of each bucket at ``keep_pcts[bucket]``
    percent — the mixing primitive behind perplexity-curriculum
    sampling (down-weight the degenerate tails, keep the middle).

    Buckets are equi-probability: boundaries are EXACT percentiles
    delivered as one scalar subquery (no NTILE / global sort);
    assignment is a projection. The sample is ``md5(key) % 100 <
    pct`` — reproducible on any partitioning, stable under corpus
    growth for surviving keys (a doc's fate never depends on other
    docs' arrival), and stratified by construction.

    Returns every row with ``bucket`` (1-based) and ``kept`` so
    callers can audit rates; filter on ``kept`` for the sample.
    """
    from ccgp_data_wrangling_spark.operators.sketches import _element_hash

    n_buckets = len(keep_pcts)
    if n_buckets < 2:
        raise ValueError("need at least 2 buckets")
    probs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    bounds = df.agg(F.percentile(F.col(score_col), probs).alias("q")).scalar()
    bucket = F.lit(1)
    for i in range(1, n_buckets):
        bucket = bucket + (F.col(score_col) > F.element_at(bounds, i)).cast(
            "int"
        )
    pct = F.element_at(
        F.array(*[F.lit(p) for p in keep_pcts]), F.col("bucket")
    )
    return df.withColumn("bucket", bucket).withColumn(
        "kept", F.pmod(_element_hash(F.col(key_col)), F.lit(100)) < pct
    )
