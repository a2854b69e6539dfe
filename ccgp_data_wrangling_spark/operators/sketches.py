"""Mergeable sketches: KMV cardinality, count-min frequency, binned
histogram quantiles.

At 100 TB, exact ``COUNT(DISTINCT ...)`` / exact heavy-hitter counts /
exact percentiles are shuffle-bound: distinct dedups every value,
global sort quantiles re-order the table. The sketch family trades a
deterministic, bounded error for *mergeable fixed-size partials* —
each executor reduces its partitions to a few KB, the merge is a tiny
shuffle, and the result composes across days/shards (union of KMV
sets, cell-wise sum of CMS, bin-wise sum of histograms).

Everything here is **deterministic** (seeded polynomial hashing, no
``rand()``): the same input produces the same estimate on any cluster
layout, so every operator carries an exact DuckDB oracle replaying the
identical arithmetic.

Reference parity note: the reference pipeline computes its summary
counts exactly in pandas (ccgp-data-wrangling ``utils/`` summary
helpers); exact variants live in queries/relational.py (A4, A7,
percentiles_by_flag). This module is the beyond-reference scale path
the brief asks for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "kmv_partial",
    "kmv_merge",
    "kmv_readout",
    "kmv_distinct",
    "kmv_set_overlap",
    "cms_sketch",
    "cms_merge",
    "cms_estimate",
    "binned_quantiles",
    "hll_partial",
    "hll_merge",
    "hll_readout",
    "hll_distinct",
    "heavy_hitters",
    "vhist_partial",
    "vhist_merge",
    "vhist_quantiles",
]

#: KMV hash space: 60 bits of md5 (15 hex digits), see _element_hash.
HASH_SPACE = 1 << 60

#: 31-bit reduction modulus for the CMS affine row hashes (Mersenne
#: prime 2^31-1): keeps a_i * h < 2^57, far from int64 overflow under
#: ANSI mode.
HASH_MOD = 2_147_483_647

#: pairwise-independent row seeds for the count-min sketch.
CMS_A = (1_299_709, 15_485_863, 32_452_843, 49_979_687)
CMS_B = (104_729, 1_299_721, 7_919, 611_953)


def _element_hash(value: Column) -> Column:
    """Deterministic uniform hash of a value's string form into
    1..2^60: the first 15 hex digits of md5, +1 so the KMV estimator
    never divides by zero.

    Min-value sketches need a *uniform* hash: the cheap base-31
    polynomial (functions/text.rolling_hash) leaves lattice structure
    that biased a KMV k=64 estimate of 5000 distinct values down to
    ~460 when tried here. md5 is uniform by construction, JVM-native
    in Spark, and bit-identical in the DuckDB oracle:
    ``CAST(('0x' || SUBSTR(md5(v), 1, 15)) AS BIGINT) + 1``.
    """
    return (
        F.conv(F.substring(F.md5(value.cast("string")), 1, 15), 16, 10)
        .cast("long")
        + F.lit(1)
    )


# ---------------------------------------------------------------------------
# KMV (k minimum values) distinct-cardinality sketch
# ---------------------------------------------------------------------------

def kmv_partial(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    k: int = 64,
    merge_fanin: int = 16,
) -> DataFrame:
    """``(group, kmin)`` sketch partials: the k smallest distinct
    hashes per group, as a sorted long array.

    Scale shape: a two-level combine. Level 1 groups on
    ``(group, hash % merge_fanin)`` so every partial is truncated to
    ``k`` values *before* the group-wide merge — the level-2 shuffle
    carries at most ``merge_fanin * k`` longs per group regardless of
    input size. The salt buckets partition the hash space, so their
    k-min arrays are disjoint and concatenation needs no re-dedup.

    The ``(group, kmin)`` frame is the sketch's wire format: persist
    it per shard/day and fold new data in with :func:`kmv_merge` —
    the 100 TB pattern where yesterday's corpus is never rescanned.
    """
    hashed = df.select(
        F.col(group_col).alias("g"),
        _element_hash(F.col(value_col)).alias("h"),
    ).distinct()
    partial = (
        hashed.groupBy("g", F.pmod("h", F.lit(merge_fanin)).alias("salt"))
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("part"))
    )
    return partial.groupBy("g").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("part"))), 1, k
        ).alias("kmin")
    )


def kmv_merge(partials: list[DataFrame], *, k: int = 64) -> DataFrame:
    """Merge ``(g, kmin)`` partial frames: union of the hash sets,
    re-truncated to the k minimum. Associative and commutative —
    sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly, which is
    what lets partials from different shards, days, or micro-batches
    compose without revisiting data. ``array_distinct`` dedups hashes
    the inputs may share (partials built over overlapping data).
    """
    u = partials[0]
    for p in partials[1:]:
        u = u.unionByName(p)
    return u.groupBy("g").agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmin")))),
            1,
            k,
        ).alias("kmin")
    )


def _kmin_estimate(kmin: Column, k: int) -> Column:
    """Cardinality estimate from a sorted k-min array: exact below k,
    else ``floor((k-1) * M / h_k)`` as a long."""
    n_seen = F.size(kmin)
    numerator = float((k - 1) * HASH_SPACE)
    return F.when(n_seen < k, n_seen.cast("long")).otherwise(
        F.floor(F.lit(numerator) / F.element_at(kmin, k))
    )


def kmv_readout(merged: DataFrame, group_col: str, *, k: int = 64) -> DataFrame:
    """Estimate from a ``(g, kmin)`` frame.

    Estimator: with fewer than ``k`` distinct hashes the sketch is
    exact; otherwise ``(k-1) * M / h_k`` where ``h_k`` is the k-th
    smallest hash over the space ``M`` (Bar-Yossef et al. 2002).

    The division runs in *double* space — ``(k-1) * 2^60`` overflows
    int64 — then floors: the numerator has 6 significant bits (exactly
    representable), IEEE division is deterministic, and an explicit
    ``floor`` on both engines avoids the cast asymmetry where
    double-to-long ROUNDS in DuckDB but TRUNCATES in Spark.
    """
    n_seen = F.size("kmin")
    h_k = F.element_at("kmin", k)
    return merged.select(
        F.col("g").alias(group_col),
        _kmin_estimate(F.col("kmin"), k).alias("distinct_est"),
        n_seen.alias("sketch_size"),
        F.when(n_seen < k, F.lit(None).cast("long"))
        .otherwise(h_k)
        .alias("kth_hash"),
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    k: int = 64,
    merge_fanin: int = 16,
) -> DataFrame:
    """One-shot per-group distinct-count estimate:
    ``kmv_readout(kmv_partial(df))``.
    """
    return kmv_readout(
        kmv_partial(df, group_col, value_col, k=k, merge_fanin=merge_fanin),
        group_col,
        k=k,
    )


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

def _cms_col(h: Column, row: int, width: int) -> Column:
    """Column index of hash ``h`` in CMS row ``row``.

    ``h`` is first reduced mod 2^31-1 so the affine ``a*h + b`` stays
    below 2^57 (ANSI int64 overflow headroom).
    """
    hc = F.pmod(h, F.lit(HASH_MOD))
    return F.pmod(
        F.pmod(hc * CMS_A[row] + CMS_B[row], F.lit(HASH_MOD)), F.lit(width)
    )


def kmv_set_overlap(pa: DataFrame, pb: DataFrame, *, k: int = 64) -> DataFrame:
    """Set-algebra on two single-group ``(g, kmin)`` partials:
    estimated |A|, |B|, |A ∪ B|, Jaccard, and |A ∩ B|.

    KMV closure under union is what makes this work: the k smallest
    of ``kmin_a ∪ kmin_b`` IS the sketch of A ∪ B, and the fraction of
    that union sketch present in BOTH side sketches is an unbiased
    Jaccard estimate (Beyer et al., SIGMOD 2007);
    ``|A ∩ B| ≈ J · |A ∪ B|``. The practical use at corpus scale:
    "how much does shard X overlap shard Y" answered from two
    kilobyte sketches without a join over the data.

    ``pa`` rides along as a lazy scalar subquery (DataFrame.scalar,
    Spark 4) rather than a 1×1 join — no join node in the plan at
    all.
    """
    joined = pb.select(
        pa.select(F.col("kmin")).scalar().alias("kmin_a"),
        F.col("kmin").alias("kmin_b"),
    )
    union_arr = F.slice(
        F.array_sort(F.array_distinct(F.concat("kmin_a", "kmin_b"))), 1, k
    )
    out = joined.select(
        _kmin_estimate(F.col("kmin_a"), k).alias("est_a"),
        _kmin_estimate(F.col("kmin_b"), k).alias("est_b"),
        union_arr.alias("u"),
        F.size(
            F.array_intersect(
                F.array_intersect(union_arr, F.col("kmin_a")),
                F.col("kmin_b"),
            )
        ).alias("n_shared"),
    )
    union_est = _kmin_estimate(F.col("u"), k)
    j = F.col("n_shared") / F.size("u")
    return out.select(
        "est_a",
        "est_b",
        union_est.alias("est_union"),
        F.round(j, 4).alias("jaccard_est"),
        F.floor(j * union_est).alias("est_intersection"),
    )


def cms_sketch(
    items: DataFrame,
    item_col: str,
    weight_col: str,
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(row, col, cell) count-min sketch of weighted items.

    ``depth * width`` cells total — the groupBy is map-side combining,
    so each task emits at most ``depth * width`` rows no matter how
    many items it saw; the sketch is additive (cell-wise sum) across
    shards and time windows.
    """
    h = _element_hash(F.col(item_col))
    rows = [
        items.select(
            F.lit(r).alias("row"),
            _cms_col(h, r, width).alias("col"),
            F.col(weight_col).alias("w"),
        )
        for r in range(depth)
    ]
    cells = rows[0]
    for r in rows[1:]:
        cells = cells.unionAll(r)
    return cells.groupBy("row", "col").agg(F.sum("w").alias("cell"))


def cms_merge(sketches: list[DataFrame]) -> DataFrame:
    """Merge CMS sketches: cell-wise sum. The sketch is a linear
    projection of the frequency vector, so
    ``sketch(A ⊎ B) == merge(sketch(A), sketch(B))`` exactly.
    """
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("row", "col").agg(F.sum("cell").alias("cell"))


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    item_col: str,
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch: min over rows of the addressed cells.

    ``candidates`` is expected to be small (a heavy-hitter shortlist);
    the join broadcasts it against the ≤ depth*width-row sketch, so
    the estimate step is constant-size regardless of corpus size.
    """
    h = _element_hash(F.col(item_col))
    addressed = candidates.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_col(h, r, width).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("addr"),
    ).select(item_col, "addr.row", "addr.col")
    return (
        addressed.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(item_col)
        .agg(F.min("cell").alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram quantiles
# ---------------------------------------------------------------------------

def binned_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    width: float,
    quantiles: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """Approximate per-group quantiles from a fixed-width histogram.

    The histogram (``floor(value / width)`` bins) is a mergeable
    map-side-combining aggregate: each task emits one row per
    non-empty bin. The quantile readout takes, for probability q, the
    lower edge of the first bin whose cumulative count reaches
    ``ceil(q * n)`` — deterministic, error bounded by ``width``.

    The per-group cumulative window runs over *bins*, not rows:
    ``values_range / width`` rows per group, independent of data
    volume — the reason this survives 100 TB where an exact
    percentile's global sort does not.
    """
    bins = (
        df.select(
            F.col(group_col).alias("g"),
            F.floor(F.col(value_col) / width).alias("bin"),
        )
        .groupBy("g", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy("bin")
    cum = bins.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "total", F.sum("cnt").over(Window.partitionBy("g"))
    )
    aggs = []
    for q in quantiles:
        target = F.ceil(F.lit(q) * F.col("total"))
        aggs.append(
            F.round(
                F.min(
                    F.when(F.col("cum") >= target, F.col("bin") * width)
                ),
                4,
            ).alias(f"approx_p{int(q * 100)}")
        )
    return cum.groupBy(F.col("g").alias(group_col)).agg(
        *aggs, F.max("total").alias("n")
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct-cardinality sketch
# ---------------------------------------------------------------------------

#: register-index bits: m = 2^HLL_P registers per group (m=256 → ~6.5%
#: standard error, 256 rows of mergeable state per group).
HLL_P = 8

#: rho cap. Capping the leading-zero rank at 40 keeps every 2^-rho
#: term exactly representable in the 2^40-scaled INTEGER zsum (terms
#: become 1 << (40-rho), ≤ 2^39; 256 of them < 2^48), making the
#: register sum order-independent — a bare double Σ2^-rho would be
#: partition-order-dependent at the ulp. A cap of 40 biases nothing
#: real: reaching rho=40 honestly needs ~2^40 distinct values PER
#: REGISTER (~10^14 total), far past the sketch's useful range.
HLL_RHO_CAP = 40

#: slots for the register index + value inside the packed merge key.
_HLL_VALUE_BITS = 60 - HLL_P


def _hll_rho(rest: Column) -> Column:
    """Leading-zero rank of a ``_HLL_VALUE_BITS``-wide value: position
    of the highest set bit from the top, + 1. ``bin()`` (minimal
    binary string, identical semantics in Spark and DuckDB — bin(0) =
    '0') gives the bit length; rest == 0 means all bits zero, rank =
    width + 1."""
    bitlen = F.when(rest == 0, F.lit(0)).otherwise(F.length(F.bin(rest)))
    return F.least(
        F.lit(_HLL_VALUE_BITS) - bitlen + 1, F.lit(HLL_RHO_CAP)
    )


def hll_partial(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group HLL register table: ≤ 2^HLL_P rows per group of
    ``(group, register, rho)``.

    The 60-bit md5 hash splits into a register index (low HLL_P bits)
    and a value (high 60-HLL_P bits) whose leading-zero rank is the
    register's candidate; MAX(rho) per register is the whole state.
    The aggregate is a map-side-combining groupBy on (group,
    register) — fixed ≤ m·|groups| rows out of every executor
    regardless of input size, the defining property of the sketch.

    Merging across shards/days is ``hll_merge``: the same MAX over the
    unioned register tables. Reference parity: the reference counts
    distincts exactly in pandas (utils/ summary helpers); this is the
    beyond-reference scale path.
    """
    h = _element_hash(F.col(value_col)) - 1  # 0 .. 2^60-1 uniform
    # bit ops, not arithmetic: h exceeds 2^53, so any double-typed
    # division would silently round the register payload
    return (
        df.select(
            F.col(group_col).alias("g"),
            h.bitwiseAND(F.lit((1 << HLL_P) - 1)).cast("int").alias("register"),
            F.shiftright(h, HLL_P).alias("rest"),
        )
        .withColumn("rho", _hll_rho(F.col("rest")))
        .groupBy("g", "register")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(partials: list[DataFrame]) -> DataFrame:
    """Merge register tables from shards: MAX(rho) per (g, register)."""
    out = partials[0]
    for p in partials[1:]:
        out = out.unionByName(p)
    return out.groupBy("g", "register").agg(F.max("rho").alias("rho"))


def hll_readout(partial: DataFrame, group_col: str) -> DataFrame:
    """Cardinality estimate per group from a register table.

    Standard HLL estimator with the small-range (linear counting)
    correction: raw = α_m · m² / Z where Z = Σ_j 2^-rho_j over all m
    registers (absent registers contribute 2^0 = 1); if raw ≤ 2.5m
    and empty registers exist, use m·ln(m/V) instead (V = empty
    count). Z is accumulated as an exact 2^40-scaled integer (see
    HLL_RHO_CAP) so the estimate is bit-identical on any partition
    layout; ln is rounded to 6 dp before use (libm-proof, repo-wide
    policy) and the estimate to 2 dp.
    """
    m = 1 << HLL_P
    alpha = 0.7213 / (1.0 + 1.079 / m)  # standard bias constant, m ≥ 128
    scaled = F.expr(f"shiftleft(1L, {HLL_RHO_CAP} - rho)")
    agg = partial.groupBy(F.col("g").alias(group_col)).agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(scaled).alias("z_present_s"),
    )
    zeros = F.lit(m) - F.col("n_present")
    z_s = F.col("z_present_s") + F.shiftleft(zeros.cast("long"), HLL_RHO_CAP)
    raw = F.lit(alpha * m * m * float(1 << HLL_RHO_CAP)) / z_s
    linear = F.lit(m) * F.round(
        F.log(F.lit(float(m)) / zeros.cast("double")), 6
    )
    est = F.when((raw <= 2.5 * m) & (zeros > 0), linear).otherwise(raw)
    return agg.select(group_col, F.round(est, 2).alias("est_distinct"))


def hll_distinct(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """One-shot per-group approximate COUNT DISTINCT via HLL."""
    return hll_readout(hll_partial(df, group_col, value_col), group_col)


# ---------------------------------------------------------------------------
# Heavy hitters: deterministic sampled prefilter + exact verify
# ---------------------------------------------------------------------------

def heavy_hitters(
    df: DataFrame,
    value_col: str,
    row_key_col: str,
    *,
    threshold_frac: float = 0.0075,
    sample_mod: int = 4,
    slack: float = 0.5,
) -> DataFrame:
    """Values appearing in ≥ ``threshold_frac`` of rows, with exact
    final counts — via a deterministic row-sample prefilter.

    The classic streaming answers (Misra-Gries, SpaceSaving) keep
    per-partition state whose content depends on arrival order —
    unusable under this engine's layout-independence policy. Instead:

    1. **Prefilter**: count values over the deterministic row sample
       ``hash(row_key) % sample_mod == 0`` (md5 — layout-independent,
       unlike rand() or per-partition reservoirs). A true heavy
       hitter with t·N rows has binomial-concentrated sample count
       ≈ t·N/mod; candidates keep everything above ``slack``× the
       scaled threshold, so the pass-2 miss probability decays
       exponentially in t·N/mod (Chernoff: < exp(-t·N/8/mod) per
       value at slack=0.5).
    2. **Verify**: exact groupBy count restricted (semi-join) to
       candidate values; filter at the true threshold.

    Scale: pass 1 shuffles N/mod rows of partial counts; pass 2
    shuffles only rows belonging to candidates (≤ 2/(t·slack) values
    by a counting bound). The full-table groupBy it replaces shuffles
    a partial count for every distinct value — the long tail this
    operator exists to drop.

    Oracle-able: every step (md5 sample, scaled threshold, semi-join,
    exact count) replays verbatim in SQL, so parity holds even for
    the (never observed at these parameters) prefilter-miss case.

    NULL-safe: a NULL heavy-hitter *value* survives (the semi-join is
    ``eqNullSafe``, matching the full groupBy this operator replaces),
    and NULL *row keys* still enter the sample (hash input coalesced
    to a sentinel) rather than silently falling out of pass 1.
    """
    total = df.count()  # one lightweight count job, parquet-stat fast
    threshold = max(1, int(threshold_frac * total))
    sampled_floor = int(slack * threshold / sample_mod)
    sampled = df.where(
        F.pmod(
            _element_hash(F.coalesce(F.col(row_key_col).cast("string"),
                                     F.lit("<NULL>"))),
            F.lit(sample_mod),
        )
        == 0
    )
    cands = (
        sampled.groupBy(F.col(value_col).alias("__hh_cand"))
        .agg(F.count(F.lit(1)).alias("c_sample"))
        .where(F.col("c_sample") >= sampled_floor)
        .select("__hh_cand")
    )
    return (
        df.join(
            F.broadcast(cands),
            F.col(value_col).eqNullSafe(F.col("__hh_cand")),
            "left_semi",
        )
        .groupBy(F.col(value_col).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= threshold)
    )


# ---------------------------------------------------------------------------
# Value-keyed histogram digest (mergeable quantiles without a range)
# ---------------------------------------------------------------------------

def vhist_partial(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    scale: int = 100,
) -> DataFrame:
    """``(g, v_s, cnt)`` digest: counts per value rounded to
    1/``scale`` (scaled to exact integers).

    The mergeable quantile state for bounded-resolution metrics:
    unlike ``binned_quantiles`` it needs NO a-priori range (keys are
    the values themselves), merges by summing counts, and reads out
    EXACT quantiles of the rounded distribution. State size is the
    number of distinct rounded values — bounded for anything
    physically bounded (latencies, prices, scores), which is when to
    use it; unbounded-cardinality values belong in binned/KLL
    territory.
    """
    v_s = F.round(F.col(value_col) * scale, 0).cast("long")
    return (
        df.select(F.col(group_col).alias("g"), v_s.alias("v_s"))
        .groupBy("g", "v_s")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def vhist_merge(partials: list[DataFrame]) -> DataFrame:
    """Merge digests: sum counts per (g, v_s)."""
    u = partials[0]
    for p in partials[1:]:
        u = u.unionByName(p)
    return u.groupBy("g", "v_s").agg(F.sum("cnt").alias("cnt"))


def vhist_quantiles(
    digest: DataFrame,
    group_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    *,
    scale: int = 100,
) -> DataFrame:
    """Exact lower-quantiles of the rounded distribution per group:
    smallest v with cum(v) ≥ ceil(q·n). One window over the digest
    (distinct values per group — digest-sized, not data-sized).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("g")
        .orderBy("v_s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("g")
    cum = digest.select(
        "g",
        "v_s",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wt).alias("total"),
    )
    out_cols = [F.col("g").alias(group_col), F.max("total").alias("n")]
    aggs = []
    for q in qs:
        name = f"p{int(q * 100)}"
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") >= F.ceil(F.lit(q) * F.col("total")),
                    F.col("v_s"),
                )
            ).alias(name)
        )
    res = cum.groupBy("g").agg(F.max("total").alias("n"), *aggs)
    sel = [F.col("g").alias(group_col), F.col("n").cast("long").alias("n")]
    for q in qs:
        name = f"p{int(q * 100)}"
        sel.append((F.col(name) / float(scale)).alias(name))
    return res.select(*sel)
