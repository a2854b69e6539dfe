"""Mergeable Bloom-filter sketch + Bloom-prefiltered join reduction.

At 100 TB the dominant join cost is the shuffle of the probe (fact)
side. When the build side is selective — a filtered dimension, a
qualifying keyset — most probe rows will not survive the join, yet a
plain shuffle join ships every one of them. Spark's own optimizer
injects runtime bloom filters for exactly this reason
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, Spark ≥ 3.3);
this module makes the pattern an explicit, *mergeable* operator so it
also composes across shards/days like the sketch family
(operators/sketches.py) and can be persisted as a table-level
"key digest" for incremental pipelines.

Design (scale shape):

* ``bloom_sketch`` reduces the build side to ``(word_idx, word)``
  rows — at most ``num_bits/64`` longs (16 KiB at the default 2^17
  bits) — via a map-side-combining ``bit_or`` aggregate. No driver
  loop touches build rows; the only driver transfer is the ≤ 2048-row
  sketch itself.
* ``bloom_merge`` is a cell-wise ``bit_or`` — associative and
  commutative, so sketch(A ∪ B) == merge(sketch(A), sketch(B)) and
  per-shard digests fold without rescans.
* ``bloom_contains`` compiles the membership test into a pure Column
  predicate over a literal word array: no join, no shuffle, evaluated
  inside whole-stage codegen at the parquet scan. False positives are
  possible (bounded by the standard (1-e^{-kn/m})^k rate), false
  negatives are not — so a Bloom *prefilter* before a real join never
  changes the join's result, only its shuffle volume.

Determinism: positions come from ``xxhash64(key, seed_i)`` (JVM
xxhash, fixed seeds) — the same input yields the same sketch on any
partitioning, which keeps prefiltered queries exactly
oracle-comparable (the oracle simply runs the unfiltered join).

Reference parity: the reference's membership prefilters are Python
set lookups built from full collection scans
(``update_projectID_reads_col.py:38-40``,
``utils/check_if_mongo_files_in_aws.py:49-63``) — the same
"restrict the big side by a keyset" intent, driver-resident and
exact; this is its bounded-memory, cluster-shaped analogue.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "bloom_sketch",
    "bloom_merge",
    "bloom_words",
    "bloom_contains",
    "bloom_prefilter_join",
]

#: default filter size: 2^17 bits = 2048 longs = 16 KiB.
DEFAULT_NUM_BITS = 1 << 17

#: default number of hash probes per key.
DEFAULT_NUM_HASHES = 5


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The k bit positions of ``key``: pmod(xxhash64(key, seed_i), m).

    Seeding with a second literal column makes the k probes
    independent while staying inside the one JVM-native hash.
    """
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits)) for i in range(num_hashes)
    ]


def bloom_sketch(
    df: DataFrame,
    key_col: str,
    *,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Reduce ``df[key_col]`` to a ``(word_idx, word)`` Bloom digest.

    Only words with at least one set bit are emitted (sparse wire
    format); the aggregate combines map-side, so each task ships at
    most ``num_bits/64`` rows to the final ``bit_or`` reduce.
    """
    key = F.col(key_col)
    pos = F.explode(F.array(*_positions(key, num_bits, num_hashes))).alias("pos")
    return (
        df.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_merge(partials: list[DataFrame]) -> DataFrame:
    """Cell-wise OR of sparse digests: the union filter."""
    if not partials:
        raise ValueError("bloom_merge needs at least one partial")
    out = partials[0]
    for p in partials[1:]:
        out = out.unionByName(p)
    return out.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


def bloom_words(sketch: DataFrame, *, num_bits: int = DEFAULT_NUM_BITS) -> list[int]:
    """Densify a sparse ``(word_idx, word)`` digest into the full word
    list. The collect is bounded by the filter size (≤ num_bits/64
    rows ≈ 16 KiB at defaults) — a constant, never data-sized.
    """
    n_words = num_bits // 64
    words = [0] * n_words
    for row in sketch.collect():
        words[row["word_idx"]] = row["word"]
    return words


def bloom_contains(
    key: Column,
    words: list[int],
    *,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> Column:
    """Membership predicate: all k probed bits set.

    Compiles to element_at over a literal long array + bit tests —
    a pure codegen expression, pushed to the scan stage; no join.
    """
    arr = F.array(*[F.lit(int(w)).cast("long") for w in words])
    cond = F.lit(True)
    for pos in _positions(key, num_bits, num_hashes):
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        cond = cond & _bit_is_set(word, pos % 64)
    return cond


def _bit_is_set(word: Column, bit: Column) -> Column:
    """(word >> bit) & 1 == 1 with a variable shift (ANSI-safe)."""
    # shiftright in the python API only takes a literal shift; go
    # through the SQL function with Column args.
    return (
        F.call_function("shiftright", word, bit.cast("int")).bitwiseAND(F.lit(1)) == 1
    )


def bloom_prefilter_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    *,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
    how: str = "inner",
) -> DataFrame:
    """``probe ⋈ build`` with a Bloom prefilter on the probe side.

    Result is identical to the plain join (no false negatives); the
    shuffle carries only probe rows whose key *might* be in build —
    for a 1%-selective build side that is a ~99% shuffle reduction at
    the cost of one 16 KiB broadcast-equivalent literal.

    Only ``inner`` and ``left_semi`` are accepted: those are the join
    types where dropping never-matching probe rows is semantics-
    preserving. For left/full/anti joins the prefilter would remove
    probe rows that must survive with nulls (or satisfy the anti
    condition), so they are rejected rather than silently wrong.
    """
    if how not in ("inner", "left_semi", "semi", "leftsemi"):
        raise ValueError(
            "bloom_prefilter_join preserves semantics only for "
            f"inner/left_semi joins, got how={how!r}; use a plain join "
            "for outer/anti types"
        )
    sketch = bloom_sketch(build, build_key, num_bits=num_bits, num_hashes=num_hashes)
    words = bloom_words(sketch, num_bits=num_bits)
    pre = probe.where(
        bloom_contains(F.col(probe_key), words, num_bits=num_bits, num_hashes=num_hashes)
    )
    return pre.join(build, pre[probe_key] == build[build_key], how)
