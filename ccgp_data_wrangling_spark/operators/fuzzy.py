"""Banded fuzzy argmax join — exact Levenshtein-ratio best match,
faster than the naive all-pairs scoring.

The reference's conflict resolution (update_reads.py:166-181) and any
X12-class "best fuzzy match" picks, per left row, the right row
maximizing ``ratio = 100·(|a|+|b|-lev)/(|a|+|b|)``. Scoring every
pair with full Levenshtein is O(|a|·|b|) per pair; Spark's
``levenshtein(a, b, threshold)`` runs a banded DP that early-exits
once distance exceeds the threshold (O(threshold·n) per pair — 4×
faster at small bands).

Two-pass exactness: pass 1 scores only pairs with ``lev <= band``.
Any pruned pair satisfies ``ratio < 100·(|a|+R-band-1)/(|a|+R)``
where R is the max right-side length (ratio is increasing in |b| for
fixed lev floor). A left row whose banded best strictly beats that
bound cannot be improved by any pruned pair — proven exact. The rest
(usually none, worst-case all) fall back to full scoring, so results
are ALWAYS exact; the band only controls how much work pass 1 saves.

Blocking (``length_window=L``): pass 1 considers only pairs with
``abs(len(a) - len(b)) <= L``, generated as an EQUI-join (left rows
explode to the 2L+1 length keys they accept; right rows carry their
length as the key) instead of a cross join. The proof extends: an
out-of-window pair has ``lev >= |Δlen| > L``, an in-window pruned
pair has ``lev > band``, so every pruned pair has
``lev > min(band, L)`` and the same bound applies with
``min(band, L)``. At scale this turns the candidate stage into a
shuffle equi-join whose size tracks the length histogram overlap —
superlinear shrinkage on realistic name corpora. On fixed-width
corpora (all lengths equal, e.g. zero-padded ids) the window keeps
every pair and only adds overhead: leave it off there (measured on
x12: see queries/relational.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_argmax_join", "resolve_length_window"]


def resolve_length_window(
    l_min: int, l_max: int, r_min: int, r_max: int, band: int
) -> int | None:
    """The "auto" blocking decision, as a pure function of the length
    ranges. Blocking prunes exactly the pairs whose length gap exceeds
    the window; with window = band the pass-1 safety bound is
    unchanged (eff = min(band, window) = band). So: block iff some
    pair's length gap CAN exceed band, else the window would prune
    nothing and the banded broadcast cross join is strictly cheaper.
    """
    some_pair_prunable = (r_max - l_min > band) or (l_max - r_min > band)
    return band if some_pair_prunable else None


def _score(left_col: str, right_col: str, lev):
    tot = F.length(left_col) + F.length(right_col)
    return F.when(tot == 0, F.lit(100.0)).otherwise(
        F.round(100.0 * (tot - lev) / tot, 3)
    )


def _argmax(scored: DataFrame, left_col: str, right_col: str) -> DataFrame:
    # min_by over struct(-ratio, right): lexicographic struct ordering
    # gives max ratio then min right value, aggregated map-side
    return scored.groupBy(left_col).agg(
        F.min_by(
            F.struct(right_col, "ratio"),
            F.struct((-F.col("ratio")).alias("o1"), F.col(right_col).alias("o2")),
        ).alias("__best"),
        F.max("ratio").alias("__best_ratio"),
    )


def fuzzy_argmax_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    *,
    band: int = 6,
    length_window: int | None | str = "auto",
) -> DataFrame:
    """For each distinct ``left_col`` value, the ``right_col`` value
    with the highest Levenshtein ratio (ties → lexicographically
    smallest right value). Output: (left_col, right_col, ratio).

    ``right`` is broadcast — it must be dimension-sized. Exact for any
    ``band``; tune ``band`` near the expected best-match distance.
    ``length_window=L`` additionally blocks pass-1 candidates to pairs
    within L of each other in length via an equi-join on length keys
    (see module docstring for the proof); exact for any L.

    ``length_window="auto"`` (the default) picks the blocking strategy
    from a cheap length sniff — min/max of ``length(col)`` on each
    side (the right agg is needed for the exactness bound anyway; the
    left adds one column-pruned scan). Blocking can only prune a pair
    whose length gap exceeds the window, so if the joint length-gap
    range never exceeds ``band`` (e.g. both sides fixed-width — the
    uniform zero-padded-id corpus where every generic blocking scheme
    degenerates), blocking is pure overhead and the banded broadcast
    cross join is kept; otherwise the window is set to ``band``
    itself, which maximizes pruning WITHOUT weakening the pass-1
    safety bound (eff = min(band, L) stays = band). One code path
    serves both corpus shapes.
    """
    lf = left.select(left_col)
    rf = right.select(right_col)

    if length_window == "auto":
        # ONE sniff job for both sides (union + conditional min/max),
        # not one agg job per side: at report scale the second job's
        # fixed scheduling cost dominated (x12b 0.88→1.53 s in r3's
        # two-job version); at 100 TB both scans stay column-pruned.
        l_min, l_max, r_min, r_max = (
            lf.select(F.length(left_col).alias("n"), F.lit(True).alias("l"))
            .unionByName(
                rf.select(F.length(right_col).alias("n"), F.lit(False).alias("l"))
            )
            .agg(
                F.min(F.when(F.col("l"), F.col("n"))),
                F.max(F.when(F.col("l"), F.col("n"))),
                F.min(F.when(~F.col("l"), F.col("n"))),
                F.max(F.when(~F.col("l"), F.col("n"))),
            )
            .head()
        )
        if r_max is None:
            raise ValueError("right side is empty")
        if l_max is None:
            raise ValueError("left side is empty")
        length_window = resolve_length_window(l_min, l_max, r_min, r_max, band)
    else:
        r_min, r_max = rf.agg(
            F.min(F.length(right_col)), F.max(F.length(right_col))
        ).head()
        if r_max is None:
            raise ValueError("right side is empty")

    if length_window is None:
        cand = lf.crossJoin(F.broadcast(rf))
        eff = band
    else:
        # equi-join blocking: each left row accepts 2L+1 length keys,
        # each right row carries one — candidate volume tracks the
        # length-histogram overlap instead of |L|×|R|
        lw = int(length_window)
        lkeys = lf.select(
            left_col,
            F.explode(
                F.sequence(
                    F.greatest(F.length(left_col) - lw, F.lit(0)),
                    F.length(left_col) + lw,
                )
            ).alias("__blk"),
        )
        rkeys = rf.select(right_col, F.length(right_col).alias("__blk"))
        cand = lkeys.join(F.broadcast(rkeys), "__blk").drop("__blk")
        eff = min(band, lw)

    lev_b = F.levenshtein(left_col, right_col, band)
    # pruned pairs map to a -1 sentinel instead of being filtered out:
    # a filter on lev would re-evaluate the levenshtein (predicate and
    # projection are separate codegen operators — no CSE across them),
    # doubling the dominant cost; inside ONE projection the when()
    # shares a single evaluation. Sentinel rows can only win the argmax
    # when every pair is pruned, which fails the safety bound anyway.
    banded = cand.select(
        left_col,
        right_col,
        F.when(lev_b >= 0, _score(left_col, right_col, lev_b))
        .otherwise(F.lit(-1.0))
        .alias("ratio"),
    )
    # checkpoint: p1 (one row per left value) feeds BOTH the safe
    # output and the unsafe anti-join — without it the banded cross
    # join re-executes once per branch. localCheckpoint (not persist):
    # persist registers in the CacheManager keyed on plan equality, so
    # a later identical call would silently serve the stale cache.
    p1 = _argmax(banded, left_col, right_col).localCheckpoint(eager=False)

    # pruned pairs (lev > eff, whether banded-out or out-of-window)
    # have exact ratio < this bound; their 3-decimal rounding adds at
    # most 0.0005 — strict margin covers it
    ll = F.length(left_col)
    bound = 100.0 * (ll + r_max - (eff + 1)) / (ll + r_max)
    safe = p1.where(F.col("__best_ratio") > bound + 0.001)

    unsafe = lf.distinct().join(safe.select(left_col), left_col, "left_anti")
    full = unsafe.crossJoin(F.broadcast(rf))
    lev = F.levenshtein(left_col, right_col)
    p2 = _argmax(
        full.select(
            left_col, right_col, _score(left_col, right_col, lev).alias("ratio")
        ),
        left_col,
        right_col,
    )

    return (
        safe.unionByName(p2)
        .select(
            left_col,
            F.col("__best").getField(right_col).alias(right_col),
            F.col("__best").getField("ratio").alias("ratio"),
        )
    )
