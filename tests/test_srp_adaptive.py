"""knn.srp_adaptive_params — corpus-adaptive SRP-LSH sizing.

Pins the three contract properties: bits track log2(n) (constant
expected bucket occupancy), the solved table count keeps the miss
probability at the threshold below the bound, and the table cap is
honored by walking bits back (recall is never traded away).
"""

from __future__ import annotations

import math

import pytest

from ccgp_data_wrangling_spark.operators.knn import srp_adaptive_params


def _miss_prob(n_tables: int, n_bits: int, threshold: float) -> float:
    p_bit = 1.0 - math.acos(threshold) / math.pi
    return (1.0 - p_bit**n_bits) ** n_tables


def test_bits_track_log_n():
    sizes = [1_000, 10_000, 100_000, 1_000_000]
    bits = [srp_adaptive_params(n, 0.99)[1] for n in sizes]
    # each decade adds log2(10) ≈ 3.3 bits — monotone, ~3-4 per step
    assert bits == sorted(bits)
    for a, b in zip(bits, bits[1:]):
        assert 3 <= b - a <= 4
    # occupancy target: expected random collisions per vector ≈ 1
    for n, b in zip(sizes, bits):
        assert n * 0.5**b <= 2.0


def test_miss_prob_bound_holds():
    for n in (500, 50_000, 5_000_000):
        for thr in (0.95, 0.99, 0.999):
            t, b = srp_adaptive_params(n, thr)
            assert _miss_prob(t, b, thr) <= 1e-6, (n, thr, t, b)


def test_table_cap_walks_bits_back():
    t, b = srp_adaptive_params(4_000_000_000, 0.99, max_tables=16)
    assert t <= 16
    # recall bound still holds — bits were reduced instead
    assert _miss_prob(t, b, 0.99) <= 1e-6
    _, b_uncapped = srp_adaptive_params(4_000_000_000, 0.99)
    assert b < b_uncapped


def test_exact_duplicate_threshold():
    t, b = srp_adaptive_params(100_000, 1.0)
    assert t == 1  # identical vectors collide in any single table


def test_deterministic():
    assert srp_adaptive_params(12_345, 0.99) == srp_adaptive_params(
        12_345, 0.99
    )


@pytest.mark.parametrize("n", [0, 1, 2])
def test_degenerate_corpus_sizes(n):
    t, b = srp_adaptive_params(n, 0.99)
    assert t >= 1 and b >= 6
