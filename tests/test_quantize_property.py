"""Property: int8 scalar quantization's reconstruction error is
bounded by scale/2 per dimension, exactly (floor(x+0.5) is nearest-
level rounding), and constant vectors reconstruct exactly."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


def _ref(vec, levels=255):
    vmin, vmax = min(vec), max(vec)
    scale = 1.0 if vmax == vmin else (vmax - vmin) / float(levels)
    errs = [
        x - (vmin + math.floor((x - vmin) / scale + 0.5) * scale)
        for x in vec
    ]
    return scale, errs


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=32,
    )
)
def test_reconstruction_error_bounded_by_half_scale(vec):
    scale, errs = _ref(vec)
    # half-scale bound with a 1-ulp cushion for the float division
    bound = scale / 2 * (1 + 1e-12) + 1e-12
    assert all(abs(e) <= bound for e in errs), (scale, errs)


@settings(max_examples=100, deadline=None)
@given(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    st.integers(min_value=1, max_value=16),
)
def test_constant_vectors_reconstruct_exactly(v, n):
    _, errs = _ref([v] * n)
    assert errs == [0.0] * n
