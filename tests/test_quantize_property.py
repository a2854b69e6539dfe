"""Property: int8 scalar quantization's reconstruction error is
bounded by scale/2 per dimension, exactly (floor(x+0.5) is nearest-
level rounding), and constant vectors reconstruct exactly."""

from __future__ import annotations

import math

from hypothesis import example, given, settings
from hypothesis import strategies as st


def _ref(vec, levels=255):
    vmin, vmax = min(vec), max(vec)
    # guard on the COMPUTED scale: a subnormal range underflows the
    # division to exactly 0.0 (hypothesis-found: [0.0, 5e-324]) — the
    # operator and its oracle use the same degenerate-scale rule
    scale = (vmax - vmin) / float(levels)
    if scale == 0.0:
        scale = 1.0
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
@example(vec=[0.0, 5e-324])  # subnormal range: /255 underflows to 0
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
