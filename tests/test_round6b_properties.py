"""Property tests for the round-6 continuation closed forms.

Pure-Python twins of the arithmetic the operators' docstrings lean on —
no Spark session needed: the Laplace inverse-CDF must round-trip its
CDF and be symmetric; weighted Jaccard must collapse to plain Jaccard
under uniform weights and stay in [0, 1]; the revenue bridge must be
additive EXACTLY (it is an algebraic identity, not an approximation);
the 7-frame median formula must equal statistics.median.
"""

from __future__ import annotations

import math
import statistics

from hypothesis import given, settings, strategies as st


# --- Laplace inverse-CDF (privacy.py) --------------------------------

def _laplace_inv(u: float, b: float) -> float:
    return -b * math.copysign(1.0, u - 0.5) * math.log(
        1.0 - 2.0 * abs(u - 0.5)
    )


def _laplace_cdf(x: float, b: float) -> float:
    if x < 0:
        return 0.5 * math.exp(x / b)
    return 1.0 - 0.5 * math.exp(-x / b)


@settings(max_examples=300)
@given(
    st.floats(min_value=1e-9, max_value=1 - 1e-9),
    st.floats(min_value=0.1, max_value=100.0),
)
def test_laplace_inverse_cdf_round_trips(u, b):
    x = _laplace_inv(u, b)
    assert abs(_laplace_cdf(x, b) - u) < 1e-9
    # symmetry: u and 1-u give mirrored draws. Computing 1-u loses the
    # low bits of an extreme u (catastrophic cancellation in the tail),
    # so tolerate b-scaled absolute error — the identity itself is exact.
    assert abs(_laplace_inv(1.0 - u, b) + x) < 1e-6 * b


# --- weighted Jaccard (dedup.py) -------------------------------------

@settings(max_examples=200)
@given(
    st.sets(st.integers(0, 30), min_size=1, max_size=15),
    st.sets(st.integers(0, 30), min_size=1, max_size=15),
    st.floats(min_value=0.01, max_value=10.0),
)
def test_weighted_jaccard_uniform_weights_is_plain_jaccard(a, b, w):
    wcommon = w * len(a & b)
    wa, wb = w * len(a), w * len(b)
    denom = wa + wb - wcommon
    wj = wcommon / denom
    plain = len(a & b) / len(a | b)
    assert abs(wj - plain) < 1e-12
    assert -1e-12 <= wj <= 1 + 1e-12


@settings(max_examples=200)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 20),  # shingle id
            st.floats(min_value=0.0, max_value=5.0),  # weight
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
    st.sets(st.integers(0, 20), min_size=1),
    st.sets(st.integers(0, 20), min_size=1),
)
def test_weighted_jaccard_bounded(weights, a, b):
    w = dict(weights)
    wa = sum(w.get(s, 1.0) for s in a)
    wb = sum(w.get(s, 1.0) for s in b)
    wc = sum(w.get(s, 1.0) for s in a & b)
    denom = wa + wb - wc  # == Σ_{A∪B} w  >= wc since weights >= 0
    if denom <= 0:
        return  # all-zero weights: sim undefined, operator emits nothing
    wj = wc / denom
    assert -1e-12 <= wj <= 1 + 1e-12
    union = sum(w.get(s, 1.0) for s in a | b)
    assert abs(denom - union) < 1e-9  # the fold identity the plan uses


# --- revenue bridge (affinity.py) ------------------------------------

@settings(max_examples=300)
@given(
    st.floats(min_value=0.01, max_value=1e6),
    st.floats(min_value=0.01, max_value=1e6),
    st.floats(min_value=0.01, max_value=1e6),
    st.floats(min_value=0.01, max_value=1e6),
)
def test_revenue_bridge_is_an_identity(p0, q0, p1, q1):
    delta = p1 * q1 - p0 * q0
    decomposed = (p1 - p0) * q0 + p0 * (q1 - q0) + (p1 - p0) * (q1 - q0)
    # identity is exact in reals; in floats the error scales with the
    # largest INTERMEDIATE term (e.g. Δp·q0 can dwarf both revenues),
    # not with delta (which can cancel to ~0)
    scale = max(
        1.0,
        p0 * q0,
        p1 * q1,
        abs((p1 - p0) * q0),
        abs(p0 * (q1 - q0)),
        abs((p1 - p0) * (q1 - q0)),
    )
    assert abs(delta - decomposed) <= 1e-12 * scale


# --- rolling median frame formula (windows.py) -----------------------

@settings(max_examples=300)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6), min_size=1, max_size=7))
def test_frame_median_formula_matches_statistics(xs):
    arr = sorted(xs)
    n = len(arr)
    mid = (n + 1) // 2
    if n % 2 == 1:
        med = arr[mid - 1]
    else:
        med = (arr[mid - 1] + arr[mid]) / 2.0
    assert math.isclose(
        med, statistics.median(arr), rel_tol=1e-12, abs_tol=1e-12
    )
