"""Property tests for the round-6 closed-form helpers.

Pure-Python properties (no Spark session needed for the arithmetic
ones): ntile_from_rank's bucket split must match the SQL-standard
ntile for EVERY (n, k), and the decayed-engagement kernel must be
arrival-order independent — the two claims the operators' docstrings
lean on.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st


def _ntile_reference(n: int, k: int) -> list[int]:
    """SQL-standard ntile: first n%k buckets get n//k+1 rows."""
    q, r = divmod(n, k)
    out = []
    for bucket in range(1, k + 1):
        out.extend([bucket] * (q + 1 if bucket <= r else q))
    return out


def _ntile_closed_form(rn: int, n: int, k: int) -> int:
    """Python twin of rankutil.ntile_from_rank's arithmetic."""
    q, r = divmod(n, k)
    big = r * (q + 1)
    if rn <= big:
        return (rn - 1) // (q + 1) + 1
    return r + (rn - big - 1) // max(q, 1) + 1


@given(
    n=st.integers(min_value=1, max_value=500),
    k=st.integers(min_value=1, max_value=32),
)
@settings(max_examples=300, deadline=None)
def test_ntile_closed_form_matches_sql_standard(n, k):
    ref = _ntile_reference(n, k)
    got = [_ntile_closed_form(rn, n, k) for rn in range(1, n + 1)]
    assert got == ref


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=90 * 86400_000_000),
            st.floats(
                min_value=0.01, max_value=100.0, allow_nan=False
            ),
        ),
        min_size=1,
        max_size=30,
    ),
    perm_seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=150, deadline=None)
def test_decay_kernel_is_arrival_order_independent(events, perm_seed):
    """Folding score' = score*exp(-lam*(t_new - t_last)) + v in ANY
    processing order yields the same score once decayed to a common
    reference time — the telescoping claim decayed_engagement_stream
    rests on (up to float tolerance)."""
    import random

    lam = math.log(2.0) / 7.0
    us_day = 86400_000_000.0

    def fold(seq):
        score, last = 0.0, None
        for t, v in seq:
            if last is not None:
                score *= math.exp(-lam * (t - last) / us_day)
            score += v
            last = t
        return score, last

    ref_t = max(t for t, _ in events)

    def at_ref(seq):
        s, last = fold(seq)
        return s * math.exp(-lam * (ref_t - last) / us_day)

    a = at_ref(events)
    rng = random.Random(perm_seed)
    shuffled = events[:]
    rng.shuffle(shuffled)
    b = at_ref(shuffled)
    direct = sum(
        v * math.exp(-lam * (ref_t - t) / us_day) for t, v in events
    )
    scale = max(1.0, abs(direct))
    assert abs(a - direct) / scale < 1e-9
    assert abs(b - direct) / scale < 1e-9


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=2**32 - 1),
        min_size=1,
        max_size=400,
    ),
    split_seed=st.integers(min_value=0, max_value=2**31),
    k=st.integers(min_value=4, max_value=64),
)
@settings(max_examples=150, deadline=None)
def test_kmv_merge_arrays_semantics(vals, split_seed, k):
    """Python twin of udafs.kmv_merge_arrays: merging two shard
    sketches (k-min of disjoint-ish splits) equals the k-min of the
    union — the mergeability law the UDAF test pins on Spark."""
    import random

    rng = random.Random(split_seed)
    a_rows, b_rows = [], []
    for v in vals:
        (a_rows if rng.random() < 0.5 else b_rows).append(v)
    sk_a = sorted(set(a_rows))[:k]
    sk_b = sorted(set(b_rows))[:k]
    merged = sorted(set(sk_a) | set(sk_b))[:k]
    full = sorted(set(vals))[:k]
    assert merged == full
