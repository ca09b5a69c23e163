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


def test_resample_ffill_matches_python_reference(spark, tmp_path):
    """q_resample_ffill vs a pure-Python model on seeded random event
    sets: the grid spans exactly [first, last] active day per user
    with no holes, gap days carry the last observed daily total, and
    observed days carry their own."""
    import datetime as dt
    import random

    from data_engineering_project_spotify_app_spark.operators import registry

    registry.load_all_modules()
    rng = random.Random(42)
    rows = []
    eid = 0
    for user in range(6):
        days = sorted(rng.sample(range(28), rng.randint(1, 9)))
        for d in days:
            for _ in range(rng.randint(1, 3)):
                rows.append(
                    (
                        eid,
                        dt.datetime(2024, 3, 1 + d, rng.randint(0, 23), 30),
                        user,
                        "click",
                        round(rng.uniform(0.5, 9.5), 2),
                        "{}",
                    )
                )
                eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    out = str(tmp_path / "ev")
    df.write.parquet(f"{out}/events.parquet")
    got = {
        (r["user_id"], str(r["day"])): (r["value_ffill"], r["is_gap"])
        for r in registry.QUERIES["q_resample_ffill"](spark, out).collect()
    }

    # python model
    daily: dict[tuple[int, dt.date], float] = {}
    for _, ts, user, _, value, _ in rows:
        key = (user, ts.date())
        daily[key] = round(daily.get(key, 0.0) + value, 10)
    daily = {k: round(v, 4) for k, v in daily.items()}
    expected = {}
    for user in range(6):
        udays = sorted(d for (u, d) in daily if u == user)
        if not udays:
            continue
        cur = None
        d = udays[0]
        while d <= udays[-1]:
            if (user, d) in daily:
                cur = daily[(user, d)]
                expected[(user, str(d))] = (cur, False)
            else:
                expected[(user, str(d))] = (cur, True)
            d += dt.timedelta(days=1)

    assert set(got) == set(expected)
    for k in expected:
        ev, eg = expected[k]
        gv, gg = got[k]
        assert gg == eg, (k, got[k], expected[k])
        assert abs(gv - ev) < 1e-9, (k, got[k], expected[k])
