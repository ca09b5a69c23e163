"""Property-based invariants (hypothesis) — SURVEY.md §5.4.

Operator algebra the engine must preserve for ANY input, checked on
hypothesis-generated id multisets: dedup-enrich cardinality, set-op
laws, union-distinct idempotence, sessionize partitioning.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

_ids = st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=60)

_SETTINGS = {"max_examples": 12, "deadline": None, "derandomize": True}


def _df(spark, xs, col="id"):
    return spark.createDataFrame([(int(x),) for x in xs], f"{col} bigint")


@given(ids=_ids)
@settings(**_SETTINGS)
def test_dedup_enrich_cardinality(spark, ids):
    """q_batch_enrich law (O1): |distinct(ids) ⋈ entity| == |distinct ids
    present in entity| — enrichment never duplicates or drops keys
    (app.py:164→167–177)."""
    entity = _df(spark, range(0, 51, 2))  # even keys exist
    got = _df(spark, ids).distinct().join(entity, "id", "inner").count()
    want = len({x for x in ids if x % 2 == 0})
    assert got == want


@given(a=_ids, b=_ids)
@settings(**_SETTINGS)
def test_union_distinct_idempotent_and_commutative(spark, a, b):
    """U2: distinct(a ∪ b) == distinct(b ∪ a) == distinct(a ∪ b ∪ a)."""
    da, db = _df(spark, a), _df(spark, b)
    ab = set(r["id"] for r in da.unionByName(db).distinct().collect())
    ba = set(r["id"] for r in db.unionByName(da).distinct().collect())
    aba = set(
        r["id"]
        for r in da.unionByName(db).unionByName(da).distinct().collect()
    )
    assert ab == ba == aba == set(a) | set(b)


@given(a=_ids, b=_ids)
@settings(**_SETTINGS)
def test_semi_anti_partition_the_left(spark, a, b):
    """J3/J4: semi(a,b) ⊎ anti(a,b) == a (multiset) — membership routing
    loses nothing (app.py:205–208)."""
    da, db = _df(spark, a), _df(spark, b)
    semi = da.join(db, "id", "left_semi").count()
    anti = da.join(db, "id", "left_anti").count()
    assert semi + anti == len(a)


@given(a=_ids, b=_ids)
@settings(**_SETTINGS)
def test_except_intersect_laws(spark, a, b):
    da, db = _df(spark, a), _df(spark, b)
    ex = {r["id"] for r in da.subtract(db).collect()}
    inter = {r["id"] for r in da.intersect(db).collect()}
    assert ex == set(a) - set(b)
    assert inter == set(a) & set(b)
    assert ex | inter == set(a)


@given(xs=st.lists(st.integers(0, 10_000), min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_topk_matches_python_sort(spark, xs):
    """L-layer: Spark orderBy+limit == Python sorted()[:k] under the same
    deterministic tie-break."""
    df = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(xs)], "rid bigint, v bigint"
    )
    got = [
        (r["rid"], r["v"])
        for r in df.orderBy(F.col("v").desc(), "rid").limit(5).collect()
    ]
    want = sorted(enumerate(xs), key=lambda t: (-t[1], t[0]))[:5]
    assert got == [(i, v) for i, v in want]


_texts = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=12
)


@given(texts=_texts, cap=st.integers(min_value=1, max_value=6))
@settings(max_examples=8, deadline=None, derandomize=True)
def test_capped_pairs_subset_of_uncapped(spark, texts, cap):
    """Skew-cap law: for ANY corpus and ANY cap, the capped n-gram pair
    set is a subset of the uncapped one, and jaccard values agree (the
    cap only removes buckets, never invents intersections)."""
    from data_engineering_project_spotify_app_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(i, "en", "web", t) for i, t in enumerate(texts)],
        "doc_id long, lang string, source string, text string",
    )
    unc = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, df_cap=cap).collect()
    }
    assert set(capped) <= set(unc)
    # a pair surviving the cap reports a jaccard <= its uncapped value
    # (intersection can only shrink; denominator is unchanged)
    for k, j in capped.items():
        assert j <= unc[k] + 1e-9


@given(
    seq=st.lists(
        st.tuples(st.integers(0, 2), st.sampled_from(["a", "b"])),
        min_size=1,
        max_size=24,
    )
)
@settings(max_examples=8, deadline=None, derandomize=True)
def test_scd2_intervals_partition_each_users_timeline(spark, seq):
    """SCD2 laws for ANY event sequence: per user, intervals are
    contiguous ([valid_to == next valid_from), exactly one open
    interval, n_events sums to the user's event count, and consecutive
    interval states differ."""
    import datetime

    from data_engineering_project_spotify_app_spark.operators import registry

    registry.load_all_modules()
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + datetime.timedelta(minutes=i),
            int(user),
            etype,
            1.0,
            "{}",
        )
        for i, (user, etype) in enumerate(seq)
    ]
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = registry.QUERIES["q_scd2_intervals"](spark, d).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r)
    from collections import Counter

    counts = Counter(u for u, _ in seq)
    for user, ivs in per_user.items():
        ivs.sort(key=lambda r: r.valid_from)
        assert sum(1 for r in ivs if r.is_current) == 1
        assert ivs[-1].is_current and ivs[-1].valid_to is None
        assert sum(r.n_events for r in ivs) == counts[user]
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from
            assert a.state != b.state


_words = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=0, max_size=24
)
_corpus = st.lists(_words, min_size=1, max_size=8)


def _dedup_lines_py(texts, k=4):
    """Pure-Python reference of dedup_lines: first (doc, chunk) keeps."""
    seen = set()
    out = {}
    for doc_id, toks in enumerate(texts):
        kept, dropped = [], 0
        for i in range(0, len(toks), k):
            line = " ".join(toks[i : i + k])
            if line in seen:
                dropped += 1
            else:
                seen.add(line)
                kept.append(line)
        if toks:
            out[doc_id] = (" ".join(kept), len(kept), dropped)
    return out


@given(corpus=_corpus)
@settings(max_examples=8, deadline=None, derandomize=True)
def test_dedup_lines_matches_pure_python_reference(spark, corpus):
    """q_dedup_lines' distributed first-occurrence fold == a sequential
    single-threaded dedup for ANY corpus (duplicate-heavy by
    construction: 5-word vocabulary)."""
    from data_engineering_project_spotify_app_spark.operators.linedup import (
        dedup_lines,
    )

    rows = [(i, " ".join(t)) for i, t in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
        for r in dedup_lines(df, 4).collect()
    }
    assert got == _dedup_lines_py(corpus)


_phrase_a = "p one p two p three p four p five".split()  # planted, 10 toks
_phrase_b = "q uno q dos q tres q cuatro q cinco".split()
_filler = st.lists(
    st.sampled_from([f"f{i}" for i in range(50)]), min_size=0, max_size=15
)


@st.composite
def _overlap_corpus(draw):
    docs = []
    for _ in range(draw(st.integers(2, 4))):
        toks = list(draw(_filler))
        if draw(st.booleans()):
            ins = draw(st.integers(0, len(toks)))
            phrase = _phrase_a if draw(st.booleans()) else _phrase_b
            toks[ins:ins] = phrase
        docs.append(toks)
    return docs


def _remove_overlaps_py(corpus, k=4, min_run=8):
    """Brute-force reference: per (a < b) pair, walk every diagonal of
    the token match matrix; maximal runs >= min_run mark positions of
    the LATER doc for removal (identical semantics to the k-gram
    island construction for any run >= k)."""
    out = {}
    for b_id, b in enumerate(corpus):
        covered = set()
        for a_id in range(b_id):
            a = corpus[a_id]
            for d in range(-len(b) + 1, len(a)):
                run = 0
                for j in range(len(b)):
                    i = j + d
                    if 0 <= i < len(a) and a[i] == b[j]:
                        run += 1
                    else:
                        if run >= min_run:
                            covered.update(range(j - run, j))
                        run = 0
                if run >= min_run:
                    covered.update(range(len(b) - run, len(b)))
        if b:
            kept = [t for j, t in enumerate(b) if j not in covered]
            out[b_id] = (" ".join(kept), len(covered))
    return out


@given(corpus=_overlap_corpus())
@settings(max_examples=8, deadline=None, derandomize=True)
def test_remove_overlaps_matches_bruteforce_reference(spark, corpus):
    """q_remove_overlaps' capped k-gram-diagonal construction == an
    uncapped brute-force diagonal walk (gram frequencies stay under
    the cap by construction: planted phrases appear <= 4 times)."""
    import tempfile

    from data_engineering_project_spotify_app_spark.operators import registry

    registry.load_all_modules()
    rows = [(i, " ".join(t)) for i, t in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' AS lang", "'t' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars",
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {
            r["doc_id"]: (r["clean_text"], r["n_removed"])
            for r in registry.QUERIES["q_remove_overlaps"](spark, d).collect()
        }
    assert got == _remove_overlaps_py(corpus)


def _lcs_pairs_py(corpus, min_run=8):
    """Max shared run per (a < b) pair, >= min_run only."""
    out = {}
    for b_id, b in enumerate(corpus):
        for a_id in range(b_id):
            a = corpus[a_id]
            best = 0
            for d in range(-len(b) + 1, len(a)):
                run = 0
                for j in range(len(b)):
                    i = j + d
                    if 0 <= i < len(a) and a[i] == b[j]:
                        run += 1
                        best = max(best, run)
                    else:
                        run = 0
            if best >= min_run:
                out[(a_id, b_id)] = best
    return out


@given(corpus=_overlap_corpus())
@settings(max_examples=8, deadline=None, derandomize=True)
def test_lcs_overlap_matches_bruteforce_reference(spark, corpus):
    import tempfile

    from data_engineering_project_spotify_app_spark.operators import registry

    registry.load_all_modules()
    rows = [(i, " ".join(t)) for i, t in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' AS lang", "'t' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars",
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {
            (r["doc_a"], r["doc_b"]): r["lcs_tokens"]
            for r in registry.QUERIES["q_lcs_overlap"](spark, d).collect()
        }
    assert got == _lcs_pairs_py(corpus)


@given(
    data=st.data(),
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=400),  # ts seconds
            st.sampled_from(["click", "view"]),
        ),
        min_size=0,
        max_size=40,
    ),
)
@settings(**_SETTINGS)
def test_debounce_stream_fold_matches_sequential_reference(data, evs):
    """debounce_stream's keep-after-last-KEPT fold == the sequential
    reference for ANY event stream, ANY in-order micro-batch slicing,
    and ANY Arrow chunking within a batch. Drives _debounce_fn directly
    (no Spark session): state carries across invocations exactly like
    applyInPandasWithState carries it across micro-batches."""
    import pandas as pd

    from data_engineering_project_spotify_app_spark.streaming.stateful import (
        _debounce_fn,
    )

    gap_s = 60
    events = sorted(
        (ts, eid, etype) for eid, (ts, etype) in enumerate(evs)
    )

    # sequential reference, per (type,) key
    last: dict[str, int] = {}
    expect: set[int] = set()
    for ts, eid, etype in events:
        if etype not in last or ts - last[etype] > gap_s:
            expect.add(eid)
            last[etype] = ts

    # random in-order slicing into micro-batches, random chunking inside
    n = len(events)
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=n), max_size=4
            ),
            label="batch_cuts",
        )
    )
    batches = [
        events[a:b] for a, b in zip([0] + cuts, cuts + [n]) if events[a:b]
    ]

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    fn = _debounce_fn(gap_s * 1_000_000)
    got: set[int] = set()
    states: dict[str, FakeState] = {}
    for batch in batches:
        by_key: dict[str, list] = {}
        for ts, eid, etype in batch:
            by_key.setdefault(etype, []).append((ts, eid))
        for etype, rows in by_key.items():
            k = data.draw(
                st.integers(min_value=1, max_value=max(1, len(rows))),
                label="n_chunks",
            )
            chunks = [rows[i::k] for i in range(k) if rows[i::k]]
            pdfs = [
                pd.DataFrame(
                    {
                        "ts": pd.to_datetime([r[0] for r in c], unit="s"),
                        "event_id": [r[1] for r in c],
                    }
                )
                for c in chunks
            ]
            st_ = states.setdefault(etype, FakeState())
            for pdf in fn((7, etype), pdfs, st_):
                got.update(int(e) for e in pdf["event_id"])

    assert got == expect


@given(
    data=st.data(),
    docs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10_000),  # weight
        ),
        min_size=0,
        max_size=30,
    ),
)
@settings(**_SETTINGS)
def test_weighted_reservoir_fold_is_mergeable(data, docs):
    """A-ES reservoirs are mergeable: for ANY batch slicing and ANY
    chunking, folding the stream == top-k of the union. Drives
    _reservoir_fn directly with deterministic race keys."""
    import pandas as pd

    from data_engineering_project_spotify_app_spark.streaming.stateful import (
        _reservoir_fn,
    )

    K = 5
    rows = [
        # race key derived deterministically from the doc_id so the
        # reference is exact; ties on key exercised via identical weights
        (doc_id, w[0], ((doc_id * 2654435761) % 97) / (97.0 * w[0]))
        for doc_id, w in enumerate(docs)
    ]
    expect = sorted(rows, key=lambda t: (t[2], t[0]))[:K]
    expect_set = {(t[0], t[1]) for t in expect}

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    n = len(rows)
    cuts = sorted(
        data.draw(
            st.lists(st.integers(min_value=0, max_value=n), max_size=3),
            label="cuts",
        )
    )
    batches = [rows[a:b] for a, b in zip([0] + cuts, cuts + [n]) if rows[a:b]]

    fn = _reservoir_fn(K)
    state = FakeState()
    last = None
    for batch in batches:
        nch = data.draw(
            st.integers(min_value=1, max_value=max(1, len(batch))),
            label="n_chunks",
        )
        chunks = [batch[i::nch] for i in range(nch) if batch[i::nch]]
        pdfs = [
            pd.DataFrame(
                {
                    "doc_id": [r[0] for r in c],
                    "weight": [r[1] for r in c],
                    "sample_key": [r[2] for r in c],
                }
            )
            for c in chunks
        ]
        for out in fn(("web",), pdfs, state):
            last = out
    if not batches:
        assert last is None
        return
    got = {(int(i), int(w)) for i, w in zip(last["doc_id"], last["weight"])}
    assert got == expect_set


_phrase_docs = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


@given(docs=_phrase_docs, plen=st.integers(2, 3))
@settings(**_SETTINGS)
def test_phrase_match_counts_equals_bruteforce(spark, docs, plen):
    """The postings adjacency chain must count exactly the sliding-
    window occurrences of the phrase, for any corpus over a tiny
    alphabet (adversarial for overlaps: phrases like 'a a' on 'a a a')."""
    from data_engineering_project_spotify_app_spark.operators.search import (
        phrase_match_counts,
    )

    phrase = tuple(["a", "a", "b"][:plen])
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_match_counts(df, phrase).collect()
    }
    want = {}
    for i, toks in enumerate(docs):
        n = sum(
            1
            for j in range(len(toks) - plen + 1)
            if tuple(toks[j : j + plen]) == phrase
        )
        if n:
            want[i] = n
    assert got == want
