"""Line/paragraph-level dedup + LCS overlap: adversarial semantics.

The oracle-parity suite already pins cross-engine equality on the real
fixtures; these tests pin the SEMANTICS on hand-built corpora — the
C4 motivating case (one boilerplate line shared by many documents) and
known-overlap document pairs for the k-gram-diagonal LCS.
"""

from __future__ import annotations

from data_engineering_project_spotify_app_spark.operators.linedup import (
    LINE_TOKENS,
    MIN_LCS_TOKENS,
    dedup_lines,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_line_kept_only_at_first_occurrence(spark):
    # 40 documents all carrying the same 4-token boilerplate line first,
    # then a unique tail line — the C4 case: the boilerplate survives
    # only in doc 0, every other doc keeps just its unique tail.
    boiler = "please enable java script"
    rows = [(i, f"{boiler} unique tail line {i}") for i in range(40)]
    out = {
        r["doc_id"]: r
        for r in dedup_lines(_docs(spark, rows), LINE_TOKENS).collect()
    }
    assert len(out) == 40
    assert out[0]["clean_text"] == f"{boiler} unique tail line 0"
    assert (out[0]["n_kept"], out[0]["n_dropped"]) == (2, 0)
    for i in range(1, 40):
        assert out[i]["clean_text"] == f"unique tail line {i}", i
        assert (out[i]["n_kept"], out[i]["n_dropped"]) == (1, 1), i


def test_doc_fully_made_of_duplicates_reassembles_empty(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),  # every line first seen in doc 1
    ]
    out = {
        r["doc_id"]: r
        for r in dedup_lines(_docs(spark, rows), LINE_TOKENS).collect()
    }
    assert out[1]["clean_text"] == "alpha beta gamma delta"
    assert out[2]["clean_text"] == ""
    assert (out[2]["n_kept"], out[2]["n_dropped"]) == (0, 1)


def test_first_occurrence_is_min_doc_then_position(spark):
    # the duplicated line sits LATE in doc 1 and EARLY in doc 2: first
    # occurrence orders by (doc_id, line_idx), so doc 1 keeps it
    rows = [
        (1, "one two three four shared line goes here"),
        (2, "shared line goes here five six seven eight"),
    ]
    out = {
        r["doc_id"]: r
        for r in dedup_lines(_docs(spark, rows), LINE_TOKENS).collect()
    }
    assert out[1]["n_dropped"] == 0
    assert out[2]["clean_text"] == "five six seven eight"


def test_lcs_overlap_finds_exact_shared_run(spark):
    from data_engineering_project_spotify_app_spark.operators import registry

    registry.load_all_modules()
    # build a tiny corpus parquet: docs 1/2 share an 11-token run
    # (>= MIN_LCS_TOKENS), docs 3/4 share only 6 tokens (< threshold
    # after the 8-token floor? 6 < 8 — excluded), doc 5 is disjoint
    shared = "zero one two three four five six seven eight nine ten"
    short = "aa bb cc dd ee ff"
    rows = [
        (1, f"left padding words {shared} and a tail"),
        (2, f"{shared} other ending entirely"),
        (3, f"{short} xx yy zz"),
        (4, f"qq rr ss {short}"),
        (5, "totally different content with no overlap at all here"),
    ]
    df = _docs(spark, rows).selectExpr(
        "doc_id", "text", "'en' AS lang", "'t' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {
            (r["doc_a"], r["doc_b"]): r["lcs_tokens"]
            for r in registry.QUERIES["q_lcs_overlap"](spark, d).collect()
        }
    assert got == {(1, 2): 11}, got
    assert MIN_LCS_TOKENS == 8


def test_corpus_filter_reports_first_failing_rule(spark):
    """A doc that is BOTH a duplicate and too short must report
    'duplicate' (the ladder is ordered), and only 'ok' docs keep."""
    import tempfile

    from data_engineering_project_spotify_app_spark.operators import registry

    registry.load_all_modules()
    long_good = " ".join(["the quick brown fox jumps of and a"] * 5)  # 35 toks
    rows = [
        (1, long_good),            # ok: long, stopword-dense, unique
        (2, long_good),            # duplicate of 1 (also would pass others)
        (3, "tiny short doc"),     # too_short
        (4, "tiny short doc"),     # duplicate beats too_short in the ladder
        (5, " ".join(f"w{i}" for i in range(40))),  # long but 0 stopwords
    ]
    df = _docs(spark, rows).selectExpr(
        "doc_id", "text", "'en' AS lang", "'t' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars",
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {
            r["doc_id"]: (r["reason"], r["keep"])
            for r in registry.QUERIES["q_corpus_filter"](spark, d).collect()
        }
    assert got[1] == ("ok", True)
    assert got[2] == ("duplicate", False)
    assert got[3] == ("too_short", False)
    assert got[4] == ("duplicate", False)
    assert got[5] == ("low_quality", False)


def test_remove_overlaps_cuts_span_from_later_doc_only(spark):
    """The 11-token shared run must survive in doc 1 (earlier) and be
    cut from doc 2; disjoint docs are untouched; overlapping spans from
    different partners merge instead of double-removing."""
    import tempfile

    from data_engineering_project_spotify_app_spark.operators import registry

    registry.load_all_modules()
    shared = "zero one two three four five six seven eight nine ten"
    rows = [
        (1, f"left padding words {shared} and a tail"),
        (2, f"{shared} other ending entirely"),
        # doc 3 contains the shared run EXTENDED by two tokens — its two
        # overlap spans (vs doc 1 and vs doc 2) cover overlapping ranges
        # and must merge into one removal region
        (3, f"prefix {shared} extra suffix"),
        (5, "totally different content with no overlap at all here"),
    ]
    df = _docs(spark, rows).selectExpr(
        "doc_id", "text", "'en' AS lang", "'t' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars",
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {
            r["doc_id"]: (r["clean_text"], r["n_removed"])
            for r in registry.QUERIES["q_remove_overlaps"](spark, d).collect()
        }
    # doc 1 is the earliest: untouched
    assert got[1] == (f"left padding words {shared} and a tail", 0)
    # doc 2 loses exactly the 11 shared tokens
    assert got[2] == ("other ending entirely", 11)
    # doc 3 loses the merged region once (11 tokens), keeps its frame
    assert got[3] == ("prefix extra suffix", 11)
    # disjoint doc untouched
    assert got[5][1] == 0


def test_mega_duplicated_line_exact_at_scale(spark):
    """The motivating C4 case at meaningful size: ONE boilerplate line
    in 5,000 documents. The min-aggregate + join formulation must stay
    exact (counts verified against the closed form) — and this is the
    input shape where a digest-partitioned window would pile all 5,000
    occurrences into one task."""
    n = 5000
    boiler = "please enable java script"
    rows = [(i, f"{boiler} unique token tail{i}") for i in range(n)]
    out = dedup_lines(_docs(spark, rows), LINE_TOKENS).collect()
    assert len(out) == n
    kept_total = sum(r["n_kept"] for r in out)
    dropped_total = sum(r["n_dropped"] for r in out)
    # each doc: 2 lines (4-token boiler + 4-token tail with unique token);
    # boiler kept once, its other n-1 copies dropped; tails all unique
    assert kept_total == n + 1
    assert dropped_total == n - 1
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["clean_text"] == f"{boiler} unique token tail0"
    assert by_id[n - 1]["clean_text"] == f"unique token tail{n - 1}"


def test_degenerate_docs_cross_engine_parity(spark):
    """Empty and 1-token documents — shapes absent from the driver
    fixtures — must agree between Spark and DuckDB for every new
    round-3 oracle that consumes documents."""
    import tempfile

    import duckdb

    from data_engineering_project_spotify_app_spark.operators import registry

    registry.load_all_modules()
    rows = [
        (1, ""),                       # tokenless
        (2, "single"),                 # 1 token: no bigrams, 1 line
        (3, "a b c"),                  # < LINE_TOKENS chunk
        (4, "the quick brown fox jumps over the lazy dog again and again"),
        (5, "the quick brown fox jumps over the lazy dog again and again"),
    ]
    df = _docs(spark, rows).selectExpr(
        "doc_id", "text", "'en' AS lang", "'t' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars",
    )
    names = (
        "q_dedup_lines", "q_dedup_paragraphs", "q_lcs_overlap",
        "q_remove_overlaps", "q_bigram_logprob", "q_corpus_filter",
        "q_ccnet_buckets",
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"parquet_scan('{d}/documents.parquet/*.parquet')"
        )
        for name in names:
            sdf = registry.QUERIES[name](spark, d)
            scols = sorted(sdf.columns)
            srows = sorted(
                tuple(r[c] for c in scols) for r in sdf.collect()
            )
            rel = con.sql(registry.ORACLES[name])
            idx = [rel.columns.index(c) for c in scols]
            drows = sorted(tuple(r[i] for i in idx) for r in rel.fetchall())
            assert srows == drows, (name, srows, drows)


# ---------------------------------------------------------------------------
# suffix-automaton LCS: property tests against brute force
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


def _lcs_brute(a: list, b: list) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while (
                i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]
            ):
                k += 1
            if k > best:
                best = k
    return best


_tok = st.sampled_from(["a", "b", "c", "dup"])


@settings(max_examples=300, deadline=None)
@given(
    st.lists(_tok, max_size=40),
    st.lists(_tok, max_size=40),
)
def test_suffix_automaton_lcs_matches_brute_force(a, b):
    """The automaton must equal the O(n·m) brute force on random
    token sequences over a small (collision-heavy) alphabet —
    including empty inputs and full-containment cases."""
    from data_engineering_project_spotify_app_spark.operators.linedup import (
        _lcs_token_len,
    )

    assert _lcs_token_len(a, b) == _lcs_brute(a, b)


def test_suffix_automaton_lcs_edges():
    from data_engineering_project_spotify_app_spark.operators.linedup import (
        _lcs_token_len,
    )

    assert _lcs_token_len([], []) == 0
    assert _lcs_token_len(["x"], []) == 0
    assert _lcs_token_len(["x"], ["x"]) == 1
    assert _lcs_token_len(["x", "y"], ["y", "x"]) == 1
    assert _lcs_token_len(list("abcde"), list("cde")) == 3
    # sub-4-token overlap the k-gram form (LCS_GRAM=4) cannot see
    assert _lcs_token_len(["p", "q", "r", "s"], ["z", "q", "r", "w"]) == 2


# ---------------------------------------------------------------------------
# round 7: intra-document repeated-span removal + short-floor removal twin
# ---------------------------------------------------------------------------

def _write_docs(spark, d, rows):
    _docs(spark, rows).selectExpr(
        "doc_id", "text", "'en' AS lang", "'t' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")


def _intra_ref(toks, K=4, T=8, cap=32):
    """Sequential pure-Python mirror of q_intra_doc_dedup's spec:
    capped per-gram self-pairs → diagonal islands → spans >= T tokens →
    interval merge → removal. Independent of Spark/DuckDB — the
    property-test ground truth."""
    from collections import defaultdict

    grams = defaultdict(list)
    for p in range(max(0, len(toks) - K + 1)):
        grams[tuple(toks[p:p + K])].append(p)
    bydiag = defaultdict(list)
    for ps in grams.values():
        if 1 < len(ps) <= cap:
            for i in range(len(ps)):
                for j in range(i + 1, len(ps)):
                    bydiag[ps[j] - ps[i]].append(ps[j])
    spans = set()
    for pls in bydiag.values():
        pls = sorted(pls)
        i = 0
        while i < len(pls):
            j = i
            while j + 1 < len(pls) and pls[j + 1] == pls[j] + 1:
                j += 1
            run = j - i + 1
            if run + K - 1 >= T:
                spans.add((pls[i], pls[i] + run + K - 1))
            i = j + 1
    merged = []
    for s, e in sorted(spans):
        if merged and s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    removed = set()
    for s, e in merged:
        removed.update(range(s, e))
    clean = " ".join(t for i, t in enumerate(toks) if i not in removed)
    return clean, len(removed)


def test_intra_doc_dedup_cuts_second_occurrence_only(spark):
    from data_engineering_project_spotify_app_spark.operators.linedup import (
        intra_doc_dedup,
    )

    chorus = "never gonna give you up never gonna let"  # 8 tokens >= 8
    rows = [
        # chorus repeated verbatim later in the doc: second copy cut
        (1, f"{chorus} verse words in between {chorus} and a tail"),
        # no intra-doc repeat: untouched (even though doc 1 shares text —
        # this operator is WITHIN-doc only)
        (2, f"{chorus} completely unique remainder here"),
        # repeat shorter than the 8-token floor survives
        (3, "short motif four five short motif four five"),
    ]
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in intra_doc_dedup(_docs(spark, rows)).collect()
    }
    assert out[1] == (
        f"{chorus} verse words in between and a tail", 8,
    )
    assert out[2][1] == 0
    assert out[3][1] == 0


def test_intra_doc_dedup_back_to_back_periodic_repeat(spark):
    from data_engineering_project_spotify_app_spark.operators.linedup import (
        intra_doc_dedup,
    )

    # "a b c d" repeated 4x back-to-back: every later copy sits on the
    # diag-4 island; overlapping removal spans merge, first copy survives
    unit = "a b c d"
    rows = [(1, " ".join([unit] * 4))]
    out = intra_doc_dedup(_docs(spark, rows)).collect()[0]
    assert out["clean_text"] == unit
    assert out["n_removed"] == 12


def test_intra_doc_dedup_degenerate_token_run_hits_gram_cap(spark):
    from data_engineering_project_spotify_app_spark.operators.linedup import (
        INTRA_GRAM_CAP,
        intra_doc_dedup,
    )

    # 40 copies of one token → the single 4-gram occurs 37 > cap times;
    # the stop-gram cap drops it entirely, so nothing is removed (such
    # docs are q_gopher_rules' kill, not this operator's)
    rows = [(1, " ".join(["spam"] * 40)), (2, " ".join(["ok"] * 9))]
    out = {
        r["doc_id"]: r["n_removed"]
        for r in intra_doc_dedup(_docs(spark, rows)).collect()
    }
    assert out[1] == 0
    # 9 copies → the single gram occurs 6 <= cap times; the diag-1
    # island spans 8 tokens >= floor: everything after the first
    # overlapping copy is cut, leaving one token
    assert out[2] == 8
    assert INTRA_GRAM_CAP == 32


def test_intra_doc_dedup_matches_sequential_reference(spark):
    """Property test: Spark vs the sequential pure-Python reference on a
    seeded random corpus biased toward repetition (tiny alphabet, short
    docs) plus adversarial structures (periodic, chorus, degenerate)."""
    import random

    from data_engineering_project_spotify_app_spark.operators.linedup import (
        intra_doc_dedup,
    )

    rng = random.Random(20260815)
    alphabet = ["a", "b", "c", "x", "y"]
    rows = []
    for doc_id in range(60):
        n = rng.randint(0, 40)
        toks = [rng.choice(alphabet) for _ in range(n)]
        # half the docs get an injected verbatim repeat of a random slice
        if n >= 10 and rng.random() < 0.5:
            s = rng.randint(0, n - 9)
            ln = rng.randint(8, min(12, n - s))
            toks = toks + [rng.choice(alphabet)] + toks[s:s + ln]
        rows.append((doc_id, " ".join(toks)))
    rows.append((900, " ".join(["a b c d"] * 5)))
    rows.append((901, " ".join(["z"] * 50)))
    rows.append((902, ""))
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in intra_doc_dedup(_docs(spark, rows)).collect()
    }
    for doc_id, text in rows:
        want = _intra_ref(text.split())
        if not text.split():
            # tokenless docs drop out of the token explosion entirely
            assert doc_id not in got
            continue
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


def test_remove_overlaps_short_cuts_sub_floor_spans(spark):
    """The short twin removes shared runs of 4–7 tokens that the 8-token
    production floor leaves in place; sub-4-token sharing is invisible
    to the 4-gram machinery in BOTH variants (structural minimum)."""
    import tempfile

    from data_engineering_project_spotify_app_spark.operators import registry

    registry.load_all_modules()
    five = "alpha beta gamma delta epsilon"
    rows = [
        (1, f"{five} unique one tail"),
        (2, f"front matter {five} closing"),
        # 3-token sharing: below the gram size, never detected
        (3, "alpha beta gamma entirely different everything else here"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(spark, d, rows)
        full = {
            r["doc_id"]: r["n_removed"]
            for r in registry.QUERIES["q_remove_overlaps"](spark, d).collect()
        }
        short = {
            r["doc_id"]: (r["clean_text"], r["n_removed"])
            for r in registry.QUERIES["q_remove_overlaps_short"](
                spark, d
            ).collect()
        }
    assert full == {1: 0, 2: 0, 3: 0}  # 5 < 8: production floor keeps it
    assert short[1][1] == 0  # doc 1 is earlier: always survives
    assert short[2] == ("front matter closing", 5)
    assert short[3][1] == 0  # 3 shared tokens < gram size: structural floor


def test_duplicate_identical_spans_merge_deterministically(spark):
    """Regression pin for the tie-order bug: the SAME (s, e) interval
    arriving from two partner docs must merge to ONE removal span, never
    double-count (pre-fix this flipped n_removed 4↔8 run-to-run in
    DuckDB). Three docs all share one 8-token run: the latest doc gets
    the identical span nominated by BOTH earlier partners."""
    import tempfile

    from data_engineering_project_spotify_app_spark.operators import registry

    registry.load_all_modules()
    run8 = "one two three four five six seven eight"
    rows = [
        (1, f"{run8} first tail"),
        (2, f"{run8} second tail"),
        (3, f"{run8} third tail"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(spark, d, rows)
        got = {
            r["doc_id"]: (r["clean_text"], r["n_removed"])
            for r in registry.QUERIES["q_remove_overlaps"](spark, d).collect()
        }
    assert got[1] == (f"{run8} first tail", 0)
    assert got[2] == ("second tail", 8)
    assert got[3] == ("third tail", 8)


def _cross_ref(docs, K=4, T=8, cap_floor=16, cap_div=200):
    """Sequential pure-Python mirror of q_remove_overlaps' spec:
    corpus-capped gram posting lists → cross-doc (doc_a < doc_b)
    diagonal islands → spans >= T projected onto doc_b → interval merge
    → removal. ``docs`` is {doc_id: [tokens]}; returns
    {doc_id: (clean_text, n_removed)}."""
    from collections import defaultdict

    occ = defaultdict(list)  # gram -> [(doc_id, pos)]
    for did, toks in docs.items():
        for p in range(max(0, len(toks) - K + 1)):
            occ[tuple(toks[p:p + K])].append((did, p))
    cap = max(cap_floor, len(docs) // cap_div)
    bydiag = defaultdict(list)  # (da, db, diag) -> [pa]
    for ps in occ.values():
        if 1 < len(ps) <= cap:
            for (da, pa) in ps:
                for (db, pb) in ps:
                    if da < db:
                        bydiag[(da, db, pa - pb)].append(pa)
    spans = defaultdict(set)  # doc_b -> {(s, e)}
    for (da, db, diag), pas in bydiag.items():
        pas = sorted(set(pas))
        i = 0
        while i < len(pas):
            j = i
            while j + 1 < len(pas) and pas[j + 1] == pas[j] + 1:
                j += 1
            run = j - i + 1
            if run + K - 1 >= T:
                s = pas[i] - diag
                spans[db].add((s, s + run + K - 1))
            i = j + 1
    out = {}
    for did, toks in docs.items():
        merged = []
        for s, e in sorted(spans.get(did, ())):
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        removed = set()
        for s, e in merged:
            removed.update(range(s, e))
        clean = " ".join(
            t for i, t in enumerate(toks) if i not in removed
        )
        out[did] = (clean, len(removed))
    return out


def test_remove_overlaps_matches_sequential_reference(spark):
    """Property test: Spark vs the sequential pure-Python reference on
    a seeded random corpus biased toward cross-doc sharing (docs built
    from a small pool of phrase blocks, so long runs recur verbatim
    across documents)."""
    import random

    from data_engineering_project_spotify_app_spark.operators.linedup import (
        MIN_LCS_TOKENS,
        remove_overlaps_df,
    )

    rng = random.Random(20260816)
    # 12 reusable phrase blocks of 3-6 tokens: concatenating them
    # produces cross-doc shared runs of varying lengths around the
    # 8-token floor
    vocab = ["w%d" % i for i in range(30)]
    blocks = [
        [rng.choice(vocab) for _ in range(rng.randint(3, 6))]
        for _ in range(12)
    ]
    corpus = {}
    for did in range(50):
        toks = []
        for _ in range(rng.randint(1, 5)):
            if rng.random() < 0.7:
                toks += rng.choice(blocks)
            else:
                toks += [rng.choice(vocab) for _ in range(rng.randint(2, 5))]
        corpus[did] = toks
    rows = [(did, " ".join(t)) for did, t in corpus.items()]
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_overlaps_df(
            _docs(spark, rows), MIN_LCS_TOKENS
        ).collect()
    }
    want = _cross_ref(corpus, T=MIN_LCS_TOKENS)
    # drop tokenless docs from the reference (they never enter the
    # token explosion) — none expected with these generators
    assert got == {k: v for k, v in want.items() if corpus[k]}
