"""Brute-force reference checks for the novelty / entropy text metrics."""

from __future__ import annotations

from collections import Counter

from data_engineering_project_spotify_app_spark.operators import registry

registry.load_all_modules()

SF = "/root/testdata/sf0.001"


def _trigrams(text: str) -> set[str]:
    t = text.lower().split()
    return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}


def test_ngram_novelty_matches_bruteforce(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    df = Counter()
    per_doc = {d: _trigrams(t) for d, t in docs.items()}
    for grams in per_doc.values():
        df.update(grams)
    got = {
        r["doc_id"]: (r["n_distinct_trigrams"], r["novel_share"])
        for r in registry.QUERIES["q_ngram_novelty"](spark, SF).collect()
    }
    for d, grams in per_doc.items():
        if not grams:
            assert d not in got
            continue
        novel = sum(1 for g in grams if df[g] == 1)
        assert got[d][0] == len(grams)
        # Spark rounds HALF_UP, Python banker's — compare pre-round.
        assert abs(got[d][1] - novel / len(grams)) < 5e-5


def test_token_entropy_matches_bruteforce(spark):
    import math

    docs = {
        r["doc_id"]: r["text"].lower().split()
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    got = {
        r["doc_id"]: r
        for r in registry.QUERIES["q_token_entropy"](spark, SF).collect()
    }
    for d, toks in docs.items():
        if not toks:
            assert d not in got
            continue
        n = len(toks)
        cnt = Counter(toks)
        h = -sum(c / n * math.log2(c / n) for c in cnt.values())
        assert got[d]["n_tokens"] == n
        assert got[d]["n_types"] == len(cnt)
        assert abs(got[d]["token_entropy"] - h) < 5e-4
        assert abs(got[d]["ttr"] - len(cnt) / n) < 5e-5
        # uniform-repeat floor / distinct-ceiling sanity
        assert -1e-9 <= got[d]["token_entropy"] <= math.log2(n) + 1e-9


def test_trigram_kneser_ney_matches_bruteforce(spark):
    """Full two-level KN recursion recomputed sequentially in Python."""
    import math

    D = 0.75
    docs = {
        r["doc_id"]: r["text"].lower().split()
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    tc: Counter = Counter()
    per_doc: dict[int, list[tuple[str, str, str]]] = {}
    for d, t in docs.items():
        tris = [(t[i], t[i + 1], t[i + 2]) for i in range(len(t) - 2)]
        per_doc[d] = tris
        tc.update(tris)
    ctot: Counter = Counter()
    n1mid: Counter = Counter()
    mid: Counter = Counter()
    wmid: Counter = Counter()
    for (w1, w2, w3), c in tc.items():
        ctot[(w1, w2)] += c
        n1mid[(w1, w2)] += 1
        mid[(w2, w3)] += 1
        wmid[w2] += 1
    fol: Counter = Counter()
    cont: Counter = Counter()
    for w2, w3 in mid:
        fol[w2] += 1
        cont[w3] += 1
    npairs = len(mid)
    got = {
        r["doc_id"]: r
        for r in registry.QUERIES["q_lm_kneser_ney_3"](spark, SF).collect()
    }
    for d, tris in per_doc.items():
        if not tris:
            assert d not in got
            continue
        lps = []
        for w1, w2, w3 in tris:
            plow = (mid[(w2, w3)] - D) / wmid[w2] + D * fol[w2] / wmid[
                w2
            ] * cont[w3] / npairs
            p = (tc[(w1, w2, w3)] - D) / ctot[(w1, w2)] + D * n1mid[
                (w1, w2)
            ] / ctot[(w1, w2)] * plow
            lps.append(math.log(p))
        assert got[d]["n_trigrams"] == len(tris)
        assert abs(got[d]["avg_logprob"] - sum(lps) / len(lps)) < 5e-4
