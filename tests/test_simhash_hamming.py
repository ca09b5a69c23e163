"""SimHash Hamming pairing: pigeonhole completeness vs brute force.

The multi-index blocking (4 × 16-bit blocks) must find EVERY pair
within Hamming distance 3 — pigeonhole guarantees a pair differing in
at most 3 blocks shares one intact block. The test brute-forces all
C(n,2) Hamming distances from the signature frame itself, so it checks
the blocking + array-side distance arithmetic end-to-end, independent
of the DuckDB oracle.
"""

from __future__ import annotations

import itertools
import random

from data_engineering_project_spotify_app_spark.operators.dedup import (
    HAMMING_MAX,
    simhash_hamming_pairs_df,
    simhash_signatures_df,
)

WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango",
]


def _mk_docs():
    rng = random.Random(7)
    docs = []
    for i in range(12):
        base = [rng.choice(WORDS) for _ in range(30)]
        docs.append((f"d{i:03}_a", " ".join(base)))
        # exact copy -> hamming 0 pair
        docs.append((f"d{i:03}_b", " ".join(base)))
        # one-word mutation -> small (usually <= HAMMING_MAX) distance
        mut = list(base)
        mut[rng.randrange(len(mut))] = rng.choice(WORDS)
        docs.append((f"d{i:03}_c", " ".join(mut)))
    return docs


def test_hamming_pairs_match_bruteforce(spark):
    docs = spark.createDataFrame(_mk_docs(), "doc_id string, text string")
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_hamming_pairs_df(docs).collect()
    }

    sigs = {
        r.doc_id: r.simhash for r in simhash_signatures_df(docs).collect()
    }
    expected = set()
    for a, b in itertools.combinations(sorted(sigs), 2):
        hd = sum(x != y for x, y in zip(sigs[a], sigs[b]))
        if hd <= HAMMING_MAX:
            expected.add((a, b, hd))

    assert got == expected
    # the exact-copy pairs are all present at distance 0
    zero = {(a, b) for a, b, h in got if h == 0}
    assert all((f"d{i:03}_a", f"d{i:03}_b") in zero for i in range(12))
    # and at least one mutated copy landed within the threshold but
    # above zero, so the test exercises non-trivial distances
    assert any(h > 0 for _, _, h in got)
