"""Property-based winnowing invariants (hypothesis).

The load-bearing law behind both winnowing granularities is the MOSS
guarantee the operator docstrings promise (dedup.py — Schleimer/
Wilkerson/Aiken's winnowing theorem): selecting the minimum hash of
every window of W consecutive K-gram hashes means ANY substring shared
by two documents of length ≥ K + W - 1 chars (resp. any shared run of
K + W - 1 words) contains a full shared window, and the minimum hash
VALUE of that window is selected by both documents — so their
fingerprint sets intersect, regardless of everything else in either
document. Oracle parity checks a fixed corpus; these tests check the
theorem itself on adversarial random documents.

Each hypothesis example is a BATCH of generated pairs pushed through
one Spark job (the per-example cost is a jobs-not-rows regime at this
size, so batching keeps the suite fast — same pattern as
test_graph_properties).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.operators.dedup import (
    WINNOW_K,
    WINNOW_W,
    WINNOW_WORD_K,
    WINNOW_WORD_W,
    winnow_fingerprints_df,
    winnow_word_fingerprints_df,
)

_ALPHA = "abcdefghijklmnopqrstuvwxyz"

# random lowercase filler (no spaces: keeps char-gram content exactly
# as generated; the char pipeline lowercases, so lowercase input makes
# generation == what is fingerprinted)
_filler = st.text(alphabet=_ALPHA, min_size=0, max_size=40)

# a shared chunk long enough to trigger the char guarantee
_shared_chars = st.text(
    alphabet=_ALPHA, min_size=WINNOW_K + WINNOW_W - 1, max_size=60
)

_word = st.text(alphabet=_ALPHA, min_size=1, max_size=8)

# a shared run of ≥ K + W - 1 words for the word guarantee
_shared_words = st.lists(
    _word, min_size=WINNOW_WORD_K + WINNOW_WORD_W - 1, max_size=14
)

_char_pairs = st.lists(
    st.tuples(_filler, _shared_chars, _filler, _filler, _filler),
    min_size=1,
    max_size=12,
)

_word_pairs = st.lists(
    st.tuples(
        st.lists(_word, max_size=6),
        _shared_words,
        st.lists(_word, max_size=6),
        st.lists(_word, max_size=6),
        st.lists(_word, max_size=6),
    ),
    min_size=1,
    max_size=12,
)


def _assert_every_pair_shares_a_fingerprint(spark, rows, fps_fn):
    """rows: (doc_id, text) with pair i = ids (2i, 2i+1). Asserts the
    fingerprint sets of every pair intersect — ONE Spark job for the
    whole batch (self-join on fp, count distinct intersecting pairs)."""
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fp = fps_fn(docs)
    a = fp.select((F.col("doc_id") / 2).cast("long").alias("p"), "fp",
                  F.col("doc_id").alias("da"))
    b = fp.select((F.col("doc_id") / 2).cast("long").alias("p"),
                  F.col("fp").alias("fpb"), F.col("doc_id").alias("db"))
    hit = (
        a.join(b, ["p"])
        .filter((F.col("da") < F.col("db")) & (F.col("fp") == F.col("fpb")))
        .select("p")
        .distinct()
        .count()
    )
    assert hit == len(rows) // 2, (
        f"only {hit}/{len(rows) // 2} generated pairs share a "
        "fingerprint — the winnowing guarantee is broken"
    )


@settings(max_examples=8, deadline=None)
@given(_char_pairs)
def test_char_winnow_guarantee_shared_substring(spark, pairs):
    """Any two docs sharing a substring of ≥ WINNOW_K + WINNOW_W - 1
    chars MUST share a winnowing fingerprint, whatever surrounds it."""
    rows = []
    for i, (pre_a, shared, suf_a, pre_b, suf_b) in enumerate(pairs):
        rows.append((2 * i, pre_a + shared + suf_a))
        rows.append((2 * i + 1, pre_b + shared + suf_b))
    _assert_every_pair_shares_a_fingerprint(
        spark, rows, winnow_fingerprints_df
    )


@settings(max_examples=8, deadline=None)
@given(_word_pairs)
def test_word_winnow_guarantee_shared_run(spark, pairs):
    """Any two docs sharing a run of ≥ WINNOW_WORD_K + WINNOW_WORD_W - 1
    words MUST share a word-gram winnowing fingerprint — and the law is
    whitespace-robust: the two docs join their words with DIFFERENT
    whitespace (the exact robustness the word granularity exists for)."""
    rows = []
    for i, (pre_a, shared, suf_a, pre_b, suf_b) in enumerate(pairs):
        rows.append((2 * i, " ".join(pre_a + shared + suf_a)))
        rows.append((2 * i + 1, "  ".join(pre_b + shared + suf_b)))
    _assert_every_pair_shares_a_fingerprint(
        spark, rows, winnow_word_fingerprints_df
    )
