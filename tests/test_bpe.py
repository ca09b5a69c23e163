"""BPE training vs a pure-Python reference implementation.

q_bpe_train is registered rows-only (iterative — the driver contract's
carve-out), so THIS file is its correctness gate: the distributed
fold-based merge learner must produce exactly the merges the sequential
reference algorithm produces, including greedy leftmost non-overlap
semantics and the lexicographic tie-break.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings, strategies as st

from data_engineering_project_spotify_app_spark.operators.bpe import (
    EOW,
    bpe_train,
    word_counts,
)


def _ref_bpe(freqs: dict[str, int], n_merges: int):
    """Sequential reference: Sennrich-style BPE on a word-freq dict."""
    vocab = {tuple(list(w) + [EOW]): n for w, n in freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        (l, r), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((l, r, freq))
        new_vocab: dict[tuple, int] = {}
        for syms, n in vocab.items():
            out, pend = [], None
            for s in syms:
                if pend == l and s == r:
                    out.append(l + r)
                    pend = None
                else:
                    if pend is not None:
                        out.append(pend)
                    pend = s
            if pend is not None:
                out.append(pend)
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def _freq_df(spark, freqs):
    return spark.createDataFrame(
        [(w, n) for w, n in freqs.items()], "word string, n bigint"
    )


def test_bpe_matches_reference_on_fixture(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    wc = word_counts(docs)
    freqs = {r["word"]: r["n"] for r in wc.collect()}
    got = bpe_train(wc, 6)
    assert got == _ref_bpe(freqs, 6)


_words = st.dictionaries(
    st.text(alphabet="abc", min_size=1, max_size=6),
    st.integers(1, 50),
    min_size=1,
    max_size=10,
)


@given(freqs=_words)
@settings(max_examples=8, deadline=None, derandomize=True)
def test_bpe_matches_reference_property(spark, freqs):
    """Adversarial corpora (repeated chars force overlapping-merge and
    tie-break edge cases) — distributed learner == sequential reference."""
    got = bpe_train(_freq_df(spark, freqs), 4)
    assert got == _ref_bpe(freqs, 4)


def _ref_encode(text: str, merges) -> int:
    toks = 0
    for w in text.split():
        syms = list(w) + [EOW]
        for l, r, _ in merges:
            out, pend = [], None
            for s in syms:
                if pend == l and s == r:
                    out.append(l + r)
                    pend = None
                else:
                    if pend is not None:
                        out.append(pend)
                    pend = s
            if pend is not None:
                out.append(pend)
            syms = out
        toks += len(syms)
    return toks


def test_bpe_encode_matches_reference(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
    )
    from data_engineering_project_spotify_app_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    merges = bpe_train(word_counts(docs), 6)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode(docs, merges).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        n_words = len(row["text"].split())
        want = _ref_encode(row["text"], merges)
        assert got[row["doc_id"]] == (n_words, want), row["doc_id"]


def test_arrow_encode_equals_fold_encode(spark):
    """The mapInPandas repeated-min-rank encoder and the JVM one-pass-
    per-merge fold must agree exactly on a trained merge table."""
    from data_engineering_project_spotify_app_spark.operators.bpe import (
        bpe_encode,
        bpe_encode_arrow,
        bpe_train,
        word_counts,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = bpe_train(word_counts(docs), 6)
    a = sorted(map(tuple, bpe_encode(docs, merges).collect()))
    b = sorted(map(tuple, bpe_encode_arrow(docs, merges).collect()))
    assert a == b
