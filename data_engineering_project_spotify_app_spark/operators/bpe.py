"""BPE tokenizer training — the canonical tokenizer-prep step, as a
distributed iterative operator.

Classic byte-pair encoding (Sennrich et al. 2016) trains on the WORD
FREQUENCY table, not the raw corpus: words split into character symbols
(+ an end-of-word marker), and each round (1) counts adjacent symbol
pairs weighted by word frequency, (2) picks the most frequent pair
(lexicographic tie-break — deterministic), (3) merges its leftmost
non-overlapping occurrences in every word. The learned merge list IS the
tokenizer.

Spark shape: the vocab frame is corpus-vocabulary-sized (millions of
rows at 100 TB — DataFrame-scale, tiny next to the corpus); pair counts
are a map-side-combined explode+sum; the merge application is an
``F.aggregate`` fold with a struct accumulator — JVM-side, no UDF. The
per-round argmax is a 1-row collect (the same scalar driver decision as
the connected-components convergence check); each round's symbol column
is localCheckpoint-ed so lineage doesn't stack N plans deep.

Registered rows-only (the driver contract's carve-out for iterative
algorithms — no single SQL statement expresses N data-dependent merge
rounds); semantics are pinned against a pure-Python reference BPE in
tests/test_bpe.py instead.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.functions.text import tokens
from data_engineering_project_spotify_app_spark.operators.registry import query
from data_engineering_project_spotify_app_spark.tables import table_parallel

EOW = "</w>"

# Java regex \s — ASCII whitespace only, matching the JVM-side tokens()
# helper. (Python's str.split() would also split on Unicode whitespace.)
_JAVA_WS = re.compile("[ \t\n\x0b\f\r]+")
N_MERGES = 6


def word_counts(docs: DataFrame) -> DataFrame:
    """(word, n) frequency table — BPE's training input."""
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _merge_pair(syms: Column, left: str, right: str) -> Column:
    """Merge leftmost non-overlapping (left, right) occurrences in a
    symbol array — a single JVM-side fold (no UDF). The accumulator
    carries (emitted symbols, one pending symbol); a match emits the
    concatenation and clears the pending slot, so 'a a a' under (a,a)
    yields [aa, a] — the greedy BPE contract."""
    empty = F.array().cast("array<string>")
    init = F.struct(empty.alias("out"), F.lit("").alias("pend"))
    step = lambda acc, s: F.when(  # noqa: E731
        (acc.pend == left) & (s == right),
        F.struct(
            F.concat(acc.out, F.array(F.lit(left + right))).alias("out"),
            F.lit("").alias("pend"),
        ),
    ).otherwise(
        F.struct(
            F.when(acc.pend == "", acc.out)
            .otherwise(F.concat(acc.out, F.array(acc.pend)))
            .alias("out"),
            s.alias("pend"),
        )
    )
    finish = lambda acc: F.when(acc.pend == "", acc.out).otherwise(  # noqa: E731
        F.concat(acc.out, F.array(acc.pend))
    )
    return F.aggregate(syms, init, step, finish)


def bpe_train(words: DataFrame, n_merges: int) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from a (word, n) frequency frame.

    Returns [(left, right, weighted_freq), ...] in learned order.
    """
    # LAZY checkpoints throughout the merge loop: each round's top-pair
    # collect materializes the current vocab checkpoint as its side
    # effect, so a round costs ONE Spark job instead of two (the eager
    # form paid a separate materialization pass per round — same
    # diagnosis as the CC convergence loop, clusters.py r11).
    vocab = words.select(
        "n",
        F.concat(
            F.expr("filter(split(word, ''), x -> x <> '')"),
            F.array(F.lit(EOW)),
        ).alias("syms"),
    ).localCheckpoint(eager=False)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        sz = F.size("syms")
        pairs = F.zip_with(
            F.slice("syms", 1, F.greatest(sz - 1, F.lit(0))),
            F.slice("syms", 2, F.greatest(sz - 1, F.lit(0))),
            lambda x, y: F.struct(x.alias("l"), y.alias("r")),
        )
        top = (
            vocab.select("n", F.explode(pairs).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("freq"))
            .orderBy(F.col("freq").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        row = top[0]
        merges.append((row["l"], row["r"], int(row["freq"])))
        vocab = vocab.select(
            "n", _merge_pair(F.col("syms"), row["l"], row["r"]).alias("syms")
        ).localCheckpoint(eager=False)
    return merges


@query("q_bpe_train")  # rows-only: iterative, driver-contract carve-out
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the top-6 BPE merges from the documents corpus and return
    the merge table (rank, left, right, freq) — deterministic via the
    lexicographic tie-break, pinned against a pure-Python reference in
    tests/test_bpe.py."""
    d = table_parallel(spark, sf_dir, "documents")
    merges = bpe_train(word_counts(d), N_MERGES)
    return spark.createDataFrame(
        [(i + 1, l, r, f) for i, (l, r, f) in enumerate(merges)],
        "rank int, left string, right string, freq bigint",
    )


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str, int]]) -> DataFrame:
    """Encode documents with a learned merge table: per word, split to
    chars + EOW and apply every merge in rank order — the same JVM-side
    fold as training, N_MERGES successive array transforms inside ONE
    projection (merges are plan constants; no joins, no shuffle except
    the per-doc count aggregation). Output (doc_id, n_words,
    n_bpe_tokens): the compression ratio n_bpe_tokens/n_words is the
    tokenizer-fertility metric corpus reports quote.

    Scale: pure map over the corpus — the merge table rides in the
    plan; a production tokenizer with 50k merges would switch to an
    Arrow-batched pandas UDF over a broadcast merge dict, but at the
    N_MERGES scale the unrolled codegen fold is strictly faster.
    """
    word = F.explode(tokens(F.col("text"))).alias("word")
    per_word = docs.select("doc_id", word)
    syms = F.concat(
        F.expr("filter(split(word, ''), x -> x <> '')"),
        F.array(F.lit(EOW)),
    )
    for left, right, _ in merges:
        syms = _merge_pair(syms, left, right)
    # Measured and kept as-is (r14 optimization round): folding per
    # token INSTANCE (0.62 s at sf0.1) beats the encode-the-vocab-then-
    # join-counts-back rewrite (1.61 s) — the fixture vocabulary is 31
    # words, so the dedup-join's two extra shuffles cost more than the
    # 270 k cheap folds they avoid; the Arrow path (bpe_encode_arrow)
    # remains the memoized form for open vocabularies.
    return (
        per_word.select("doc_id", F.size(syms).alias("k"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("k").cast("bigint").alias("n_bpe_tokens"),
        )
    )


@query("q_bpe_encode")  # rows-only: consumes the iterative training output
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the merges q_bpe_train learns from it
    and report per-doc word/BPE-token counts — train + apply as one
    driver query. Reference-pinned in tests/test_bpe.py."""
    d = table_parallel(spark, sf_dir, "documents")
    merges = bpe_train(word_counts(d), N_MERGES)
    return bpe_encode(d, merges)


def bpe_encode_arrow(
    docs: DataFrame, merges: list[tuple[str, str, int]]
) -> DataFrame:
    """The 50k-merge scale path of :func:`bpe_encode`: an Arrow-batched
    ``mapInPandas`` encoder over a BROADCAST merge-rank dict, instead of
    unrolling every merge into the projection. The plan-constant fold
    costs O(n_merges · word_len) per word — unbeatable at 6 merges,
    unusable at 50k (the codegen'd plan itself becomes megabytes); this
    path does the tokenizer-standard repeated-min-rank merge, O(len²)
    worst case per word but INDEPENDENT of merge-table size, with a
    per-batch word memo (Zipf makes the memo hit rate ~the corpus
    type/token ratio).

    One-pass-per-merge-in-rank-order (the fold) and repeated-min-rank
    (this path) agree on every TRAINED merge table: a merge's operands
    can only be created by strictly lower-rank merges, so by the time a
    rank is considered its inputs are final — exact equivalence is
    pinned against bpe_encode in tests/test_bpe.py.

    Scale: pure map (zero shuffle before the per-doc count agg); the
    rank dict ships once per executor via the closure (broadcast-sized:
    50k pairs ≈ 2 MB), batches stream through Arrow.
    """
    import pandas as pd

    rank = {(left, right): i for i, (left, right, _) in enumerate(merges)}

    def encode_word(word: str, memo: dict) -> int:
        hit = memo.get(word)
        if hit is not None:
            return hit
        syms = list(word) + [EOW]
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                r = rank.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best = r
            if best is None:
                break
            left, right = merges[best][0], merges[best][1]
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        memo[word] = len(syms)
        return len(syms)

    def encode_batches(batches):
        memo: dict = {}
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # Java-regex \s class ([ \t\n\x0b\f\r]), NOT str.split():
                # Python's split treats all Unicode whitespace (NBSP,
                # U+2028, \x85...) as separators, which would diverge
                # from the shared tokens() helper the fold encoder uses.
                words = [w for w in _JAVA_WS.split(text or "") if w]
                if not words:
                    continue  # bpe_encode drops zero-word docs too
                rows.append(
                    (
                        doc_id,
                        len(words),
                        sum(encode_word(w, memo) for w in words),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_words", "n_bpe_tokens"]
            )

    return docs.select("doc_id", "text").mapInPandas(
        encode_batches, "doc_id bigint, n_words bigint, n_bpe_tokens bigint"
    )


@query("q_bpe_encode_arrow")  # rows-only: consumes iterative training output
def q_bpe_encode_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_bpe_encode through the Arrow scale path — same train step, the
    mapInPandas broadcast-rank encoder instead of the unrolled fold.
    Exact equivalence with the fold encoder is pinned in
    tests/test_bpe.py; registered so the driver exercises the Python
    batch path end-to-end."""
    d = table_parallel(spark, sf_dir, "documents")
    merges = bpe_train(word_counts(d), N_MERGES)
    return bpe_encode_arrow(d, merges)
