"""Retrieval operators: independent references + plan-shape pins."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from data_engineering_project_spotify_app_spark.operators import registry, search
from tests.test_plans import plan_of

registry.load_all_modules()

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    return {
        r["doc_id"]: [t for t in re.split(r"\s+", r["text"]) if t]
        for r in rows
    }


def test_inverted_index_matches_reference(spark, corpus):
    ref: dict[str, list[int]] = {}
    for doc_id in sorted(corpus):
        for t in set(corpus[doc_id]):
            ref.setdefault(t, []).append(doc_id)
    got = {
        r["term"]: (r["df"], r["postings"])
        for r in registry.QUERIES["q_inverted_index"](spark, SF).collect()
    }
    assert got == {
        t: (len(ps), ",".join(str(p) for p in ps)) for t, ps in ref.items()
    }


def test_bm25_matches_reference(spark, corpus):
    n = len(corpus)
    df = Counter()
    for toks in corpus.values():
        df.update(set(toks))
    qterms = sorted(df, key=lambda t: (df[t], t))[: search.BM25_QUERY_TERMS]
    avgdl = sum(len(t) for t in corpus.values()) / n
    scores = {}
    for doc_id, toks in corpus.items():
        tf = Counter(toks)
        s, hits = 0.0, 0
        for q in qterms:
            if tf[q] == 0:
                continue
            hits += 1
            idf = math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
            s += (
                idf
                * tf[q]
                * (search.BM25_K1 + 1.0)
                / (
                    tf[q]
                    + search.BM25_K1
                    * (
                        1.0
                        - search.BM25_B
                        + search.BM25_B * len(toks) / avgdl
                    )
                )
            )
        if hits:
            scores[doc_id] = (round(s, 4), hits)
    top = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[
        : search.BM25_TOP_K
    ]
    got = [
        (r["doc_id"], (r["score"], r["n_terms_hit"]))
        for r in registry.QUERIES["q_bm25_search"](spark, SF).collect()
    ]
    assert [(d, (pytest.approx(s, abs=1e-6), h)) for d, (s, h) in top] == got


def test_chunking_covers_every_token_in_order(spark, corpus):
    rows = registry.QUERIES["q_chunk_documents"](spark, SF).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {d for d, t in corpus.items() if t}
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        toks = corpus[doc_id]
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            start = c["chunk_id"] * search.CHUNK_STRIDE
            want = toks[start : start + search.CHUNK_TOKENS]
            assert c["chunk_text"].split(" ") == want
            assert c["n_tokens"] == len(want)
        # stride coverage: last chunk starts before n, so the union of
        # [start, start+W) windows covers [0, n)
        last = chunks[-1]["chunk_id"] * search.CHUNK_STRIDE
        assert last < len(toks) <= last + search.CHUNK_TOKENS


def test_pmi_sign_semantics(spark, corpus):
    """PMI > 0 iff the pair co-occurs more often than independence
    predicts — spot-check every returned row against raw counts."""
    n = len(corpus)
    df = Counter()
    co = Counter()
    for toks in corpus.values():
        s = sorted(set(toks))
        df.update(s)
        co.update((a, b) for i, a in enumerate(s) for b in s[i + 1 :])
    rows = registry.QUERIES["q_cooccurrence_pmi"](spark, SF).collect()
    assert rows, "PMI query returned nothing at fixture scale"
    for r in rows:
        n_ab = co[(r["term_a"], r["term_b"])]
        assert r["n_ab"] == n_ab
        expect = math.log(
            n_ab * n / (df[r["term_a"]] * df[r["term_b"]])
        )
        assert r["pmi"] == pytest.approx(expect, abs=1e-4)


def test_bm25_topk_avoids_global_sort(spark):
    plan = plan_of(spark, SF, "q_bm25_search")
    assert "TakeOrderedAndProject" in plan, plan


def test_chunking_has_no_shuffle(spark):
    plan = plan_of(spark, SF, "q_chunk_documents")
    # the only allowed Exchange is the small-fixture repartition of the
    # input scan (table_parallel); nothing downstream of Generate may
    # shuffle. Count plan NODES (details headers "(n) Exchange"), since
    # formatted explain prints each node once in the tree and once in
    # the details section.
    import re

    nodes = re.findall(r"\(\d+\) Exchange", plan)
    assert len(nodes) <= 1, plan


def test_bm25_query_side_broadcasts(spark):
    plan = plan_of(spark, SF, "q_bm25_search")
    assert "BroadcastHashJoin" in plan, plan


def test_degenerate_docs_cross_engine_parity_retrieval(spark):
    """Empty / 1-token / duplicate documents — shapes absent from the
    driver fixtures — must agree between Spark and DuckDB for every
    retrieval/sampling oracle that consumes documents."""
    import tempfile

    import duckdb

    rows = [
        (1, ""),                       # tokenless (n_chars = 0)
        (2, "single"),                 # 1 token
        (3, "a b c"),                  # < chunk width
        (4, "the quick brown fox jumps over the lazy dog again and again"),
        (5, "the quick brown fox jumps over the lazy dog again and again"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' AS lang", "'t' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars",
    )
    names = (
        "q_inverted_index", "q_bm25_search", "q_cooccurrence_pmi",
        "q_chunk_documents", "q_weighted_sample",
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
                tuple(
                    tuple(v) if isinstance(v, list) else v
                    for v in (r[c] for c in scols)
                )
                for r in sdf.collect()
            )
            rel = con.sql(registry.ORACLES[name])
            idx = [rel.columns.index(c) for c in scols]
            drows = sorted(
                tuple(
                    tuple(v) if isinstance(v, list) else v
                    for v in (r[i] for i in idx)
                )
                for r in rel.fetchall()
            )
            assert srows == drows, (name, srows, drows)
