"""Skew-capped LSH / n-gram pair generation on an adversarial fixture.

The cap's whole point is a SKEWED corpus: one boilerplate phrase shared
by many documents creates a degenerate bucket whose C(k,2) pair
explosion would serialize a single task at scale. These tests build that
corpus in-memory and assert the capped variants (a) bound every bucket,
(b) emit a subset of the uncapped pairs, and (c) still find the genuine
near-duplicate pair, whose informative shingles/bands live in small
buckets.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.functions.text import (
    tokens,
    word_bigrams,
)
from data_engineering_project_spotify_app_spark.operators.dedup import (
    minhash_candidate_pairs_df,
    minhash_signatures_df,
    ngram_jaccard_pairs,
)

BOILER = (
    "this document is provided as is without warranty of any kind either "
    "express or implied including but not limited to the implied "
    "warranties of merchantability and fitness for a particular purpose "
    "and noninfringement of third party rights in no event shall the "
    "authors be liable for any claim damages or other liability"
)
N_BOILER_DOCS = 40


@pytest.fixture(scope="module")
def skewed_docs(spark):
    rows = []
    # 40 docs: the long shared boilerplate + a tiny unique tail → every
    # boilerplate shingle has doc-frequency 40, and the min-hash minima
    # come from the shared shingles, so all 40 land in the same band
    # buckets.
    for i in range(N_BOILER_DOCS):
        rows.append((i, "en", "web", f"{BOILER} unique tail token{i}"))
    # one genuine near-dup pair with distinctive content (ids 100, 101)
    core = "the quick brown fox jumps over the lazy dog near the river bank"
    rows.append((100, "en", "web", core + " at dawn"))
    rows.append((101, "en", "web", core + " at dusk"))
    # unrelated singletons
    rows.append((200, "en", "web", "completely different text about spark"))
    rows.append((201, "en", "web", "another unrelated note on dedup caps"))
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )


def _pair_set(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


class TestNgramCapped:
    CAP = 8

    def test_bucket_sizes_bounded(self, spark, skewed_docs):
        sh = (
            skewed_docs.select(
                "doc_id",
                "lang",
                "source",
                word_bigrams(tokens(F.col("text"))).alias("bg"),
            )
            .select("doc_id", "lang", "source", F.explode("bg").alias("shingle"))
        )
        df_counts = sh.groupBy("lang", "source", "shingle").count()
        # the fixture IS skewed: boilerplate shingles blow past the cap
        assert df_counts.agg(F.max("count")).first()[0] >= N_BOILER_DOCS
        kept = df_counts.filter(F.col("count") <= self.CAP)
        assert kept.agg(F.max("count")).first()[0] <= self.CAP

    def test_capped_subset_and_recall(self, skewed_docs):
        uncapped = _pair_set(ngram_jaccard_pairs(skewed_docs))
        capped = _pair_set(ngram_jaccard_pairs(skewed_docs, df_cap=self.CAP))
        assert capped <= uncapped
        # the boilerplate clique dominated the uncapped pair list
        assert len(uncapped) >= N_BOILER_DOCS * (N_BOILER_DOCS - 1) // 2
        # capping removed the clique's quadratic noise ...
        assert len(capped) < len(uncapped) // 10
        # ... but the genuine near-dup (small, informative buckets) stays
        assert (100, 101) in capped


class TestMinhashCapped:
    CAP = 8

    def test_band_buckets_bounded(self, skewed_docs):
        sig = minhash_signatures_df(skewed_docs)
        # boilerplate docs share every band key → degenerate buckets
        from data_engineering_project_spotify_app_spark.operators.dedup import (
            N_BANDS,
            ROWS_PER_BAND,
        )

        band_structs = []
        for band in range(N_BANDS):
            cols = [
                f"h{band * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
            ]
            band_structs.append(
                F.struct(
                    F.lit(band).alias("band"),
                    F.md5(
                        F.concat_ws(
                            "|", *[F.col(c).cast("string") for c in cols]
                        )
                    ).alias("band_key"),
                )
            )
        bands = sig.select(
            "doc_id", F.explode(F.array(*band_structs)).alias("bk")
        ).select("doc_id", "bk.band", "bk.band_key")
        sizes = bands.groupBy("band", "band_key").count()
        # ≥ boilerplate-clique size minus a couple of strays whose minima
        # came from the unique tail
        assert sizes.agg(F.max("count")).first()[0] >= N_BOILER_DOCS - 2

    def test_capped_subset_and_recall(self, skewed_docs):
        sig = minhash_signatures_df(skewed_docs)
        uncapped = _pair_set(minhash_candidate_pairs_df(sig))
        capped = _pair_set(
            minhash_candidate_pairs_df(sig, bucket_cap=self.CAP)
        )
        assert capped <= uncapped
        assert len(uncapped) >= N_BOILER_DOCS * (N_BOILER_DOCS - 1) // 2
        # every boilerplate-clique pair came from over-cap buckets only
        assert all(a >= 100 for a, _ in capped)
        # the genuine near-dup pair survives in its own 2-doc buckets
        assert (100, 101) in capped


def test_incremental_dedup_equals_filtered_full_pairs(spark, sf_dir):
    """The delta-only pair generation must emit exactly the full LSH
    pair set restricted to pairs touching the new slice — nothing
    missing, no old-vs-old leakage."""
    from pyspark.sql import functions as F

    from data_engineering_project_spotify_app_spark.operators import registry

    registry.load_all_modules()
    incr = {
        (r["doc_a"], r["doc_b"], r["n_bands_matched"])
        for r in registry.QUERIES["q_incremental_dedup"](
            spark, sf_dir
        ).collect()
    }
    full = {
        (r["doc_a"], r["doc_b"], r["n_bands_matched"])
        for r in registry.QUERIES["q_minhash_lsh"](spark, sf_dir)
        .filter(
            (F.pmod("doc_a", F.lit(10)) < 2) | (F.pmod("doc_b", F.lit(10)) < 2)
        )
        .collect()
    }
    assert incr == full
    assert all(a % 10 < 2 or b % 10 < 2 for a, b, _ in incr)


def test_containment_catches_excerpt_jaccard_misses(spark, tmp_path):
    """A paragraph fully embedded in a 10x-longer doc must pass the
    containment join with low Jaccard — the asymmetric-inclusion case
    a symmetric Jaccard threshold structurally misses."""
    from data_engineering_project_spotify_app_spark.operators import registry

    registry.load_all_modules()
    excerpt = " ".join(f"e{i}" for i in range(20))
    host = excerpt + " " + " ".join(f"h{i}" for i in range(200))
    rows = [
        (0, excerpt, "en", "src0", len(excerpt)),
        (1, host, "en", "src0", len(host)),
        (2, " ".join(f"z{i}" for i in range(30)), "en", "src0", 0),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = str(tmp_path / "docs")
    df.write.parquet(f"{out}/documents.parquet")
    res = {
        (r["doc_a"], r["doc_b"]): r
        for r in registry.QUERIES["q_containment_join"](spark, out).collect()
    }
    assert set(res) == {(0, 1)}
    assert res[(0, 1)]["containment"] == 1.0
    assert res[(0, 1)]["jaccard"] < 0.15


def test_granularity_agreement_empty_corpus_matches_oracle(spark, tmp_path):
    """Degenerate-corpus parity for the agreement convention (ADVICE
    r11 item 4): on an EMPTY documents table both engines must report
    agreement = 0.0 (not NULL) and NULL Venn counts — the oracle now
    carries the same count(*)=0 guard as the Spark plan."""
    import duckdb

    from data_engineering_project_spotify_app_spark.operators import (
        dedup,
        registry,
    )
    from data_engineering_project_spotify_app_spark.sources import bucketed

    corpus = str(tmp_path / "empty_corpus")
    spark.createDataFrame(
        [], "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    ).coalesce(1).write.parquet(f"{corpus}/documents.parquet")
    try:
        row = dedup.q_winnow_granularity_agreement(spark, corpus).collect()
        assert len(row) == 1
        s = row[0].asDict()
        assert s["agreement"] == 0.0
        assert s["n_char"] is None and s["n_word"] is None

        con = duckdb.connect()
        try:
            con.sql(
                "CREATE VIEW documents AS SELECT * FROM "
                f"parquet_scan('{corpus}/documents.parquet/*.parquet')"
            )
            d_cols = None
            res = con.sql(
                registry.ORACLES["q_winnow_granularity_agreement"]
            )
            d_cols = list(res.columns)
            d = dict(zip(d_cols, res.fetchall()[0]))
        finally:
            con.close()
        assert d["agreement"] == 0.0
        assert d["n_char"] is None and d["n_word"] is None
    finally:
        bucketed.invalidate_landings(corpus)
        bucketed.drop_landed(
            spark,
            bucketed.landing_table_name("winnow_fingerprints", corpus),
            bucketed.landing_table_name("winnow_word_fingerprints", corpus),
        )


def test_jp_signature_lower_bounds_symmetric_difference(spark, sf_dir):
    """The r15 set-signature prune in q_jaccard_prefix_join is only
    exact if popcount(sig_a XOR sig_b) <= |A(sym-diff)B| for EVERY doc
    pair — a bit set on exactly one side must witness >= 1 element of
    the symmetric difference. Checked exhaustively on the sf0.001
    per-doc frame (all pairs), driving the same _jp_per_doc builder the
    query consumes."""
    from data_engineering_project_spotify_app_spark.operators.dedup import (
        JP_SIG_WORDS,
        _jp_per_doc,
    )

    rows = _jp_per_doc(spark, sf_dir).collect()
    docs = [
        (set(r["ranks"]), [r[f"b{w}"] for w in range(JP_SIG_WORDS)])
        for r in rows
    ]
    assert docs
    for i in range(len(docs)):
        sa, wa = docs[i]
        for j in range(i + 1, len(docs)):
            sb, wb = docs[j]
            pop = sum(
                bin((x ^ y) & ((1 << 64) - 1)).count("1")
                for x, y in zip(wa, wb)
            )
            assert pop <= len(sa ^ sb), (i, j, pop, len(sa ^ sb))
