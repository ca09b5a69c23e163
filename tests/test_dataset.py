"""Dataset-op properties: split stability/proportions, sample uniformity."""

from __future__ import annotations

from data_engineering_project_spotify_app_spark.operators import registry

registry.load_all_modules()


def test_split_is_stable_and_partitioned(spark, sf_dir):
    a = {r["doc_id"]: r["split"] for r in
         registry.QUERIES["q_dataset_split"](spark, sf_dir).collect()}
    b = {r["doc_id"]: r["split"] for r in
         registry.QUERIES["q_dataset_split"](spark, sf_dir).collect()}
    assert a == b  # pure function of the key: identical on recompute
    from collections import Counter

    c = Counter(a.values())
    n = sum(c.values())
    assert set(c) == {"train", "val", "test"}
    assert 0.6 < c["train"] / n < 0.9     # nominal 12/16 = 0.75
    assert 0.05 < c["val"] / n < 0.22     # nominal 2/16
    assert 0.05 < c["test"] / n < 0.22


def test_stratified_sample_rate_per_stratum(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.tables import table

    totals = {
        r["lang"]: r["count"]
        for r in table(spark, sf_dir, "documents").groupBy("lang").count().collect()
    }
    sampled = {}
    for r in registry.QUERIES["q_stratified_sample"](spark, sf_dir).collect():
        sampled[r["lang"]] = sampled.get(r["lang"], 0) + 1
    for lang, total in totals.items():
        rate = sampled.get(lang, 0) / total
        assert 0.10 < rate < 0.45, f"{lang}: rate {rate} (nominal 0.25)"


def test_tfidf_ranks_rare_terms_over_common(spark):
    rows = [
        (1, "apple apple apple common common", "en", "s", 30),
        (2, "banana common common common", "en", "s", 25),
        (3, "cherry common", "en", "s", 12),
    ]
    import tempfile

    out = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{out}/documents.parquet")
    top1 = {
        r["doc_id"]: r["term"]
        for r in registry.QUERIES["q_tfidf_topterms"](spark, out).collect()
        if r["rnk"] == 1
    }
    # the doc-unique term must out-rank 'common' (df=3) everywhere
    assert top1 == {1: "apple", 2: "banana", 3: "cherry"}


def test_pii_patterns_redact_crafted_text(spark):
    """The synthetic corpus contains no PII; prove the patterns on
    crafted rows (both count and masked output)."""
    from pyspark.sql import functions as F

    from data_engineering_project_spotify_app_spark.operators.textops import (
        PII_EMAIL,
        PII_IPV4,
        PII_PHONE,
    )

    df = spark.createDataFrame(
        [
            (1, "mail a@b.co or c.d+x@e-f.org, host 10.0.255.1, tel +1 555-867-5309"),
            (2, "no pii here"),
        ],
        "doc_id int, text string",
    )
    scrub = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"),
            PII_IPV4,
            "<IP>",
        ),
        PII_PHONE,
        "<PHONE>",
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL), 0)).alias("e"),
            F.size(F.regexp_extract_all("text", F.lit(PII_IPV4), 0)).alias("i"),
            F.size(F.regexp_extract_all("text", F.lit(PII_PHONE), 0)).alias("p"),
            scrub.alias("s"),
        ).collect()
    }
    assert (rows[1]["e"], rows[1]["i"], rows[1]["p"]) == (2, 1, 1)
    assert rows[1]["s"] == "mail <EMAIL> or <EMAIL>, host <IP>, tel <PHONE>"
    assert rows[2]["s"] == "no pii here"


def test_weighted_sample_matches_sequential_reference(spark):
    """A-ES race recomputed in pure Python (hashlib md5, same hex→int
    arithmetic) must select the same K docs in the same order."""
    import hashlib
    import math

    from data_engineering_project_spotify_app_spark.operators import (
        dataset as ds,
        registry,
    )

    registry.load_all_modules()
    sf = "/root/testdata/sf0.001"
    rows = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    )
    keyed = []
    for r in rows:
        if r["n_chars"] <= 0:
            continue
        h = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()
        u = (int(h[:8], 16) + 1.0) / 4294967297.0
        keyed.append((-math.log(u) / r["n_chars"], r["doc_id"], r["n_chars"]))
    keyed.sort()
    expect = [
        (d, n, round(k, 6)) for k, d, n in keyed[: ds.WSAMPLE_K]
    ]
    got = [
        (r["doc_id"], r["weight"], r["sample_key"])
        for r in registry.QUERIES["q_weighted_sample"](spark, sf).collect()
    ]
    assert got == expect


def test_weighted_sample_plan_is_topk(spark):
    from data_engineering_project_spotify_app_spark.operators import registry
    from tests.test_plans import plan_of

    registry.load_all_modules()
    plan = plan_of(spark, "/root/testdata/sf0.001", "q_weighted_sample")
    assert "TakeOrderedAndProject" in plan, plan


def test_token_budget_sample_is_maximal_prefix(spark):
    """Kept docs are the maximal md5-ordered prefix per source: every
    kept cum ≤ budget, and the FIRST excluded doc of each non-exhausted
    source would have pushed the running total past the budget."""
    import hashlib

    from data_engineering_project_spotify_app_spark.operators import (
        dataset as ds,
        registry,
    )

    registry.load_all_modules()
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").collect()
    by_src: dict[str, list] = {}
    for r in docs:
        n_tok = len(r["text"].lower().split())
        pri = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()
        by_src.setdefault(r["source"], []).append((pri, r["doc_id"], n_tok))
    got = {
        (r["source"], r["doc_id"]): r["cum_tokens"]
        for r in registry.QUERIES["q_token_budget_sample"](spark, sf).collect()
    }
    for src, lst in by_src.items():
        lst.sort()
        cum = 0
        for pri, doc_id, n_tok in lst:
            cum += n_tok
            if cum <= ds.TOKEN_BUDGET:
                assert got.pop((src, doc_id)) == cum
            else:
                assert (src, doc_id) not in got
    assert not got  # nothing kept outside the prefix


def test_token_budget_sample_no_global_window(spark):
    from data_engineering_project_spotify_app_spark.operators import registry
    from tests.test_plans import plan_of

    registry.load_all_modules()
    plan = plan_of(spark, "/root/testdata/sf0.001", "q_token_budget_sample")
    # window must be partitioned by source, never a global sort
    assert "hashpartitioning(source" in plan, plan
    assert "SinglePartition" not in plan, plan
