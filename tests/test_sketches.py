"""Quality bounds for the approximate/sketch operators.

The oracle suite proves the sketches compute exactly what they claim;
these tests prove the claims are USEFUL — error bounds vs exact answers,
recall of LSH candidates vs ground truth, fingerprint locality.
"""

from __future__ import annotations


from data_engineering_project_spotify_app_spark.operators import registry
from data_engineering_project_spotify_app_spark.operators.dedup import (
    JACCARD_THRESHOLD,
)

registry.load_all_modules()


def test_approx_count_distinct_error_bound(spark, sf_dir):
    approx = registry.QUERIES["q_approx_distinct"](spark, sf_dir).first()[
        "approx_parts"
    ]
    exact = registry.QUERIES["q_count_distinct"](spark, sf_dir).first()["n_parts"]
    # rsd=0.01 → generous 5% acceptance band
    assert abs(approx - exact) / exact < 0.05


def _doc_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )


def _near_dup_corpus(spark):
    """10 base docs (disjoint vocabularies) + a near-dup of each (one
    appended word → bigram Jaccard 39/40 ≈ 0.975) + disjoint noise."""
    base = [" ".join(f"w{i}_{j}" for j in range(40)) for i in range(10)]
    rows = []
    for i, t in enumerate(base):
        rows.append((i, t, "en", "src0", len(t)))
        rows.append((100 + i, t + " extraword", "en", "src0", len(t)))
    for i in range(10):  # unrelated noise docs
        t = " ".join(f"n{i}_{j}" for j in range(40))
        rows.append((200 + i, t, "en", "src0", len(t)))
    return _doc_df(spark, rows)


def test_minhash_lsh_recall_on_near_dups(spark, tmp_path):
    """Every (i, 100+i) near-dup pair (bigram Jaccard ≈ 0.85) must be an
    LSH candidate; noise docs must not flood the candidate set."""
    df = _near_dup_corpus(spark)
    out = str(tmp_path / "docs")
    df.write.parquet(f"{out}/documents.parquet")
    cands = registry.QUERIES["q_minhash_lsh"](spark, out).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in cands}
    expected = {(i, 100 + i) for i in range(10)}
    missed = expected - pairs
    assert not missed, f"LSH missed true near-dups: {missed}"
    noise_pairs = {p for p in pairs if p[0] >= 200 or p[1] >= 200}
    assert len(noise_pairs) == 0, f"noise collided: {noise_pairs}"


def test_exact_jaccard_finds_near_dups_and_scores_high(spark, tmp_path):
    df = _near_dup_corpus(spark)
    out = str(tmp_path / "docs")
    df.write.parquet(f"{out}/documents.parquet")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in registry.QUERIES["q_dedup_ngram_jaccard"](spark, out).collect()
    }
    for i in range(10):
        j = got.get((i, 100 + i))
        assert j is not None and j > 0.8, f"pair ({i},{100+i}) jaccard={j}"
    assert all(v >= JACCARD_THRESHOLD for v in got.values())


def test_simhash_locality(spark, tmp_path):
    """Near-dup docs differ in few fingerprint bits; unrelated docs in many."""
    df = _near_dup_corpus(spark)
    out = str(tmp_path / "docs")
    df.write.parquet(f"{out}/documents.parquet")
    fp = {
        r["doc_id"]: r["simhash"]
        for r in registry.QUERIES["q_simhash"](spark, out).collect()
    }

    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))

    near = [ham(fp[i], fp[100 + i]) for i in range(10)]
    far = [ham(fp[i], fp[200 + ((i + 3) % 10)]) for i in range(10)]
    assert max(near) <= 12, f"near-dup hamming too high: {near}"
    assert min(far) >= 15, f"unrelated hamming too low: {far}"


def test_ann_lsh_buckets_identical_vectors_together(spark, tmp_path):
    rows = []
    for i in range(20):
        v = [float((i * 13 + j * 7) % 11 - 5) for j in range(64)]
        rows.append((i, v, i % 3))
        rows.append((100 + i, v, i % 3))  # exact duplicate vector
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    out = str(tmp_path / "emb")
    df.write.parquet(f"{out}/embeddings.parquet")
    pairs = {
        (r["vec_a"], r["vec_b"]): r["sim"]
        for r in registry.QUERIES["q_ann_lsh"](spark, out).collect()
    }
    for i in range(20):
        assert (i, 100 + i) in pairs, f"identical pair {i} not bucketed together"
        assert abs(pairs[(i, 100 + i)] - 1.0) < 1e-6


def test_cosine_topk_matches_numpy_bruteforce(spark, sf_dir):
    """Cross-check the HOF vector math against numpy on the fixtures."""
    import numpy as np

    from data_engineering_project_spotify_app_spark.tables import table

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in table(spark, sf_dir, "embeddings").collect()
    }
    got = registry.QUERIES["q_cosine_topk"](spark, sf_dir).collect()
    for r in got:
        a, b = emb[r["query_id"]], emb[r["neighbor_id"]]
        sim = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(round(sim, 4) - r["sim"]) <= 1e-4


def test_approx_quantile_error_bound(spark, sf_dir):
    approx = {
        r["l_returnflag"]: (r["p50_approx"], r["p95_approx"])
        for r in registry.QUERIES["q_approx_quantile"](spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: (r["p50"], r["p95"])
        for r in registry.QUERIES["q_percentiles"](spark, sf_dir).collect()
    }
    for flag, (p50a, p95a) in approx.items():
        p50e, p95e = exact[flag]
        assert abs(p50a - p50e) / p50e < 0.02
        assert abs(p95a - p95e) / p95e < 0.02


def test_kmv_distinct_error_bound(spark, sf_dir):
    """KMV at k=256: expected relative error ~ 1/sqrt(k-2) ≈ 6%; pin a
    2-sigma bound (13%) per group against the exact distinct count."""
    from pyspark.sql import functions as F

    from data_engineering_project_spotify_app_spark.tables import table

    est = {
        r["l_returnflag"]: r["est_distinct"]
        for r in registry.QUERIES["q_kmv_distinct"](spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for flag, e in est.items():
        assert abs(e - exact[flag]) / exact[flag] < 0.13, (flag, e, exact[flag])


def test_kmv_set_ops_error_bound(spark, sf_dir):
    """Theta-style intersection/union estimates from two KMV sketches:
    each within 2-sigma (13% at k=256) of the exact overlap counts."""
    from pyspark.sql import functions as F

    from data_engineering_project_spotify_app_spark.tables import table

    row = registry.QUERIES["q_kmv_set_ops"](spark, sf_dir).first()
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    a = ev.filter("event_type = 'click'").select("user_id").distinct().count()
    b = (
        ev.filter("event_type = 'purchase'").select("user_id").distinct()
        .count()
    )
    u = ev.select("user_id").distinct().count()
    exact = {"est_clickers": a, "est_purchasers": b,
             "est_both": a + b - u, "est_either": u}
    for col, want in exact.items():
        if want == 0:
            continue
        assert abs(row[col] - want) / want < 0.13, (col, row[col], want)


def test_kmv_merge_is_lossless_and_bounded(spark, sf_dir):
    """The two-level shard-merge sketch must (a) equal the directly-built
    global k-min sketch per group (merge losslessness — same kth, same m)
    and (b) estimate within 2-sigma (~26% at k=64) of the exact count."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from data_engineering_project_spotify_app_spark.operators.extras import (
        KMV_MERGE_K,
    )
    from data_engineering_project_spotify_app_spark.tables import table

    merged = {
        r["event_type"]: r
        for r in registry.QUERIES["q_kmv_merge"](spark, sf_dir).collect()
    }
    # direct global sketch, no sharding level
    h = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), "
            "16, 10) AS BIGINT)"
        ).alias("hv"),
    )
    w = Window.partitionBy("event_type").orderBy("hv")
    direct = {
        r["event_type"]: r
        for r in h.withColumn("dr", F.dense_rank().over(w))
        .filter(F.col("dr") <= KMV_MERGE_K)
        .groupBy("event_type")
        .agg(F.max("hv").alias("kth"), F.count_distinct("hv").alias("m"))
        .collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(merged) == set(direct) == set(exact)
    for et, row in merged.items():
        assert row["n_kmin"] == direct[et]["m"], (et, row)
        assert abs(row["est_distinct"] - exact[et]) / exact[et] < 0.26, (
            et,
            row["est_distinct"],
            exact[et],
        )


def test_countmin_overestimates_and_merges(spark, sf_dir):
    """CMS invariants: (a) est >= exact for every probed key (one-sided
    error); (b) cell-wise ADDITION of two half-corpus sketches equals
    the full-corpus sketch (mergeability — the property that lets
    per-partition/per-day sketches combine at 100 TB)."""
    from pyspark.sql import functions as F

    from data_engineering_project_spotify_app_spark.operators.extras import (
        CMS_D,
        CMS_W,
    )
    from data_engineering_project_spotify_app_spark.tables import table

    rows = registry.QUERIES["q_countmin_freq"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["est_count"] >= r["exact_count"], r

    ev = table(spark, sf_dir, "events")
    hashes = F.array(
        *[
            (
                F.expr(
                    f"CAST(conv(substring(md5(concat('{r}:', "
                    "CAST(user_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
                )
                % CMS_W
            )
            for r in range(CMS_D)
        ]
    )

    def cells_of(df):
        return {
            (r["r"], r["c"]): r["cnt"]
            for r in df.select(F.posexplode(hashes).alias("r", "c"))
            .groupBy("r", "c")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }

    full = cells_of(ev)
    lo = cells_of(ev.filter("event_id % 2 = 0"))
    hi = cells_of(ev.filter("event_id % 2 = 1"))
    merged: dict = {}
    for part in (lo, hi):
        for k, v in part.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == full


def test_cms_join_size_overestimates(spark, sf_dir):
    """Inner-product join-size estimate must dominate the exact join
    size (one-sided error) and stay within the collision bound
    exact + |A||B|/W."""
    from pyspark.sql import functions as F

    from data_engineering_project_spotify_app_spark.operators.extras import (
        CMS_W,
    )
    from data_engineering_project_spotify_app_spark.tables import table

    row = registry.QUERIES["q_cms_join_size"](spark, sf_dir).first()
    assert row["est_join_size"] >= row["exact_join_size"], row
    ev = table(spark, sf_dir, "events")
    na = ev.filter("event_type = 'click'").count()
    nb = ev.filter("event_type = 'purchase'").count()
    # expected collision inflation is |A||B|/W per row; min over D rows
    # stays below a few multiples of it — use 4x as a generous bound
    bound = row["exact_join_size"] + 4.0 * na * nb / CMS_W
    assert row["est_join_size"] <= bound, (row, bound)
