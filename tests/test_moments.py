"""Distributed covariance + PCA vs a direct numpy reference."""

from __future__ import annotations

import numpy as np

from data_engineering_project_spotify_app_spark.operators.moments import (
    assemble_covariance,
    pca_top_components,
    q_embedding_covariance,
    q_embedding_quantize,
)
from data_engineering_project_spotify_app_spark.tables import table


def _collect_matrix(spark, sf_dir) -> np.ndarray:
    rows = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    return np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])


def test_covariance_matches_numpy(spark, sf_dir):
    x = _collect_matrix(spark, sf_dir)
    ref = np.cov(x.T, bias=True)  # population covariance, d × d
    got = assemble_covariance(
        [r.asDict() for r in q_embedding_covariance(spark, sf_dir).collect()]
    )
    assert got.shape == ref.shape
    # Engine output is over floor(x·2^17 + 0.5)-quantized inputs (≤ ~2.4e-6
    # cov perturbation at |x| ≤ 0.3) and rounded to 6 decimals.
    assert np.abs(got - ref).max() < 1e-5


def test_covariance_partition_invariant(spark, sf_dir):
    """The quantized-moment form must be bit-identical at any partition
    count — this is the r07 driver flake (float64 partial-sum order
    flipping a round(6) boundary cell between local[8] and local[32])."""
    from data_engineering_project_spotify_app_spark.operators.moments import (
        covariance_partials,
    )
    from pyspark.sql import functions as F

    e = table(spark, sf_dir, "embeddings")

    def run(df):
        parts = covariance_partials(df)
        agg = parts.groupBy("i", "j").agg(
            F.sum("n").alias("n"),
            F.sum("sx").alias("sx"),
            F.sum("sy").alias("sy"),
            F.sum("sxy").alias("sxy"),
        )
        return {
            (r["i"], r["j"]): (r["n"], r["sx"], r["sy"], r["sxy"])
            for r in agg.collect()
        }

    base = run(e)
    for n_parts in (1, 7):
        other = run(e.repartition(n_parts))
        assert other == base, f"moments differ at {n_parts} partitions"


def test_pca_top_components(spark, sf_dir):
    x = _collect_matrix(spark, sf_dir)
    ref_cov = np.cov(x.T, bias=True)
    ref_vals, ref_vecs = np.linalg.eigh(ref_cov)
    ref_order = np.argsort(ref_vals)[::-1]

    vals, comps = pca_top_components(spark, sf_dir, k=2)
    assert vals[0] >= vals[1] > 0
    np.testing.assert_allclose(vals, ref_vals[ref_order][:2], atol=1e-4)
    # Eigenvectors are sign-ambiguous: compare |cosine| of spans.
    for k in range(2):
        ref_v = ref_vecs[:, ref_order[k]]
        cos = abs(float(comps[k] @ ref_v))
        assert cos > 0.999, f"component {k} misaligned: |cos|={cos}"
    # Eigen-residual on the engine's own matrix: C v ≈ λ v.
    got_cov = assemble_covariance(
        [r.asDict() for r in q_embedding_covariance(spark, sf_dir).collect()]
    )
    for k in range(2):
        resid = np.abs(got_cov @ comps[k] - vals[k] * comps[k]).max()
        assert resid < 1e-4, resid


def test_quantize_error_bound(spark, sf_dir):
    """Uniform INT8 quantization error is bounded by (scale/2)² per value,
    so per-dim MSE must be ≤ scale²/4 (and ≥ 0)."""
    out = q_embedding_quantize(spark, sf_dir).collect()
    assert len(out) == 64
    for r in out:
        assert r["q_scale"] >= 0
        assert 0 <= r["mse"] <= r["q_scale"] ** 2 / 4 + 1e-12, r
    # Quantization at 8 bits should be a small relative error: MSE far
    # below the dim's variance (range²/12 would be 1-bit).
    x = _collect_matrix(spark, sf_dir)
    var = x.var(axis=0)
    for r in out:
        assert r["mse"] < var[r["dim"] - 1] / 100


def test_ann_quantized_recall_vs_exact(spark, sf_dir):
    """8-bit quantization should barely perturb cosine top-k: mean
    recall@5 vs the exact brute-force ranking must stay high."""
    from data_engineering_project_spotify_app_spark.operators.moments import (
        ANNQ_K,
        ANNQ_QUERIES,
        q_ann_quantized,
    )
    from data_engineering_project_spotify_app_spark.operators.similarity import (
        q_cosine_topk,
    )

    exact = {}
    for r in q_cosine_topk(spark, sf_dir).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {}
    for r in q_ann_quantized(spark, sf_dir).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(got) == set(range(ANNQ_QUERIES))
    recalls = []
    for qid, nbrs in got.items():
        assert len(nbrs) == ANNQ_K
        if qid in exact:
            ex = exact[qid]
            recalls.append(len(nbrs & set(list(ex)[: ANNQ_K])) / ANNQ_K)
    assert recalls and sum(recalls) / len(recalls) >= 0.8, recalls


def test_pca_project_spectral_identities(spark, sf_dir):
    """Projected scores must carry the spectrum: per-component variance
    equals the eigenvalue, components are decorrelated, scores are
    centered."""
    from data_engineering_project_spotify_app_spark.operators.moments import (
        pca_project,
        pca_top_components,
    )

    vals, _ = pca_top_components(spark, sf_dir, k=2)
    rows = pca_project(spark, sf_dir, k=2).collect()
    s = np.stack([np.asarray(r["scores"]) for r in rows])
    assert s.shape[1] == 2
    np.testing.assert_allclose(s.mean(axis=0), [0.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(s.var(axis=0), vals, rtol=1e-3)
    corr = np.corrcoef(s[:, 0], s[:, 1])[0, 1]
    assert abs(corr) < 0.02, corr


def test_anisotropy_identity_vs_bruteforce(spark, sf_dir):
    """mean_pairwise_cosine must equal the brute-force average cosine
    over all C(n,2) pairs (the ||sum u||^2 identity, exactly)."""
    from data_engineering_project_spotify_app_spark.operators.moments import (
        q_embedding_anisotropy,
    )

    r = q_embedding_anisotropy(spark, sf_dir).collect()[0]
    x = _collect_matrix(spark, sf_dir)
    u = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = u @ u.T
    n = len(u)
    brute = (sims.sum() - n) / (n * (n - 1))
    assert r["n_vectors"] == n
    assert abs(r["mean_pairwise_cosine"] - brute) < 1e-6
    assert abs(r["mean_norm"] - np.linalg.norm(x, axis=1).mean()) < 1e-3


def test_embedding_outliers_vs_numpy(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.moments import (
        OUTLIER_TOP_K,
        q_embedding_outliers,
    )

    x = _collect_matrix(spark, sf_dir)
    d = np.sqrt(((x - x.mean(axis=0)) ** 2).sum(axis=1))
    order = sorted(range(len(d)), key=lambda i: (-d[i], i))
    got = sorted(
        q_embedding_outliers(spark, sf_dir).collect(), key=lambda r: r["rnk"]
    )
    assert len(got) == OUTLIER_TOP_K
    # vec_id == row index in _collect_matrix (sorted by vec_id)
    assert [r["vec_id"] for r in got] == order[:OUTLIER_TOP_K]
    for r in got:
        assert abs(r["dist_to_centroid"] - d[r["vec_id"]]) < 1e-3
    zs = [r["z"] for r in got]
    assert zs == sorted(zs, reverse=True)
    assert zs[0] > 1.0  # the farthest point is a genuine tail point


def test_label_separability_vs_bruteforce(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.moments import (
        q_label_separability,
    )
    from data_engineering_project_spotify_app_spark.tables import table

    rows = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    x = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    lab = np.array([r["label"] for r in rows])
    u = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = u @ u.T
    got = {r["label"]: r for r in q_label_separability(spark, sf_dir).collect()}
    for lb in np.unique(lab):
        m = lab == lb
        nl = int(m.sum())
        intra = (sims[np.ix_(m, m)].sum() - nl) / (nl * (nl - 1))
        inter = sims[np.ix_(m, ~m)].mean()
        r = got[int(lb)]
        assert r["n"] == nl
        assert abs(r["intra_cos"] - intra) < 1e-5, lb
        assert abs(r["inter_cos"] - inter) < 1e-5, lb
        assert abs(r["separation"] - (intra - inter)) < 2e-5
