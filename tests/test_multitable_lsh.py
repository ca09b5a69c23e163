"""Multi-table LSH: more tables must buy recall on true near pairs."""

from __future__ import annotations

import numpy as np
import pandas as pd

from data_engineering_project_spotify_app_spark.operators.similarity import (
    q_ann_lsh,
    q_ann_multitable,
)

TOP = 50


def test_multitable_beats_single_table_recall(spark, sf_dir):
    """Recall@top-50-true-pairs: the 3-table union must strictly beat
    one table (measured 0.10 vs 0.02 at sf0.01) — the whole point of
    paying T× bucket work. Deterministic: planes are md5-derived."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    V = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    o = np.argsort(ids)
    V, ids = V[o], ids[o]
    nrm = np.sqrt((V * V).sum(1))
    S = (V @ V.T) / np.outer(nrm, nrm)
    iu = np.triu_indices(len(ids), 1)
    top = np.argsort(-S[iu])[:TOP]
    true_pairs = {
        (int(ids[iu[0][k]]), int(ids[iu[1][k]])) for k in top
    }

    mt_rows = q_ann_multitable(spark, sf_dir).collect()
    mt = {(r["vec_a"], r["vec_b"]) for r in mt_rows}
    st = {
        (r["vec_a"], r["vec_b"]) for r in q_ann_lsh(spark, sf_dir).collect()
    }
    r_mt = len(true_pairs & mt) / TOP
    r_st = len(true_pairs & st) / TOP
    # ≥ at sf0.001 (both 0.06 on the tiny fixture), strictly better at
    # sf0.01 (0.10 vs 0.02); the union can never lose recall
    assert r_mt >= r_st, (r_mt, r_st)
    assert len(mt) > len(st)  # 3 tables propose strictly more candidates
    # a pair proposed by k tables appears ONCE with its vote count
    assert all(1 <= r["n_tables_matched"] <= 3 for r in mt_rows)
