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


def test_gemm_signatures_match_pure_python_reference(spark):
    """The Arrow-GEMM SRP signature must equal an INDEPENDENT pure-Python
    evaluation of sum(round_half_away(w * x * 1e14)) per plane — pinning
    the int64-exactness claim the oracles rely on, on vectors that
    exercise negative values, tiny magnitudes, and exact halves."""
    import math

    from data_engineering_project_spotify_app_spark.operators.similarity import (
        DIM,
        N_PLANES,
        _plane_weights,
        _srp_signatures,
    )

    vecs = []
    for i in range(7):
        vecs.append(
            [
                ((-1) ** (i + d) ) * ((d + 1) * 1e-14 * (i + 1) if d % 3 else 0.5e-14)
                for d in range(DIM)
            ]
        )
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, v array<double>"
    )
    got = {
        r.vec_id: r.bucket
        for r in _srp_signatures(df, [None], passthrough_v=False).collect()
    }

    def round_half_away(y: float) -> int:
        return int(math.floor(abs(y) + 0.5)) * (1 if y >= 0 else -1)

    for i, v in enumerate(vecs):
        bits = []
        for p in range(N_PLANES):
            w = _plane_weights(p)
            s = sum(round_half_away(w[d] * v[d] * 1e14) for d in range(DIM))
            bits.append("1" if s >= 0 else "0")
        assert got[i] == "".join(bits), f"vec {i}"
