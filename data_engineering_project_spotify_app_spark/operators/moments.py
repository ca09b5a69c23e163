"""Distributed second moments over the embedding corpus: covariance + PCA.

The canonical "reduce 100 TB to a d×d matrix" pattern (Spark MLlib's
RowMatrix.computeCovariance does exactly this shape): each partition
folds its vectors into ONE X^T·X partial (a d×d numpy GEMM over the
Arrow batch), the partials — 2080 tiny rows each for d=64 — are summed
in a hash agg, and cov(i,j) = Σxy/n − (Σx/n)(Σy/n). The data-sized
input never shuffles; only O(d²)-sized partials do. Eigendecomposition
of the assembled d×d matrix is then a driver-side numpy call (the
matrix is KB-sized at any corpus scale) — that is the standard
distributed-PCA split: distributed moments, local eigensolve.

Oracle: DuckDB computes the same entries relationally with covar_pop
over the position-exploded vectors — an O(n·d²) formulation that is
fine at sf0.01 and exactly what the Spark side must NOT do at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.operators.registry import query
from data_engineering_project_spotify_app_spark.tables import table

EMB_DIM = 64


def covariance_partials(e: DataFrame, dim: int = EMB_DIM) -> DataFrame:
    """Per-partition moment partials: (i, j, n, sx, sy, sxy), i <= j.

    ``e`` must have an ``embedding: array<float|double>`` column. One
    mapInPandas pass; each Arrow batch contributes d(d+1)/2 rows built
    from a single float64 GEMM (X^T·X) plus a column sum — no per-pair
    Python loop over rows, no shuffle of the vectors.
    """
    import numpy as np
    import pandas as pd

    iu, ju = np.triu_indices(dim)

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            xtx = x.T @ x  # d × d
            s = x.sum(axis=0)  # d
            yield pd.DataFrame(
                {
                    "i": (iu + 1).astype(np.int32),
                    "j": (ju + 1).astype(np.int32),
                    "n": np.full(len(iu), len(pdf), dtype=np.int64),
                    "sx": s[iu],
                    "sy": s[ju],
                    "sxy": xtx[iu, ju],
                }
            )

    return e.select("embedding").mapInPandas(
        gen, "i int, j int, n long, sx double, sy double, sxy double"
    )


_COV_ORACLE = f"""
    WITH pos AS (
      SELECT CAST(unnest(generate_series(1, {EMB_DIM})) AS INT) AS i
    )
    SELECT p1.i AS i, p2.i AS j,
           round(covar_pop(CAST(e.embedding[p1.i] AS DOUBLE),
                           CAST(e.embedding[p2.i] AS DOUBLE)), 6) AS cov
    FROM embeddings e, pos p1, pos p2
    WHERE p1.i <= p2.i
    GROUP BY 1, 2
    """


@query("q_embedding_covariance", oracle=_COV_ORACLE)
def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population covariance matrix of the embedding corpus (upper
    triangle, 1-based dims): cov(i,j) = Σxy/n − (Σx/n)(Σy/n).

    See the module docstring for the scale argument; the whole corpus
    reduces to d(d+1)/2 = 2080 rows through one partial-aggregated
    shuffle of O(partitions · d²) tiny tuples.
    """
    e = table(spark, sf_dir, "embeddings")
    parts = covariance_partials(e)
    agg = parts.groupBy("i", "j").agg(
        F.sum("n").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum("sxy").alias("sxy"),
    )
    cov = F.col("sxy") / F.col("n") - (F.col("sx") / F.col("n")) * (
        F.col("sy") / F.col("n")
    )
    return agg.select("i", "j", F.round(cov, 6).alias("cov"))


def assemble_covariance(rows: list) -> "object":
    """Driver-side: upper-triangle (i, j, cov) rows → symmetric ndarray."""
    import numpy as np

    dim = max(r["j"] for r in rows)
    m = np.zeros((dim, dim))
    for r in rows:
        m[r["i"] - 1, r["j"] - 1] = r["cov"]
        m[r["j"] - 1, r["i"] - 1] = r["cov"]
    return m


def pca_top_components(spark: SparkSession, sf_dir: str, k: int = 2):
    """Top-k principal components of the embedding corpus.

    Distributed covariance (one corpus pass, see above) + local numpy
    eigensolve of the KB-sized d×d matrix — MLlib's own PCA split.
    Returns (eigenvalues desc, components as rows of a k×d ndarray).
    Deterministic up to sign; callers should compare spans, not signs
    (tests/test_moments.py fixes sign by the largest-|loading| entry).
    """
    import numpy as np

    rows = q_embedding_covariance(spark, sf_dir).collect()
    m = assemble_covariance([r.asDict() for r in rows])
    vals, vecs = np.linalg.eigh(m)
    order = np.argsort(vals)[::-1][:k]
    return vals[order], vecs[:, order].T
