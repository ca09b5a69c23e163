"""Distributed second moments over the embedding corpus: covariance + PCA.

The canonical "reduce 100 TB to a d×d matrix" pattern (Spark MLlib's
RowMatrix.computeCovariance does exactly this shape): each partition
folds its vectors into ONE Xq^T·Xq partial (a d×d numpy GEMM over the
Arrow batch), the partials — 2080 tiny rows each for d=64 — are summed
in a hash agg, and cov(i,j) = (Σxy/n − (Σx/n)(Σy/n)) / S². The
data-sized input never shuffles; only O(d²)-sized partials do.
Eigendecomposition of the assembled d×d matrix is then a driver-side
numpy call (the matrix is KB-sized at any corpus scale) — that is the
standard distributed-PCA split: distributed moments, local eigensolve.

Determinism: inputs are quantized ONCE to int64 (floor(x·2^17 + 0.5),
see COV_SCALE) so every moment is an exact integer sum — bit-identical
at any partition count. Float64 partials were partition-order-dependent
in the last ulps, and the E[xy]−E[x]E[y] cancellation amplified that
into round(cov, 6) boundary flips between local[8] and local[32].

Oracle: DuckDB quantizes identically and computes the same entries
relationally over the position-exploded vectors — an O(n·d²)
formulation that is fine at sf0.01 and exactly what the Spark side
must NOT do at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.operators.registry import query
from data_engineering_project_spotify_app_spark.tables import table

EMB_DIM = 64

# Quantization scale for the covariance moments. Float64 partial sums of
# float32 products round in a partition-order-dependent way (48 significand
# bits per product; addition order varies with the physical plan), which
# flipped round(cov, 6) boundary cells between local[8] and local[32] runs.
# Quantizing each input ONCE to int64 (floor(x*2^17 + 0.5)) makes every
# moment an exact int64 sum — order-independent at any partition count —
# and both engines then divide the identical integers into the identical
# doubles. 2^17 keeps Σxq·yq < 2^63 out to ~10^8 vectors at |x| ≤ 1.
COV_SCALE = 1 << 17


def covariance_partials(e: DataFrame, dim: int = EMB_DIM) -> DataFrame:
    """Per-partition moment partials: (i, j, n, sx, sy, sxy), i <= j.

    ``e`` must have an ``embedding: array<float|double>`` column. One
    mapInPandas pass; each Arrow batch contributes d(d+1)/2 rows built
    from a single int64 GEMM (Xq^T·Xq over floor(x*2^17 + 0.5)-quantized
    inputs) plus a column sum — no per-pair Python loop over rows, no
    shuffle of the vectors. All partials are exact integers, so the
    downstream sum is bit-identical at any partition count.
    """
    import numpy as np
    import pandas as pd

    iu, ju = np.triu_indices(dim)

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            # floor(x*S + 0.5), not rint: rint is half-to-even while the
            # oracle's SQL floor(x*S + 0.5) is half-up — must match exactly.
            xq = np.floor(x * COV_SCALE + 0.5).astype(np.int64)
            xtx = xq.T @ xq  # d × d, exact int64
            s = xq.sum(axis=0)  # d, exact int64
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
        gen, "i int, j int, n long, sx long, sy long, sxy long"
    )


def corpus_mean(e: DataFrame, dim: int = EMB_DIM):
    """Driver-collected per-dim corpus mean as a d-sized float64 ndarray.

    Unquantized float64 column sums (one mapInPandas pass, d rows per
    partition) — the centroid consumers (pca_project, outlier scoring)
    round to 4 decimals, where float64 sum-order noise (~1e-13) cannot
    flip a boundary, so they keep the exact mean rather than the
    covariance path's int64-quantized one.
    """
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "i": np.arange(1, dim + 1, dtype=np.int32),
                    "n": np.full(dim, len(pdf), dtype=np.int64),
                    "sx": x.sum(axis=0),
                }
            )

    parts = e.select("embedding").mapInPandas(gen, "i int, n long, sx double")
    rows = (
        parts.groupBy("i")
        .agg((F.sum("sx") / F.sum("n")).alias("mu"))
        .collect()
    )
    mu = np.zeros(dim)
    for r in rows:
        mu[r["i"] - 1] = r["mu"]
    return mu


# The oracle quantizes identically (floor(x*S + 0.5) as BIGINT); DuckDB sums
# BIGINT exactly (HUGEINT accumulator) and its `/` is true division to
# DOUBLE, same as Spark's — identical integers in, identical doubles out.
_COV_ORACLE = f"""
    WITH pos AS (
      SELECT CAST(unnest(generate_series(1, {EMB_DIM})) AS INT) AS i
    ),
    q AS (
      SELECT p1.i AS i, p2.i AS j,
             CAST(floor(CAST(e.embedding[p1.i] AS DOUBLE) * {COV_SCALE}.0 + 0.5) AS BIGINT) AS xq,
             CAST(floor(CAST(e.embedding[p2.i] AS DOUBLE) * {COV_SCALE}.0 + 0.5) AS BIGINT) AS yq
      FROM embeddings e, pos p1, pos p2
      WHERE p1.i <= p2.i
    )
    SELECT i, j,
           round((SUM(xq * yq) / COUNT(*)
                  - (SUM(xq) / COUNT(*)) * (SUM(yq) / COUNT(*)))
                 / ({COV_SCALE}.0 * {COV_SCALE}.0), 6) + 0.0 AS cov
    FROM q
    GROUP BY 1, 2
    """


@query("q_embedding_covariance", oracle=_COV_ORACLE)
def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population covariance matrix of the embedding corpus (upper
    triangle, 1-based dims), over inputs quantized once to int64
    (floor(x·2^17 + 0.5)): cov(i,j) = (Σxy/n − (Σx/n)(Σy/n)) / 2^34.

    Output contract: ``cov`` is the covariance of the QUANTIZED inputs,
    not of the raw floats — quantization perturbs each input by up to
    2^-18 ≈ 4e-6, so ``cov`` may deviate from unquantized covariance by
    more than the 6dp rounding grain (~1e-5 worst case). Consumers
    comparing against an unquantized covariance should expect >1e-6
    deviations; the trade is exactness: every moment is an exact integer
    sum, so the result is bit-identical at any partition count (see
    COV_SCALE note). ``-0.0`` is folded to ``+0.0``. The whole corpus
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
    cov = (
        F.col("sxy") / F.col("n")
        - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n"))
    ) / F.lit(float(COV_SCALE) * float(COV_SCALE))
    # + 0.0 folds IEEE -0.0 to +0.0 (round-3 convention): DuckDB's round()
    # preserves the sign of a negative value that rounds to zero, while
    # Spark's round goes through Java BigDecimal which cannot represent
    # -0.0 — two of the 2080 cells hit this at sf0.01.
    return agg.select("i", "j", (F.round(cov, 6) + F.lit(0.0)).alias("cov"))


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


def _dim_stats(e: DataFrame):
    """Distributed per-dim (min, max) + derived INT8 scale, collected to
    the driver (d rows — KB-sized at any corpus scale). One mapInPandas
    pass with numpy column partials per partition."""
    import numpy as np
    import pandas as pd

    def stats_gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "i": np.arange(1, x.shape[1] + 1, dtype=np.int32),
                    "mn": x.min(axis=0),
                    "mx": x.max(axis=0),
                }
            )

    stats = (
        e.select("embedding")
        .mapInPandas(stats_gen, "i int, mn double, mx double")
        .groupBy("i")
        .agg(F.min("mn").alias("mn"), F.max("mx").alias("mx"))
        .collect()
    )
    dim = max(r["i"] for r in stats)
    mn = np.zeros(dim)
    mx = np.zeros(dim)
    for r in stats:
        mn[r["i"] - 1] = r["mn"]
        mx[r["i"] - 1] = r["mx"]
    return mn, mx, (mx - mn) / 255.0


_QUANT_ORACLE = f"""
    WITH pos AS (
      SELECT CAST(unnest(generate_series(1, {EMB_DIM})) AS INT) AS i
    ),
    v AS (
      SELECT p.i, CAST(e.embedding[p.i] AS DOUBLE) AS x
      FROM embeddings e, pos p
    ),
    st AS (SELECT i, min(x) AS mn, max(x) AS mx FROM v GROUP BY i),
    d AS (
      SELECT v.i, v.x, st.mn, (st.mx - st.mn) / 255.0 AS sc,
             CASE WHEN st.mx = st.mn THEN st.mn
                  ELSE st.mn + floor((v.x - st.mn) / ((st.mx - st.mn) / 255.0)
                                     + 0.5) * ((st.mx - st.mn) / 255.0)
             END AS dq
      FROM v JOIN st ON st.i = v.i
    )
    SELECT i AS dim,
           round(min(mn), 6) AS zero_point,
           round(min(sc), 9) AS q_scale,
           round(avg((dq - x) * (dq - x)), 9) AS mse
    FROM d GROUP BY i
    """


@query("q_embedding_quantize", oracle=_QUANT_ORACLE)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension INT8 affine quantization report: for each dim, the
    (zero_point, scale) affine code with 256 levels over the observed
    range, and the reconstruction MSE it would cost — the calibration
    table an embedding store computes before quantizing 100 TB of
    vectors (the storage/recall trade behind q_pq_encode's codebooks;
    this is the uniform-scalar baseline PQ must beat).

    Two corpus passes, both mapInPandas over Arrow batches with numpy
    column-min/max/SSE per partition — per-dim partials only, the
    vectors never shuffle. Between passes the d-row stats frame is
    collected to the driver (KB-sized at any corpus scale, the same
    split as pca_top_components) and closed over by the second pass.
    Quantization uses floor(v + 0.5) — identical half-away rounding in
    numpy and DuckDB, so dq is the SAME double in both engines; only
    the MSE mean is summation-order-sensitive, handled by round(9).
    """
    import numpy as np
    import pandas as pd

    e = table(spark, sf_dir, "embeddings")
    mn, mx, sc = _dim_stats(e)

    def sse_gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                dq = mn + np.floor((x - mn) / sc + 0.5) * sc
            dq = np.where(mx == mn, mn, dq)
            err = dq - x
            yield pd.DataFrame(
                {
                    "i": np.arange(1, x.shape[1] + 1, dtype=np.int32),
                    "n": np.full(x.shape[1], len(pdf), dtype=np.int64),
                    "sse": (err * err).sum(axis=0),
                }
            )

    stat_rows = spark.createDataFrame(
        [(i + 1, float(mn[i]), float(sc[i])) for i in range(len(mn))],
        "i int, zp double, sc double",
    )
    return (
        e.select("embedding")
        .mapInPandas(sse_gen, "i int, n long, sse double")
        .groupBy("i")
        .agg(F.sum("n").alias("n"), F.sum("sse").alias("sse"))
        .join(F.broadcast(stat_rows), "i")
        .select(
            F.col("i").alias("dim"),
            F.round("zp", 6).alias("zero_point"),
            F.round("sc", 9).alias("q_scale"),
            F.round(F.col("sse") / F.col("n"), 9).alias("mse"),
        )
    )


ANNQ_QUERIES = 10  # vec_id < ANNQ_QUERIES are the probe queries
ANNQ_K = 5


_ANNQ_ORACLE = f"""
    WITH pos AS (
      SELECT CAST(unnest(generate_series(1, {EMB_DIM})) AS INT) AS i
    ),
    v AS (
      SELECT e.vec_id, p.i, CAST(e.embedding[p.i] AS DOUBLE) AS x
      FROM embeddings e, pos p
    ),
    st AS (SELECT i, min(x) AS mn, max(x) AS mx FROM v GROUP BY i),
    d AS (
      SELECT v.vec_id, v.i,
             CASE WHEN st.mx = st.mn THEN st.mn
                  ELSE st.mn + floor((v.x - st.mn) / ((st.mx - st.mn) / 255.0)
                                     + 0.5) * ((st.mx - st.mn) / 255.0)
             END AS dq
      FROM v JOIN st ON st.i = v.i
    ),
    nrm AS (SELECT vec_id, sqrt(sum(dq * dq)) AS nrm FROM d GROUP BY 1),
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             sum(q.dq * c.dq) AS dot
      FROM d q JOIN d c ON c.i = q.i AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {ANNQ_QUERIES}
      GROUP BY 1, 2
    ),
    sims AS (
      SELECT dots.query_id, dots.neighbor_id,
             round(dots.dot / (nq.nrm * nc.nrm), 4) + 0.0 AS sim
      FROM dots
      JOIN nrm nq ON nq.vec_id = dots.query_id
      JOIN nrm nc ON nc.vec_id = dots.neighbor_id
    )
    SELECT query_id, neighbor_id, sim, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
      FROM sims
    )
    WHERE rnk <= {ANNQ_K}
    """


@query("q_ann_quantized", oracle=_ANNQ_ORACLE)
def q_ann_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-k over INT8-DEQUANTIZED vectors: search on the 4×-
    compressed representation q_embedding_quantize calibrates — the
    memory/recall trade every large vector store makes (SQ8 in FAISS
    terms). Same query protocol as q_cosine_topk (its exact twin), so
    the two registrations side-by-side measure what 8-bit costs.

    Spark path: per-dim stats collected once (KB-sized), then ONE
    mapInPandas pass quantizes each Arrow batch and GEMMs it against
    the broadcast dequantized query block — corpus never shuffles;
    only (query × batch-top-k) candidate rows leave the scan, and the
    final per-query rank runs over ≤ queries × k rows.

    floor(v+0.5) quantization is bit-identical in numpy and DuckDB
    (see q_embedding_quantize), so sims agree to the last double and
    round(4) + vec_id tie-break pins the ranking across engines.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    e = table(spark, sf_dir, "embeddings")
    mn, mx, sc = _dim_stats(e)

    def dq_mat(x: "np.ndarray") -> "np.ndarray":
        with np.errstate(divide="ignore", invalid="ignore"):
            dq = mn + np.floor((x - mn) / sc + 0.5) * sc
        return np.where(mx == mn, mn, dq)

    q_rows = (
        e.filter(F.col("vec_id") < ANNQ_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    q_rows.sort(key=lambda r: r["vec_id"])
    q_ids = np.array([r["vec_id"] for r in q_rows])
    qm = dq_mat(
        np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in q_rows])
    )
    q_nrm = np.sqrt((qm * qm).sum(axis=1))

    def sim_gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            dq = dq_mat(x)
            nrm = np.sqrt((dq * dq).sum(axis=1))
            sims = (dq @ qm.T) / (nrm[:, None] * q_nrm[None, :])
            n_batch, n_q = sims.shape
            vec_ids = pdf["vec_id"].to_numpy()
            # Batch-local top-k per query bounds the shuffle to
            # (queries × k) rows per batch.
            k = min(ANNQ_K, n_batch)
            out_q, out_v, out_s = [], [], []
            for j in range(n_q):
                col = sims[:, j]
                mask = vec_ids != q_ids[j]
                cand = np.where(mask)[0]
                if len(cand) == 0:
                    continue
                take = cand[np.argsort(-col[cand])[: k]]
                out_q.append(np.full(len(take), q_ids[j]))
                out_v.append(vec_ids[take])
                out_s.append(col[take])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_v),
                    "sim": np.concatenate(out_s),
                }
            )

    cands = e.select("vec_id", "embedding").mapInPandas(
        sim_gen, "query_id long, neighbor_id long, sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), "neighbor_id"
    )
    return (
        cands.select(
            "query_id",
            "neighbor_id",
            (F.round("sim", 4) + F.lit(0.0)).alias("sim"),
            F.col("sim").alias("_raw"),
        )
        .withColumn(
            "rnk",
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy(
                    F.col("_raw").desc(), "neighbor_id"
                )
            )
            .cast("bigint"),
        )
        .filter(F.col("rnk") <= ANNQ_K)
        .drop("_raw")
    )


def pca_project(
    spark: SparkSession, sf_dir: str, k: int = 2
) -> DataFrame:
    """Distributed PCA APPLY: project every embedding onto the top-k
    principal components (computed by pca_top_components — distributed
    covariance + local eigensolve), centered at the corpus mean. One
    mapInPandas pass with the k×d component matrix closed over (KB-
    sized); each Arrow batch is one GEMM. Returns (vec_id, scores
    array<double>) — the dimensionality-reduced corpus a downstream
    ANN/clustering stage would consume.

    Not registered: the eigensolve isn't SQL-expressible, so there is
    no DuckDB twin; tests/test_moments.py pins the spectral identities
    instead (score variance per component == its eigenvalue,
    cross-component decorrelation, centering).
    """
    import numpy as np
    import pandas as pd

    e = table(spark, sf_dir, "embeddings")
    _, comps = pca_top_components(spark, sf_dir, k)
    mu = corpus_mean(e)
    w = np.asarray(comps, dtype=np.float64)  # k × d

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            scores = (x - mu) @ w.T  # N × k
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "scores": list(scores),
                }
            )

    return e.select("vec_id", "embedding").mapInPandas(
        gen, "vec_id long, scores array<double>"
    )


_ANISOTROPY_ORACLE = f"""
    WITH pos AS (
      SELECT CAST(unnest(generate_series(1, {EMB_DIM})) AS INT) AS i
    ),
    v AS (
      SELECT e.vec_id, p.i, CAST(e.embedding[p.i] AS DOUBLE) AS x
      FROM embeddings e, pos p
    ),
    nrm AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM v GROUP BY 1),
    u AS (
      SELECT v.vec_id, v.i, v.x / nrm.nrm AS ux
      FROM v JOIN nrm ON nrm.vec_id = v.vec_id
    ),
    s AS (SELECT i, sum(ux) AS su FROM u GROUP BY i),
    agg AS (
      SELECT (SELECT count(*) FROM nrm) AS n,
             (SELECT sum(su * su) FROM s) AS ssq,
             (SELECT avg(nrm) FROM nrm) AS mean_norm,
             (SELECT stddev_pop(nrm) FROM nrm) AS sd_norm
    )
    SELECT CAST(n AS BIGINT) AS n_vectors,
           round(mean_norm, 4) AS mean_norm,
           round(sd_norm, 4) AS sd_norm,
           round((ssq - n) / (n * (n - 1.0)), 6) AS mean_pairwise_cosine
    FROM agg
    """


@query("q_embedding_anisotropy", oracle=_ANISOTROPY_ORACLE)
def q_embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space health check: norm distribution + ANISOTROPY —
    the mean pairwise cosine over all C(n,2) vector pairs, computed
    WITHOUT pairwise work via the exact identity
    mean_cos = (‖Σuᵢ‖² − n) / (n(n−1)) for unit vectors uᵢ
    (Σᵢ≠ⱼ uᵢ·uⱼ = ‖Σu‖² − Σ‖u‖²). High anisotropy (Ethayarajh,
    EMNLP'19) means vectors crowd a narrow cone and cosine thresholds
    lose contrast — the first thing to check before trusting
    q_semantic_dedup/ANN thresholds on a new embedding model.

    Scale: one mapInPandas pass folds each Arrow batch into a d-sized
    unit-vector sum partial plus norm moments — O(d + 1) rows per
    partition, no shuffle of vectors, no pairs anywhere. The test pins
    the identity against brute-force pairwise cosine on the fixture.
    """
    import numpy as np
    import pandas as pd

    e = table(spark, sf_dir, "embeddings")

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            nrm = np.sqrt((x * x).sum(axis=1))
            u = x / nrm[:, None]
            su = u.sum(axis=0)
            yield pd.DataFrame(
                {
                    "i": np.arange(1, x.shape[1] + 1, dtype=np.int32),
                    "su": su,
                    "n": np.full(x.shape[1], len(pdf), dtype=np.int64),
                    "s_nrm": np.full(x.shape[1], nrm.sum()),
                    "s_nrm2": np.full(x.shape[1], (nrm * nrm).sum()),
                }
            )

    parts = e.select("embedding").mapInPandas(
        gen, "i int, su double, n long, s_nrm double, s_nrm2 double"
    )
    dims = parts.groupBy("i").agg(
        F.sum("su").alias("su"),
        F.sum("n").alias("n"),
        F.sum("s_nrm").alias("s_nrm"),
        F.sum("s_nrm2").alias("s_nrm2"),
    )
    agg = dims.agg(
        F.sum(F.col("su") * F.col("su")).alias("ssq"),
        F.first("n").alias("n"),  # identical per dim
        F.first("s_nrm").alias("s_nrm"),
        F.first("s_nrm2").alias("s_nrm2"),
    )
    n = F.col("n").cast("double")
    mean_norm = F.col("s_nrm") / n
    var_norm = F.col("s_nrm2") / n - mean_norm * mean_norm
    return agg.select(
        F.col("n").cast("bigint").alias("n_vectors"),
        F.round(mean_norm, 4).alias("mean_norm"),
        F.round(F.sqrt(var_norm), 4).alias("sd_norm"),
        F.round(
            (F.col("ssq") - n) / (n * (n - F.lit(1.0))), 6
        ).alias("mean_pairwise_cosine"),
    )


OUTLIER_TOP_K = 20


_EMB_OUTLIER_ORACLE = f"""
    WITH pos AS (
      SELECT CAST(unnest(generate_series(1, {EMB_DIM})) AS INT) AS i
    ),
    v AS (
      SELECT e.vec_id, p.i, CAST(e.embedding[p.i] AS DOUBLE) AS x
      FROM embeddings e, pos p
    ),
    mu AS (SELECT i, avg(x) AS m FROM v GROUP BY i),
    dist AS (
      SELECT v.vec_id,
             sqrt(sum((v.x - mu.m) * (v.x - mu.m))) AS d
      FROM v JOIN mu ON mu.i = v.i
      GROUP BY 1
    ),
    st AS (SELECT avg(d) AS md, stddev_pop(d) AS sd FROM dist)
    SELECT vec_id,
           round(d, 4) AS dist_to_centroid,
           round((d - st.md) / st.sd, 4) + 0.0 AS z,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT dist.vec_id, dist.d, st.md, st.sd,
             row_number() OVER (ORDER BY dist.d DESC, dist.vec_id) AS rnk
      FROM dist, st
    ) q, st
    WHERE rnk <= {OUTLIER_TOP_K}
    """


@query("q_embedding_outliers", oracle=_EMB_OUTLIER_ORACLE)
def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier mining: the {OUTLIER_TOP_K} vectors
    farthest from the corpus centroid, with their distance z-scores —
    the cheap first pass of embedding-based data cleaning (mislabeled/
    garbage points sit in the far tail; SemDeDup-style pipelines drop
    or re-inspect them before clustering).

    Two passes, no pairwise work: the centroid folds from the same
    d-sized per-partition sum partials as the covariance (collected —
    KB at any scale), then one mapInPandas pass scores each Arrow
    batch's distances against the broadcast centroid; the global
    top-k is a TakeOrderedAndProject-sized rank over per-batch
    candidates. Distance moments (for z) fold from the same second
    pass. Ranking on the raw distance with vec_id tie-break.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    e = table(spark, sf_dir, "embeddings")
    mu = corpus_mean(e)

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            d = np.sqrt(((x - mu) ** 2).sum(axis=1))
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "d": d}
            )

    dist = e.select("vec_id", "embedding").mapInPandas(
        gen, "vec_id long, d double"
    ).localCheckpoint(eager=False)  # feeds the z-stats AND the ranked
    # output — without the checkpoint the Arrow scoring pass ran twice
    st = dist.agg(
        F.avg("d").alias("md"), F.stddev_pop("d").alias("sd")
    )
    # rank(), not row_number(): the order is total (vec_id tie-break) so
    # they are identical, but only rank()/dense_rank() get the
    # WindowGroupLimit map-side prune on this Spark build — row_number()
    # funnels EVERY distance row through an Exchange SinglePartition.
    w = Window.orderBy(F.col("d").desc(), "vec_id")
    return (
        dist.crossJoin(F.broadcast(st))
        .withColumn("rnk", F.rank().over(w).cast("bigint"))
        .filter(F.col("rnk") <= OUTLIER_TOP_K)
        .select(
            "vec_id",
            F.round("d", 4).alias("dist_to_centroid"),
            (
                F.round((F.col("d") - F.col("md")) / F.col("sd"), 4)
                + F.lit(0.0)
            ).alias("z"),
            "rnk",
        )
    )


_SEPARABILITY_ORACLE = f"""
    WITH pos AS (
      SELECT CAST(unnest(generate_series(1, {EMB_DIM})) AS INT) AS i
    ),
    v AS (
      SELECT e.vec_id, e.label, p.i,
             CAST(e.embedding[p.i] AS DOUBLE) AS x
      FROM embeddings e, pos p
    ),
    nrm AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM v GROUP BY 1),
    u AS (
      SELECT v.vec_id, v.label, v.i, v.x / nrm.nrm AS ux
      FROM v JOIN nrm ON nrm.vec_id = v.vec_id
    ),
    ls AS (
      SELECT label, i, sum(ux) AS su,
             count(DISTINCT vec_id) AS nl
      FROM u GROUP BY 1, 2
    ),
    gs AS (SELECT i, sum(su) AS gsu FROM ls GROUP BY 1),
    per_label AS (
      SELECT ls.label,
             max(ls.nl) AS nl,
             sum(ls.su * ls.su) AS norm2,
             sum(ls.su * gs.gsu) AS dotg
      FROM ls JOIN gs ON gs.i = ls.i
      GROUP BY 1
    ),
    tot AS (SELECT sum(nl) AS n FROM (SELECT label, max(nl) AS nl
                                      FROM ls GROUP BY 1))
    SELECT label,
           CAST(nl AS BIGINT) AS n,
           round((norm2 - nl) / (nl * (nl - 1.0)), 6) AS intra_cos,
           round((dotg - norm2) / (nl * (tot.n - nl)), 6) AS inter_cos,
           round((norm2 - nl) / (nl * (nl - 1.0))
                 - (dotg - norm2) / (nl * (tot.n - nl)), 6) AS separation
    FROM per_label, tot
    """


@query("q_label_separability", oracle=_SEPARABILITY_ORACLE)
def q_label_separability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding separability WITHOUT pairwise work: mean
    intra-label cosine vs mean cosine to the rest of the corpus, from
    unit-vector sum identities alone —
    intra_l = (‖s_l‖²−n_l)/(n_l(n_l−1)),
    inter_l = (s_l·S−‖s_l‖²)/(n_l(N−n_l)) with s_l = Σ_label u, S = Σ u.
    separation > 0 means the label forms a real cluster; ≈ 0 means the
    labels are noise to this embedding — the one-pass screen before
    trusting q_knn_classify / q_hard_negatives on a new model (the
    labeled refinement of q_embedding_anisotropy's global cone).

    Scale: one mapInPandas pass folds each Arrow batch into per-label
    d-sums (labels × d tiny rows per partition); every cosine above is
    arithmetic on those sums. The brute-force pairwise equality is
    pinned in tests.
    """
    import numpy as np
    import pandas as pd

    e = table(spark, sf_dir, "embeddings")

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            u = x / np.sqrt((x * x).sum(axis=1))[:, None]
            lab = pdf["label"].to_numpy()
            for lb in np.unique(lab):
                m = lab == lb
                su = u[m].sum(axis=0)
                yield pd.DataFrame(
                    {
                        "label": np.full(len(su), int(lb), dtype=np.int32),
                        "i": np.arange(1, len(su) + 1, dtype=np.int32),
                        "su": su,
                        "nl": np.full(len(su), int(m.sum()), dtype=np.int64),
                    }
                )

    # The per-label d-sums feed the global-sum re-aggregation AND the
    # per-label join; unpinned, the mapInPandas corpus pass (an
    # ArrowEval boundary crossing) ran TWICE. labels×d rows — pin it.
    # per_label likewise feeds the total scalar and the final select
    # (guide §2.4).
    ls = (
        e.select("label", "embedding")
        .mapInPandas(gen, "label int, i int, su double, nl long")
        .groupBy("label", "i")
        .agg(F.sum("su").alias("su"), F.sum("nl").alias("nl"))
        .localCheckpoint(eager=False)
    )
    gs = ls.groupBy("i").agg(F.sum("su").alias("gsu"))
    per_label = (
        ls.join(F.broadcast(gs), "i")
        .groupBy("label")
        .agg(
            F.max("nl").alias("nl"),
            F.sum(F.col("su") * F.col("su")).alias("norm2"),
            F.sum(F.col("su") * F.col("gsu")).alias("dotg"),
        )
        .localCheckpoint(eager=False)
    )
    tot = per_label.agg(F.sum("nl").alias("n"))
    nl = F.col("nl").cast("double")
    nn = F.col("n").cast("double")
    intra = (F.col("norm2") - nl) / (nl * (nl - 1.0))
    inter = (F.col("dotg") - F.col("norm2")) / (nl * (nn - nl))
    return per_label.crossJoin(F.broadcast(tot)).select(
        "label",
        F.col("nl").cast("bigint").alias("n"),
        F.round(intra, 6).alias("intra_cos"),
        F.round(inter, 6).alias("inter_cos"),
        F.round(intra - inter, 6).alias("separation"),
    )
