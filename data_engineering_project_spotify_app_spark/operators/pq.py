"""Product quantization (PQ): compressed vector codes + ADC search.

The third ANN scale path (after SRP-LSH buckets and IVF lists): compress
each DIM=64 embedding into M=8 one-byte codes — one centroid id per
8-dim subspace — and search with Asymmetric Distance Computation (ADC):
the query stays exact, every corpus distance is approximated from a
per-query lookup table of query-subvector↔centroid distances. At 100 TB
this is the difference between scanning 256 B/vector and 8 B/vector,
and the LUT join replaces all per-pair float math with M table lookups.

Centroids are chosen deterministically (the subvectors of the K_CENT
lowest vec_ids) so both operators are *exactly* oracle-checkable — the
production swap-in is k-means codebooks, which changes only the centroid
frame, not the query shape (same trade as ivf.py's coarse quantizer).

Plan shapes:
- encode: corpus × (M·K_CENT tiny centroid frame, broadcast) → per-
  (vector, subspace) argmin → pivot to code columns. One scan, one
  window on (vec_id, m) — no shuffle of raw vectors beyond the argmin.
- ADC search: LUT = queries × centroids (Q·M·K_CENT rows, broadcast);
  corpus codes join the LUT on (m, code) and sum — one map-side join +
  one aggregation; raw corpus vectors are never touched at query time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_engineering_project_spotify_app_spark.operators.registry import query
from data_engineering_project_spotify_app_spark.operators.similarity import (
    _as_double,
    dot,
)
from data_engineering_project_spotify_app_spark.tables import table

DIM = 64
M_SUB = 8  # subspaces
DSUB = DIM // M_SUB  # dims per subspace
K_CENT = 16  # centroids per subspace (vec_id < K_CENT are the codebook)
PQ_QUERIES = 5  # vec_id < 5 are the ADC query set
PQ_TOPK = 5


def _sub_structs(vcol: str) -> Column:
    """array of (m, sv=slice of the m-th subspace) structs."""
    return F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.slice(F.col(vcol), m * DSUB + 1, DSUB).alias("sv"),
            )
            for m in range(M_SUB)
        ]
    )


def _subspaces(df: DataFrame, id_out: str, v_in: str = "v") -> DataFrame:
    """(id, v[DIM]) → (id, m, sv[DSUB]) — one row per subspace."""
    return df.select(
        F.col("vec_id").alias(id_out), F.explode(_sub_structs(v_in)).alias("s")
    ).select(id_out, F.col("s.m").alias("m"), F.col("s.sv").alias("sv"))


def _d2(a: Column, b: Column) -> Column:
    """Rounded squared L2 distance via the dot-product identity."""
    return F.round(dot(a, a) - 2 * dot(a, b) + dot(b, b), 4)


# ---- shared SQL fragments (DuckDB oracle) --------------------------------

_SUBS = ", ".join(str(m) for m in range(M_SUB))

_PQ_CTES = f"""e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    subs AS (SELECT unnest([{_SUBS}]) AS m),
    sub AS (
      SELECT vec_id, m, v[m*{DSUB}+1 : m*{DSUB}+{DSUB}] AS sv
      FROM e CROSS JOIN subs
    ),
    csub AS (
      SELECT vec_id AS cid, m, v[m*{DSUB}+1 : m*{DSUB}+{DSUB}] AS cs
      FROM e CROSS JOIN subs WHERE vec_id < {K_CENT}
    ),
    scored AS (
      SELECT s.vec_id, s.m, c.cid,
             round(list_dot_product(s.sv, s.sv)
                   - 2 * list_dot_product(s.sv, c.cs)
                   + list_dot_product(c.cs, c.cs), 4) AS d2
      FROM sub s JOIN csub c ON s.m = c.m
    ),
    code AS (
      SELECT vec_id, m, cid FROM (
        SELECT vec_id, m, cid,
               row_number() OVER (
                 PARTITION BY vec_id, m ORDER BY d2, cid
               ) AS rn
        FROM scored
      ) WHERE rn = 1
    )"""

_ENCODE_ORACLE = f"""
    WITH {_PQ_CTES}
    SELECT vec_id,
           {", ".join(
               f"CAST(max(CASE WHEN m = {m} THEN cid END) AS BIGINT) AS c{m}"
               for m in range(M_SUB)
           )}
    FROM code GROUP BY vec_id
    """


def _codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, m, cid): nearest centroid per (vector, subspace)."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double().alias("v")
    )
    # Norm hoisting: dot(sv,sv) is constant across the K_CENT centroid
    # candidates of a (vec, m) row and dot(cs,cs) is constant per
    # centroid — computing them once per stream/broadcast row instead of
    # per scored pair cuts the interpreted-HOF dot products from 3 to 1
    # per pair (measured 6x on this stage). Same arithmetic and rounding
    # as the oracle's d2, so codes are bit-identical.
    sub = _subspaces(e, "vec_id").withColumn(
        "svv", dot(F.col("sv"), F.col("sv"))
    )
    csub = (
        _subspaces(e.filter(F.col("vec_id") < K_CENT), "cid")
        .select("cid", "m", F.col("sv").alias("cs"))
        .withColumn("css", dot(F.col("cs"), F.col("cs")))
    )
    scored = sub.join(F.broadcast(csub), "m").select(
        "vec_id",
        "m",
        "cid",
        F.round(
            F.col("svv") - 2 * dot(F.col("sv"), F.col("cs")) + F.col("css"), 4
        ).alias("d2"),
    )
    # argmin as a map-side-combinable aggregate (min_by over the same
    # (d2, cid) ordering the window used) — no per-group sort, and the
    # shuffle carries one partial row per (vec, m) per map task instead
    # of all K_CENT scored rows.
    return scored.groupBy("vec_id", "m").agg(
        F.min_by("cid", F.struct("d2", "cid")).alias("cid")
    )


@query("q_pq_encode", oracle=_ENCODE_ORACLE)
def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codes: every vector compressed to M_SUB centroid ids.

    The stored representation for vector search at rest — 8 small ints
    instead of 64 floats per row (32× compression before bit packing).
    """
    codes = _codes(spark, sf_dir)
    return codes.groupBy("vec_id").agg(
        *[
            F.max(F.when(F.col("m") == m, F.col("cid")))
            .cast("bigint")
            .alias(f"c{m}")
            for m in range(M_SUB)
        ]
    )


_ADC_ORACLE = f"""
    WITH {_PQ_CTES},
    lut AS (
      SELECT s.vec_id AS query_id, s.m, c.cid,
             round(list_dot_product(s.sv, s.sv)
                   - 2 * list_dot_product(s.sv, c.cs)
                   + list_dot_product(c.cs, c.cs), 4) AS d2
      FROM sub s JOIN csub c ON s.m = c.m
      WHERE s.vec_id < {PQ_QUERIES}
    ),
    adc AS (
      SELECT l.query_id, k.vec_id AS neighbor_id,
             CAST(round(sum(CAST(l.d2 AS DECIMAL(18,4))), 3) AS DOUBLE)
               AS adc_d2
      FROM code k
      JOIN lut l ON l.m = k.m AND l.cid = k.cid
      WHERE k.vec_id <> l.query_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc_d2, rnk FROM (
      SELECT query_id, neighbor_id, adc_d2,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY adc_d2, neighbor_id
             ) AS BIGINT) AS rnk
      FROM adc
    ) WHERE rnk <= {PQ_TOPK}
    """


@query("q_pq_adc_topk", oracle=_ADC_ORACLE)
def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-k: nearest corpus vectors by PQ-approximated distance.

    The query-time half of PQ: per query, an M_SUB×K_CENT distance LUT
    is computed exactly once (tiny, broadcast); every corpus vector's
    approximate distance is then the sum of M_SUB LUT entries selected
    by its stored code — no corpus float math at all. Accuracy is
    bounded by quantization error; tests assert rank correlation with
    exact cosine top-k.
    """
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double().alias("v")
    )
    qsub = _subspaces(
        e.filter(F.col("vec_id") < PQ_QUERIES), "query_id"
    )
    csub = _subspaces(e.filter(F.col("vec_id") < K_CENT), "cid").select(
        "cid", "m", F.col("sv").alias("cs")
    )
    lut = qsub.join(csub, "m").select(
        "query_id", "m", "cid", _d2(F.col("sv"), F.col("cs")).alias("d2")
    )
    codes = _codes(spark, sf_dir)
    # DECIMAL accumulation (the r13 lorenz discipline): each d2 is a
    # 4-decimal value, but summing it as DOUBLE is order-sensitive —
    # under AQE/partition-count changes a sum landing on a .0005
    # boundary flips round(·, 3) (caught by the r14 codegen-off ×
    # AQE-off × shuffle-13 sweep: 1.075 vs 1.074). Casting to
    # DECIMAL(18,4) first makes the sum exact and order-free, so the
    # rounded distance is config-invariant and matches the oracle's
    # identical decimal form bit-for-bit.
    adc = (
        codes.join(F.broadcast(lut), ["m", "cid"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(
            F.round(F.sum(F.col("d2").cast("decimal(18,4)")), 3)
            .cast("double")
            .alias("adc_d2")
        )
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    return (
        adc.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= PQ_TOPK)
    )
