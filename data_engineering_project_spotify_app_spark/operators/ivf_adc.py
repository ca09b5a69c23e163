"""IVF-ADC: the composed vector index — coarse probing × PQ codes.

ivf.py bounds WHICH vectors each query scores (NPROBE inverted lists of
N·NPROBE/K candidates); pq.py bounds WHAT each scoring costs (8-byte
codes + a broadcast LUT instead of raw-vector float math). Composing
them is the standard billion-scale layout (the FAISS "IVFxx,PQyy"
index): at 100 TB the search reads NPROBE/K of the corpus at 8 bytes
per vector — both reductions multiply.

Deterministic centroids (lowest vec_ids) keep the composition exactly
oracle-checkable end-to-end, same trade as the parent modules: swapping
in k-means codebooks changes the two tiny centroid frames, not the plan.

Plan shape at scale:
- inverted lists are the partition key for the code table (here a
  groupBy key): a probe touches only its lists' partitions;
- the candidate set (query_id, cand_id) is bounded by Q·NPROBE·N/K and
  broadcasts; corpus codes stream through one broadcast hash join;
- the ADC sum is a partial aggregate on (query_id, neighbor_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_engineering_project_spotify_app_spark.operators.ivf import (
    N_CENTROIDS,
    NPROBE,
    _norm_frame,
)
from data_engineering_project_spotify_app_spark.operators.pq import (
    K_CENT,
    PQ_QUERIES,
    PQ_TOPK,
    _codes,
    _d2,
    _PQ_CTES,
    _subspaces,
)
from data_engineering_project_spotify_app_spark.operators.registry import query
from data_engineering_project_spotify_app_spark.operators.similarity import dot

# Coarse-quantizer CTEs bolt onto _PQ_CTES (which defines e/sub/csub/
# code); the coarse centroid id is `ccid` to stay clear of the PQ
# codebook's `cid`.
_IVF_ADC_ORACLE = f"""
    WITH {_PQ_CTES},
    n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
    ),
    cent AS (
      SELECT vec_id AS ccid, v AS cv, nrm AS cnrm FROM n
      WHERE vec_id < {N_CENTROIDS}
    ),
    coarse AS (
      SELECT n.vec_id, cent.ccid,
             row_number() OVER (
               PARTITION BY n.vec_id
               ORDER BY round(list_dot_product(n.v, cent.cv)
                              / (n.nrm * cent.cnrm), 4) DESC,
                        cent.ccid
             ) AS rn
      FROM n CROSS JOIN cent
    ),
    assign AS (
      SELECT vec_id, ccid FROM coarse WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, ccid FROM coarse
      WHERE vec_id < {PQ_QUERIES} AND rn <= {NPROBE}
    ),
    cands AS (
      SELECT DISTINCT p.query_id, a.vec_id AS cand_id
      FROM probes p JOIN assign a ON p.ccid = a.ccid
      WHERE a.vec_id <> p.query_id
    ),
    lut AS (
      SELECT s.vec_id AS query_id, s.m, c.cid,
             round(list_dot_product(s.sv, s.sv)
                   - 2 * list_dot_product(s.sv, c.cs)
                   + list_dot_product(c.cs, c.cs), 4) AS d2
      FROM sub s JOIN csub c ON s.m = c.m
      WHERE s.vec_id < {PQ_QUERIES}
    ),
    adc AS (
      SELECT cn.query_id, k.vec_id AS neighbor_id,
             CAST(round(sum(CAST(l.d2 AS DECIMAL(18,4))), 3) AS DOUBLE)
               AS adc_d2
      FROM cands cn
      JOIN code k ON k.vec_id = cn.cand_id
      JOIN lut l ON l.query_id = cn.query_id
               AND l.m = k.m AND l.cid = k.cid
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


@query("q_ann_ivf_adc", oracle=_IVF_ADC_ORACLE)
def q_ann_ivf_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probed ADC top-k: PQ distances summed only over the NPROBE
    nearest inverted lists of each query.

    The two approximations compose independently: IVF bounds recall by
    list coverage, PQ bounds precision by quantization error; tests
    check the result against both parents (⊆ IVF candidates; ADC
    distances equal q_pq_adc_topk's on the shared pairs).
    """
    n = _norm_frame(spark, sf_dir)
    cent = n.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("ccid"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    csim = F.round(
        dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm")), 4
    )
    ranked = (
        n.crossJoin(F.broadcast(cent))
        .select("vec_id", "ccid", csim.alias("csim"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), "ccid")
            ),
        )
        # N×N_CENTROIDS rows consumed by BOTH the assignment (rn = 1)
        # and the probe list (rn <= NPROBE) — the lazy checkpoint stops
        # the corpus×centroid scoring + window running twice (§2.4)
        .localCheckpoint(eager=False)
    )
    assign = ranked.filter(F.col("rn") == 1).select("vec_id", "ccid")
    probes = ranked.filter(
        (F.col("vec_id") < PQ_QUERIES) & (F.col("rn") <= NPROBE)
    ).select(F.col("vec_id").alias("query_id"), "ccid")
    # probes is Q·NPROBE rows by construction but sits behind a window,
    # so the planner has no stats — hint the broadcast explicitly or the
    # assign side gets sort-merge-shuffled for nothing.
    cands = (
        F.broadcast(probes)
        .join(assign, "ccid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"))
        .distinct()
    )

    e = n.select("vec_id", "v")
    qsub = _subspaces(e.filter(F.col("vec_id") < PQ_QUERIES), "query_id")
    csub = _subspaces(e.filter(F.col("vec_id") < K_CENT), "cid").select(
        "cid", "m", F.col("sv").alias("cs")
    )
    lut = qsub.join(csub, "m").select(
        "query_id", "m", "cid", _d2(F.col("sv"), F.col("cs")).alias("d2")
    )
    codes = _codes(spark, sf_dir)
    adc = (
        codes.join(
            F.broadcast(cands), codes["vec_id"] == cands["cand_id"]
        )
        .join(F.broadcast(lut), ["query_id", "m", "cid"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        # DECIMAL accumulation — same order-sensitivity fix as
        # q_pq_adc_topk (pq.py): exact sum of 4-decimal units, so the
        # 3-decimal rounding is config-invariant
        .agg(
            F.round(F.sum(F.col("d2").cast("decimal(18,4)")), 3)
            .cast("double")
            .alias("adc_d2")
        )
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    return adc.withColumn("rnk", F.row_number().over(w).cast("bigint")).filter(
        F.col("rnk") <= PQ_TOPK
    )
