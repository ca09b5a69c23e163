"""IVF-style ANN: coarse quantizer → inverted lists → probed search.

The second scale path for similarity search (alongside the SRP-LSH
buckets in similarity.py). Classic IVF shape:

1. centroids: K representative vectors. Deterministically chosen here
   (the K lowest vec_ids) so the operator is exactly oracle-checkable;
   production would drop in k-means centroids — the query shape is
   identical.
2. assign: every vector joins its nearest centroid (broadcast centroids,
   one corpus scan) → inverted lists.
3. search: each query probes the NPROBE nearest centroid lists only —
   candidate set shrinks from N to ≈ N·NPROBE/K.

All vector math is the built-in HOF dot product (JVM-side); a vectorized
Pandas-UDF alternative lives in functions/vectors.py with an equivalence
test, for when batched numpy beats codegen (very high dims).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_engineering_project_spotify_app_spark.operators.registry import query
from data_engineering_project_spotify_app_spark.operators.similarity import (
    _as_double,
    dot,
)
from data_engineering_project_spotify_app_spark.tables import table

N_CENTROIDS = 8
NPROBE = 2
# Trained centroids partition tighter than the deterministic random
# ones, so true neighbors straddle list boundaries more often — the
# standard remedy is a higher nprobe (recall/cost knob: candidates
# scale with nprobe/K).
KMEANS_NPROBE = 4
IVF_TOPK = 3
IVF_QUERIES = 5  # vec_id < 5 are the query set


def _norm_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings").select("vec_id", _as_double().alias("v"))
    return e.select(
        "vec_id", "v", F.sqrt(dot(F.col("v"), F.col("v"))).alias("nrm")
    )


_IVF_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
    ),
    cent AS (
      SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n
      WHERE vec_id < {N_CENTROIDS}
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT n.vec_id, cent.cid,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY round(list_dot_product(n.v, cent.cv) / (n.nrm * cent.cnrm), 4) DESC,
                          cent.cid
               ) AS rn
        FROM n CROSS JOIN cent
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT n.vec_id, cent.cid,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY round(list_dot_product(n.v, cent.cv) / (n.nrm * cent.cnrm), 4) DESC,
                          cent.cid
               ) AS rn
        FROM n CROSS JOIN cent
        WHERE n.vec_id < {IVF_QUERIES}
      ) WHERE rn <= {NPROBE}
    ),
    cands AS (
      SELECT DISTINCT p.query_id, a.vec_id AS cand_id
      FROM probes p JOIN assign a ON p.cid = a.cid
      WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, sim, rnk FROM (
      SELECT c.query_id, c.cand_id AS neighbor_id,
             round(list_dot_product(q.v, x.v) / (q.nrm * x.nrm), 4) AS sim,
             CAST(row_number() OVER (
               PARTITION BY c.query_id
               ORDER BY round(list_dot_product(q.v, x.v) / (q.nrm * x.nrm), 4) DESC,
                        c.cand_id
             ) AS BIGINT) AS rnk
      FROM cands c
      JOIN n q ON q.vec_id = c.query_id
      JOIN n x ON x.vec_id = c.cand_id
    ) WHERE rnk <= {IVF_TOPK}
    """


@query("q_ann_ivf", oracle=_IVF_ORACLE)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probed search: top-k among the NPROBE nearest inverted lists.

    Scale: centroid assignment is one broadcast-join scan (K tiny);
    the search joins each query only to its probed lists — candidate
    work is N·NPROBE/K instead of N. Lists are the shuffle key, so a
    hot list is AQE-splittable. Recall vs brute force is bounded in
    tests/test_sketches.py-style checks (see tests/test_ivf.py).
    """
    n = _norm_frame(spark, sf_dir)
    return probed_search(n, deterministic_centroids(n))


def deterministic_centroids(n: DataFrame) -> DataFrame:
    """(cid, cv, cnrm): the K lowest vec_ids as the coarse quantizer —
    exactly oracle-checkable (the cent CTE). Shared by q_ann_ivf and
    the streaming index maintainer (streaming/ann_stream.py); swap in
    k-means centroids for the production quantizer."""
    return n.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )


def probed_search(
    n: DataFrame,
    cent: DataFrame,
    nprobe: int = NPROBE,
    assign: DataFrame | None = None,
    topk: int = IVF_TOPK,
) -> DataFrame:
    """The IVF search DAG given a (vec_id, v, nrm) corpus and a
    (cid, cv, cnrm) centroid frame — shared by the deterministic and
    the k-means-trained variants; the query shape is identical, only
    where the centroids come from (and how many lists each query
    probes) differs.

    ``assign``: optional STORED (vec_id, cid) assignment frame — the
    at-rest inverted lists maintained by the streaming index sink.
    When given, the corpus-wide assignment ranking is skipped (it was
    paid once at ingest) and only the Q×K query-side probe ranking
    runs; when None, assignment is computed in-plan (the batch
    build-and-search shape)."""
    csim = F.round(
        dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm")), 4
    )

    w = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), "cid")
    if assign is None:
        scored = n.crossJoin(F.broadcast(cent)).select(
            "vec_id", "cid", csim.alias("csim")
        )
        ranked = scored.withColumn("rn", F.row_number().over(w))
        assign = ranked.filter(F.col("rn") == 1).select("vec_id", "cid")
        probes = (
            ranked.filter(
                (F.col("vec_id") < IVF_QUERIES) & (F.col("rn") <= nprobe)
            ).select(F.col("vec_id").alias("query_id"), "cid")
        )
    else:
        probes = (
            n.filter(F.col("vec_id") < IVF_QUERIES)
            .select("vec_id", "v", "nrm")
            .crossJoin(F.broadcast(cent))
            .select("vec_id", "cid", csim.alias("csim"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= nprobe)
            .select(F.col("vec_id").alias("query_id"), "cid")
        )

    # probes is Q·NPROBE rows by construction but sits behind a window
    # (no stats) — hint the broadcast or assign gets sort-merge-shuffled.
    # No distinct on cands: a candidate has exactly ONE assigned list
    # (rn=1 / unique stored assignment) and a query probes each list at
    # most once, so (query_id, cand_id) rows are already unique — a
    # distinct here would shuffle the candidate set for nothing (same
    # argument as q_ann_ivf_partitioned's probe join).
    cands = (
        F.broadcast(probes)
        .join(assign, "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"))
    )
    qn = n.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    xn = n.select(
        F.col("vec_id").alias("cand_id"),
        F.col("v").alias("xv"),
        F.col("nrm").alias("xnrm"),
    )
    sim = F.round(
        dot(F.col("qv"), F.col("xv")) / (F.col("qnrm") * F.col("xnrm")), 4
    )
    return (
        cands.join(F.broadcast(qn), "query_id")
        .join(xn, "cand_id")
        .select("query_id", F.col("cand_id").alias("neighbor_id"), sim.alias("sim"))
        .withColumn(
            "rnk",
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy(
                    F.col("sim").desc(), "neighbor_id"
                )
            )
            .cast("bigint"),
        )
        .filter(F.col("rnk") <= topk)
    )


@query("q_ann_ivf_kmeans")  # rows-only: trained centroids are engine-specific
def q_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probed search over K-MEANS-TRAINED centroids — the production
    coarse quantizer (q_ann_ivf's deterministic lowest-id centroids
    exist so the *search* is exactly oracle-checkable; this variant
    replaces them with a real pyspark.ml KMeans fit, seed-pinned).

    Vectors are L2-normalized before the fit so euclidean k-means
    clusters by cosine direction (spherical-ish k-means — the right
    coarse quantizer for cosine search). The trained centers are K×DIM
    doubles collected driver-side (tiny) and re-enter the plan as a
    broadcast centroid frame feeding the identical probed-search DAG.

    No DuckDB oracle by design: k-means|| initialization is
    engine-specific. The driver records a rows-only check;
    tests/test_ivf.py bounds recall vs the brute-force baseline.

    Scale: the fit is Spark ML's distributed Lloyd iterations (each a
    broadcast-centers + map-side partial-sum pass over the corpus);
    everything after the fit is the same N·NPROBE/K search as q_ann_ivf.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    n = _norm_frame(spark, sf_dir)
    # zero-norm guard: an all-zero embedding has no direction — x/nrm
    # would inject NaN features and poison (or fail) the KMeans fit
    unit = n.filter(F.col("nrm") > 0).select(
        "vec_id",
        F.transform("v", lambda x: x / F.col("nrm")).alias("u"),
    )
    feats = unit.select("vec_id", array_to_vector(F.col("u")).alias("features"))
    model = KMeans(
        k=N_CENTROIDS, seed=42, maxIter=10, initMode="k-means||"
    ).fit(feats)
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    cent = (
        spark.createDataFrame(centers, "cid int, cv array<double>")
        .select(
            "cid",
            "cv",
            F.sqrt(dot(F.col("cv"), F.col("cv"))).alias("cnrm"),
        )
    )
    return probed_search(n, F.broadcast(cent), nprobe=KMEANS_NPROBE)


@query("q_ann_ivf_partitioned", oracle=_IVF_ORACLE)
def q_ann_ivf_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with the inverted lists AT REST: the assignment table is
    landed as parquet PARTITIONED BY list id (one directory per list —
    the Spark-native inverted-index layout), and the probe stage joins
    the index against the broadcast probe set on the partition column,
    so DYNAMIC PARTITION PRUNING reads only the probed lists' files.
    Identical semantics to q_ann_ivf (the oracle IS q_ann_ivf's);
    what changes is the physics: at 100 TB the index write is the
    nightly build, and each query batch's scan cost is
    |probed lists| / K of the corpus INSTEAD of a full scan — the scan
    itself becomes the candidate filter. Plan pinned in
    tests/test_plans.py (dynamicpruning expression on the index scan).

    Landing is per-SF and overwritten on re-run (q_bucketed_join's
    idempotent-landing convention).
    """
    import os

    n = _norm_frame(spark, sf_dir)
    cent = n.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    csim = F.round(
        dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm")), 4
    )
    scored = n.crossJoin(F.broadcast(cent)).select(
        "vec_id", "v", "nrm", "cid", csim.alias("csim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), "cid")
    ranked = scored.withColumn("rn", F.row_number().over(w))

    tok = "".join(
        c if c.isalnum() else "_"
        for c in sf_dir.rstrip("/").rsplit("/", 1)[-1]
    )
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "/tmp/spark-warehouse"
    ).removeprefix("file:")
    index_path = os.path.join(wh, f"ivf_index_{tok}")
    (
        ranked.filter(F.col("rn") == 1)
        .select("vec_id", "v", "nrm", "cid")
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(index_path)
    )
    index = spark.read.parquet(index_path)

    probes = ranked.filter(
        (F.col("vec_id") < IVF_QUERIES) & (F.col("rn") <= NPROBE)
    ).select(F.col("vec_id").alias("query_id"), "cid")

    # join on the PARTITION column with the probe side broadcast →
    # dynamic partition pruning: only probed cid= directories are read
    # no distinct needed: assignment is rn=1 unique, so a candidate
    # meets each query through exactly one probed list — and a distinct
    # here would shuffle the vector payloads for nothing
    cands = (
        index.join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.col("v").alias("xv"),
            F.col("nrm").alias("xnrm"),
        )
    )
    qn = n.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    sim = F.round(
        dot(F.col("qv"), F.col("xv")) / (F.col("qnrm") * F.col("xnrm")), 4
    )
    return (
        cands.join(F.broadcast(qn), "query_id")
        .select(
            "query_id", F.col("cand_id").alias("neighbor_id"), sim.alias("sim")
        )
        .withColumn(
            "rnk",
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy(
                    F.col("sim").desc(), "neighbor_id"
                )
            )
            .cast("bigint"),
        )
        .filter(F.col("rnk") <= IVF_TOPK)
    )
