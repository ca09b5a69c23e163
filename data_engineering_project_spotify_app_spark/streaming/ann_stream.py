"""Streaming IVF index maintenance: the daily-ingest twin of the
q_ann_ivf family (operators/ivf.py), on the same append-only
delta-chain store as the streaming dedup sinks (delta_chain.py).

Each micro-batch of new vectors is normalized and assigned to its
nearest coarse-quantizer centroid ONCE (broadcast centroids — K tiny),
and the (vec_id, v, nrm, cid) rows are appended as the epoch's delta.
The union of base + deltas IS the inverted index: search probes the
NPROBE nearest lists using the STORED assignments, so the per-vector
assignment cost is paid once at ingest, never per query — the point of
an at-rest IVF index. Because assignment depends only on the vector
and the (fixed) centroids, the streamed index is row-identical to the
batch-built one, and search over it equals the batch q_ann_ivf result
exactly (pinned in tests/test_streaming_ann.py across splits, replays,
and compactions).

The coarse quantizer is trained ONCE and held fixed — the standard IVF
operating mode; re-training centroids is an index REBUILD (a batch
job), not an incremental update, because every stored assignment would
change. At 100 TB the store is a table partitioned by cid (the
q_ann_ivf_partitioned layout) so probed search prunes to the probed
lists' partitions; the delta chain here is the format-free stand-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_engineering_project_spotify_app_spark.operators.ivf import (
    IVF_QUERIES,
    IVF_TOPK,
    N_CENTROIDS,
    NPROBE,
)
from data_engineering_project_spotify_app_spark.operators.similarity import dot
from data_engineering_project_spotify_app_spark.streaming.delta_chain import (
    DeltaChainStore,
)
from data_engineering_project_spotify_app_spark.streaming.sinks import (
    resolve_checkpoint,
)

VEC_SCHEMA = "vec_id long, embedding array<double>"


def stream_vectors(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """NDJSON vector file stream (vec_id, embedding) — one file per
    micro-batch at the default trigger, mirroring stream_documents."""
    return (
        spark.readStream.schema(VEC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(src_dir)
    )


def deterministic_centroids(vectors: DataFrame) -> DataFrame:
    """(cid, cv, cnrm): the K lowest vec_ids as centroids — the same
    deterministic coarse quantizer as q_ann_ivf, so the streamed index
    is exactly comparable to the oracle-checked batch operator.
    Production drops in k-means centroids; the sink is agnostic."""
    return (
        vectors.filter(F.col("vec_id") < N_CENTROIDS)
        .select(
            F.col("vec_id").alias("cid"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cnrm"),
        )
    )


def _normed(batch: DataFrame) -> DataFrame:
    v = F.col("embedding").cast("array<double>")
    return batch.select(
        "vec_id",
        v.alias("v"),
        F.sqrt(dot(v, v)).alias("nrm"),
    )


class StreamingIvfIndexSink(DeltaChainStore):
    """foreachBatch maintainer of an at-rest IVF index: per-epoch
    (vec_id, v, nrm, cid) deltas, assignment paid once at ingest."""

    DELTA_PREFIX = "vecs_e"

    def __init__(
        self, spark: SparkSession, out_dir: str, centroids: DataFrame
    ) -> None:
        self.spark = spark
        self.out_dir = out_dir
        self.centroids = centroids

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        delta_dir = self._delta_dir(epoch_id)
        base = self._base_epoch()
        if self._committed(delta_dir) or (
            base is not None and base >= epoch_id
        ):
            return  # replayed epoch: delta durable (or folded)
        n = _normed(batch_df)
        csim = F.round(
            dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm")), 4
        )
        w = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), "cid")
        assigned = (
            n.crossJoin(F.broadcast(self.centroids))
            .select("vec_id", "v", "nrm", "cid", csim.alias("csim"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "v", "nrm", "cid")
        )
        assigned.write.mode("overwrite").parquet(delta_dir)
        self._mark(delta_dir)

    def current_index(self) -> DataFrame | None:
        return self.read_store()

    def search(
        self, nprobe: int = NPROBE, topk: int = IVF_TOPK
    ) -> DataFrame | None:
        """Probed top-k over the streamed index using STORED
        assignments (the inverted lists are at rest — contrast
        operators/ivf.probed_search, which assigns in-plan because the
        batch operator builds and searches in one DAG). Queries are the
        q_ann_ivf convention: vec_id < IVF_QUERIES. Output schema
        matches q_ann_ivf exactly: (query_id, neighbor_id, sim, rnk)."""
        index = self.current_index()
        if index is None:
            return None
        csim = F.round(
            dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm")), 4
        )
        w = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), "cid")
        probes = (
            index.filter(F.col("vec_id") < IVF_QUERIES)
            .select("vec_id", "v", "nrm")  # drop stored cid: the probe
            # ranking needs ALL centroids per query, not the assignment
            .crossJoin(F.broadcast(self.centroids))
            .select("vec_id", "cid", csim.alias("csim"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= nprobe)
            .select(F.col("vec_id").alias("query_id"), "cid")
        )
        cands = (
            F.broadcast(probes)
            .join(index.select("vec_id", "cid"), "cid")
            .filter(F.col("vec_id") != F.col("query_id"))
            .select("query_id", F.col("vec_id").alias("cand_id"))
            .distinct()
        )
        qn = index.select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
        ).filter(F.col("query_id") < IVF_QUERIES)
        xn = index.select(
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
            .select(
                "query_id",
                F.col("cand_id").alias("neighbor_id"),
                sim.alias("sim"),
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
            .filter(F.col("rnk") <= topk)
        )


def maintain_ivf_index(
    spark: SparkSession,
    stream_df: DataFrame,
    out_dir: str,
    name: str,
    centroids: DataFrame,
    checkpoint_dir: str | None = None,
):
    """Attach the IVF index maintainer to a vector stream; returns
    (query, sink) so callers use ``sink.search()`` /
    ``sink.current_index()``. checkpointLocation is always set — see
    resolve_checkpoint."""
    sink = StreamingIvfIndexSink(spark, out_dir, centroids)
    q = (
        stream_df.writeStream.outputMode("append")
        .queryName(name)
        .option(
            "checkpointLocation", resolve_checkpoint(out_dir, checkpoint_dir)
        )
        .foreachBatch(sink)
        .start()
    )
    return q, sink
