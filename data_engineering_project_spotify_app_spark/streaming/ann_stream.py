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
    IVF_TOPK,
    NPROBE,
    deterministic_centroids as _det_centroids,
    probed_search,
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


# re-export: the coarse quantizer lives with the batch operator so all
# three consumers (q_ann_ivf, q_ann_ivf_partitioned, this sink) share
# ONE spelling of the oracle-pinned convention
deterministic_centroids = _det_centroids


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
        # within-batch dedup + cross-epoch duplicate guard: a vec_id
        # re-delivered by a backfill must not produce a second index
        # row (duplicate rows would double-emit a neighbor and evict a
        # true top-k hit — breaking the ==batch-q_ann_ivf contract).
        # The guard probes the STORE for the batch's ids: the batch-id
        # frame is tiny and broadcast into a semi-join, so on a store
        # table bucketed by vec_id this is a pruned probe, not a scan.
        n = _normed(batch_df).dropDuplicates(["vec_id"])
        store = self.read_store(before_epoch=epoch_id)
        if store is not None:
            already = store.select("vec_id").join(
                F.broadcast(n.select("vec_id")), "vec_id", "leftsemi"
            )
            n = n.join(F.broadcast(already), "vec_id", "left_anti")
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
        """Probed top-k over the streamed index using the STORED
        assignments: the SAME oracle-pinned search DAG as the batch
        operator (operators/ivf.probed_search), with the corpus-wide
        assignment stage skipped — it was paid once at ingest. Queries
        are the q_ann_ivf convention (vec_id < IVF_QUERIES); output
        schema matches q_ann_ivf exactly:
        (query_id, neighbor_id, sim, rnk)."""
        index = self.current_index()
        if index is None:
            return None
        # topk must flow INTO probed_search: it ranks and filters
        # rnk <= topk internally, so a post-hoc filter on its output
        # could never widen a smaller internal default.
        return probed_search(
            index.select("vec_id", "v", "nrm"),
            self.centroids,
            nprobe=nprobe,
            assign=index.select("vec_id", "cid"),
            topk=topk,
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
