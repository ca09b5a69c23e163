"""Streaming C4-style line dedup: the streaming twin of
``q_dedup_lines`` (operators/linedup.py), built on the same
epoch-versioned store + commit-marker contract as dedup_stream.py.

Batch semantics: a line (non-overlapping K-token chunk) is kept only at
its FIRST corpus occurrence, ordered by (doc_id, line_idx). When the
stream delivers documents in ascending doc_id order — the natural shape
for an append-only ingest where doc ids are assigned on arrival — the
streamed result is EXACTLY the batch recompute: within a micro-batch
the min-(doc_id, line_idx) aggregate picks the batch-local first
occurrence, and the digest-store anti-join removes every line some
earlier epoch already kept. Equivalence across arbitrary ascending
splits is pinned in tests/test_streaming_dedup.py.

The store is the set of line digests kept so far — O(distinct lines)
rows, the same cardinality the batch aggregate shuffles — snapshotted
per epoch (state rewrite is cheap; the document history is never
rescanned). At 100 TB the store is a bucketed table keyed by digest so
the per-epoch anti-join is a co-partitioned probe.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.operators.linedup import (
    LINE_TOKENS,
    _chunk_lines,
)


class StreamingLineDedupSink:
    """foreachBatch maintainer: per-epoch cleaned-document logs + a
    kept-line digest store as a committed snapshot chain."""

    def __init__(
        self, spark: SparkSession, out_dir: str, k: int = LINE_TOKENS
    ) -> None:
        self.spark = spark
        self.out_dir = out_dir
        self.k = k

    def _store_dir(self, epoch_id: int) -> str:
        return os.path.join(self.out_dir, f"digests_v{epoch_id}")

    def _docs_dir(self, epoch_id: int) -> str:
        return os.path.join(self.out_dir, f"docs_e{epoch_id}")

    def _committed(self, path: str) -> bool:
        return os.path.exists(os.path.join(path, "_COMMITTED"))

    def _mark(self, path: str) -> None:
        with open(os.path.join(path, "_COMMITTED"), "w") as fh:
            fh.write("ok\n")

    def _versions(self, prefix: str) -> list[int]:
        if not os.path.isdir(self.out_dir):
            return []
        return sorted(
            int(n[len(prefix):])
            for n in os.listdir(self.out_dir)
            if n.startswith(prefix)
            and self._committed(os.path.join(self.out_dir, n))
        )

    def compact(self, retain_last: int = 1) -> list[int]:
        """Retire superseded digest-store snapshots (each version fully
        contains every prior one); cleaned-doc logs are never touched.
        Same contract as StreamingLshDedupSink.compact."""
        versions = self._versions("digests_v")
        keep = versions[-max(1, retain_last):]
        dropped = []
        for v in versions:
            if v not in keep:
                shutil.rmtree(self._store_dir(v), ignore_errors=True)
                dropped.append(v)
        return dropped

    def current_store(self) -> DataFrame | None:
        versions = self._versions("digests_v")
        if not versions:
            return None
        return self.spark.read.parquet(self._store_dir(versions[-1]))

    def clean_docs(self) -> DataFrame | None:
        """Union of every committed per-epoch cleaned-document log —
        the streamed equivalent of the batch dedup_lines result."""
        epochs = self._versions("docs_e")
        if not epochs:
            return None
        return self.spark.read.parquet(
            *[self._docs_dir(e) for e in epochs]
        )

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        docs_dir = self._docs_dir(epoch_id)
        store_dir = self._store_dir(epoch_id)
        if self._committed(docs_dir) and self._committed(store_dir):
            return  # replayed epoch
        prior = [v for v in self._versions("digests_v") if v < epoch_id]
        store = (
            self.spark.read.parquet(self._store_dir(prior[-1]))
            if prior
            else None
        )
        # Chunk ONCE per epoch; both consumers (the cleaned-doc log and
        # the store append) read the staged materialization, the same
        # diamond-avoidance trade as dedup_stream's staged bands.
        lines = _chunk_lines(batch_df, self.k).withColumn(
            "h", F.md5("line")
        )
        staged = os.path.join(self.out_dir, f"staged_e{epoch_id}")
        lines.write.mode("overwrite").parquet(staged)
        lines = self.spark.read.parquet(staged)
        # batch-local first occurrence: the same min-struct HASH
        # AGGREGATE as batch dedup_lines (never a window over the
        # digest — the mega-duplicated boilerplate line argument)
        firsts = lines.groupBy("h").agg(
            F.min(F.struct("doc_id", "line_idx")).alias("first")
        )
        if store is not None:
            firsts = firsts.join(store, "h", "left_anti")
        flagged = lines.join(
            firsts, "h", "left"
        ).select(
            "doc_id",
            "line_idx",
            "line",
            "h",
            (
                F.col("first").isNotNull()
                & (F.col("doc_id") == F.col("first.doc_id"))
                & (F.col("line_idx") == F.col("first.line_idx"))
            ).alias("keep"),
        )
        if not self._committed(docs_dir):
            cleaned = flagged.groupBy("doc_id").agg(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("keep"),
                                    F.struct("line_idx", "line"),
                                )
                            )
                        ),
                        lambda s: s["line"],
                    ),
                ).alias("clean_text"),
                F.count(F.when(F.col("keep"), 1)).alias("n_kept"),
                F.count(F.when(~F.col("keep"), 1)).alias("n_dropped"),
            )
            cleaned.write.mode("overwrite").parquet(docs_dir)
            self._mark(docs_dir)
        later = [v for v in self._versions("digests_v") if v > epoch_id]
        if not self._committed(store_dir) and not later:
            # see StreamingLshDedupSink: a later snapshot already holds
            # this epoch's digests — never rebuild a compacted version
            new_digests = flagged.filter("keep").select("h").distinct()
            new_store = (
                store.unionByName(new_digests)
                if store is not None
                else new_digests
            )
            new_store.write.mode("overwrite").parquet(store_dir)
            self._mark(store_dir)
        if os.path.isdir(staged):
            shutil.rmtree(staged, ignore_errors=True)


def maintain_line_dedup(
    spark: SparkSession,
    stream_df: DataFrame,
    out_dir: str,
    name: str,
    k: int = LINE_TOKENS,
):
    """Attach the streaming line-dedup maintainer to a document stream;
    returns (query, sink) so callers read ``sink.clean_docs()``."""
    sink = StreamingLineDedupSink(spark, out_dir, k=k)
    q = (
        stream_df.writeStream.outputMode("append")
        .queryName(name)
        .foreachBatch(sink)
        .start()
    )
    return q, sink
