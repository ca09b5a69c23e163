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
rows, the same cardinality the batch aggregate shuffles — maintained
as an append-only delta chain (per-epoch O(|new digests|) writes plus
a compact() that folds deltas into a base), never a per-epoch rewrite
of the whole store; the document history is never rescanned. At 100 TB
the store is a bucketed table keyed by digest so the per-epoch
anti-join is a co-partitioned probe, and compact() is its table
compaction job.
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

    # Store layout mirrors StreamingLshDedupSink's append-only delta
    # chain: digests_e{N} = the digests epoch N newly KEPT (O(|delta|)
    # write — never a full-store rewrite), base_v{B} = compacted base
    # for epochs <= B, read = base + committed deltas. Marker order:
    # docs log first, then the digest delta, so a committed delta
    # implies its cleaned docs are durable (what makes compaction of
    # committed deltas replay-safe).

    def _delta_dir(self, epoch_id: int) -> str:
        return os.path.join(self.out_dir, f"digests_e{epoch_id}")

    def _base_dir(self, version: int) -> str:
        return os.path.join(self.out_dir, f"base_v{version}")

    def _docs_dir(self, epoch_id: int) -> str:
        return os.path.join(self.out_dir, f"docs_e{epoch_id}")

    def _committed(self, path: str) -> bool:
        return os.path.exists(os.path.join(path, "_COMMITTED"))

    def _mark(self, path: str) -> None:
        with open(os.path.join(path, "_COMMITTED"), "w") as fh:
            fh.write("ok\n")

    def _committed_ids(self, prefix: str) -> list[int]:
        if not os.path.isdir(self.out_dir):
            return []
        return sorted(
            int(n[len(prefix):])
            for n in os.listdir(self.out_dir)
            if n.startswith(prefix)
            and n[len(prefix):].isdigit()
            and self._committed(os.path.join(self.out_dir, n))
        )

    def _base_epoch(self) -> int | None:
        bases = self._committed_ids("base_v")
        return bases[-1] if bases else None

    def committed_delta_epochs(self) -> list[int]:
        base = self._base_epoch()
        return [
            v
            for v in self._committed_ids("digests_e")
            if base is None or v > base
        ]

    def _store_paths(self, before_epoch: int | None = None) -> list[str]:
        base = self._base_epoch()
        paths = []
        if base is not None:
            if before_epoch is not None and base >= before_epoch:
                raise ValueError(
                    f"digest store as of epoch {before_epoch} is not "
                    f"reconstructible: base_v{base} already folded it in"
                )
            paths.append(self._base_dir(base))
        paths += [
            self._delta_dir(v)
            for v in self.committed_delta_epochs()
            if before_epoch is None or v < before_epoch
        ]
        return paths

    def compact(self) -> list[int]:
        """Fold every committed digest delta into a new base; cleaned-
        doc logs untouched. Same crash-safety argument as
        StreamingLshDedupSink.compact."""
        old_base = self._base_epoch()
        deltas = self.committed_delta_epochs()
        if not deltas:
            return []
        target = max(deltas)
        self.current_store().write.mode("overwrite").parquet(
            self._base_dir(target)
        )
        self._mark(self._base_dir(target))
        for v in deltas:
            shutil.rmtree(self._delta_dir(v), ignore_errors=True)
        if old_base is not None:
            shutil.rmtree(self._base_dir(old_base), ignore_errors=True)
        return deltas

    def current_store(self) -> DataFrame | None:
        paths = self._store_paths()
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def clean_docs(self) -> DataFrame | None:
        """Union of every committed per-epoch cleaned-document log —
        the streamed equivalent of the batch dedup_lines result."""
        epochs = self._committed_ids("docs_e")
        if not epochs:
            return None
        return self.spark.read.parquet(
            *[self._docs_dir(e) for e in epochs]
        )

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        docs_dir = self._docs_dir(epoch_id)
        delta_dir = self._delta_dir(epoch_id)
        base = self._base_epoch()
        delta_done = self._committed(delta_dir) or (
            base is not None and base >= epoch_id
        )
        if self._committed(docs_dir) and delta_done:
            return  # replayed epoch
        store_paths = self._store_paths(before_epoch=epoch_id)
        store = (
            self.spark.read.parquet(*store_paths) if store_paths else None
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
        if not delta_done:
            # DELTA write: only this epoch's newly-kept digests —
            # O(|delta|), never a rewrite of the whole digest store
            flagged.filter("keep").select("h").distinct().write.mode(
                "overwrite"
            ).parquet(delta_dir)
            self._mark(delta_dir)
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
