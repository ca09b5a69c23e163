"""Streaming sinks: exactly-once via foreachBatch + idempotent writes.

The reference's sink is at-least-once and non-atomic (threaded uploads,
partial state on failure — app.py:203–211, SURVEY.md §4). The streaming
engine upgrades that: foreachBatch hands each micro-batch to a batch
writer together with a monotonically increasing epoch id; writing each
epoch to its own directory (and skipping epochs already committed) makes
the sink idempotent under retries — replaying a failed epoch overwrites
the same path instead of duplicating rows.

At 100 TB the same pattern targets a transactional table format; the
epoch-directory form shown here is the format-free equivalent and keeps
the exactly-once contract testable in this container.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


class EpochJsonSink:
    """Idempotent per-epoch NDJSON writer for writeStream.foreachBatch.

    Layout: ``{out_dir}/epoch={epoch_id}/part-*.json`` plus a
    ``_COMMITTED`` marker written after the data. A retried epoch either
    overwrites an uncommitted attempt or is skipped when already
    committed — never appended twice.
    """

    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir

    def _epoch_dir(self, epoch_id: int) -> str:
        return os.path.join(self.out_dir, f"epoch={epoch_id}")

    def committed_epochs(self) -> list[int]:
        if not os.path.isdir(self.out_dir):
            return []
        out = []
        for name in os.listdir(self.out_dir):
            if name.startswith("epoch=") and os.path.exists(
                os.path.join(self.out_dir, name, "_COMMITTED")
            ):
                out.append(int(name.split("=", 1)[1]))
        return sorted(out)

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        target = self._epoch_dir(epoch_id)
        if os.path.exists(os.path.join(target, "_COMMITTED")):
            return  # replayed epoch: already durable, skip
        batch_df.write.mode("overwrite").json(target)
        with open(os.path.join(target, "_COMMITTED"), "w") as fh:
            fh.write("ok\n")


def resolve_checkpoint(out_dir: str, checkpoint_dir: str | None = None) -> str:
    """Default checkpointLocation for every epoch-keyed attacher:
    ``out_dir/_checkpoint`` unless the caller names one. Shared so the
    fallback rule lives in ONE place — the epoch-marker contract needs
    durable monotone epoch ids, and a checkpoint-less restart resets
    epoch ids to 0, landing new files on already-marked epochs where
    they are skipped as replays (silent data loss)."""
    return checkpoint_dir or os.path.join(out_dir, "_checkpoint")


def write_exactly_once(
    stream_df: DataFrame,
    out_dir: str,
    name: str,
    checkpoint_dir: str | None = None,
):
    """Attach the idempotent epoch sink to a stream; returns the query.
    checkpointLocation is always set — see resolve_checkpoint."""
    sink = EpochJsonSink(out_dir)
    return (
        stream_df.writeStream.outputMode("append")
        .queryName(name)
        .option(
            "checkpointLocation", resolve_checkpoint(out_dir, checkpoint_dir)
        )
        .foreachBatch(sink)
        .start()
    )


class PartitionedEpochParquetSink:
    """foreachBatch → hive-partitioned parquet warehouse landing.

    Layout: ``{out}/epoch={id}/{col}={val}/part-*.parquet`` — epoch as
    the OUTER partition level keeps the per-epoch overwrite idempotent
    (a replayed epoch rewrites only its own directory; committed epochs
    are skipped via the ``_COMMITTED`` marker), while the inner
    partition columns give readers partition pruning:
    ``spark.read.parquet(out)`` discovers both levels, and a filter on
    the partition column prunes directories before any file is opened.

    This is the format-free shape of "streaming append to a partitioned
    transactional table": at 100 TB swap the directory-marker commit for
    a table-format transaction, keep the same foreachBatch body. A plain
    ``partitionBy(col).mode("append")`` inside foreachBatch would double
    rows on epoch replay — at-least-once, the reference's semantics
    (app.py:203-211); the epoch level is exactly what upgrades it.
    """

    def __init__(self, out_dir: str, partition_cols: list[str]) -> None:
        self.out_dir = out_dir
        self.partition_cols = partition_cols

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        target = os.path.join(self.out_dir, f"epoch={epoch_id}")
        if os.path.exists(os.path.join(target, "_COMMITTED")):
            return
        (
            batch_df.write.mode("overwrite")
            .partitionBy(*self.partition_cols)
            .parquet(target)
        )
        with open(os.path.join(target, "_COMMITTED"), "w") as fh:
            fh.write("ok\n")


def write_partitioned_exactly_once(
    stream_df: DataFrame,
    out_dir: str,
    name: str,
    partition_cols: list[str],
    checkpoint_dir: str | None = None,
):
    """Attach the partitioned epoch sink; returns the streaming query.
    checkpointLocation is always set — see resolve_checkpoint."""
    sink = PartitionedEpochParquetSink(out_dir, partition_cols)
    return (
        stream_df.writeStream.outputMode("append")
        .queryName(name)
        .option(
            "checkpointLocation", resolve_checkpoint(out_dir, checkpoint_dir)
        )
        .foreachBatch(sink)
        .start()
    )
