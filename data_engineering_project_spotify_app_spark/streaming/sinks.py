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


def write_exactly_once(stream_df: DataFrame, out_dir: str, name: str):
    """Attach the idempotent epoch sink to a stream; returns the query."""
    sink = EpochJsonSink(out_dir)
    return (
        stream_df.writeStream.outputMode("append")
        .queryName(name)
        .foreachBatch(sink)
        .start()
    )
