"""Streaming incremental MinHash-LSH dedup: the streaming twin of
``q_incremental_dedup`` (operators/dedup.py), built the way
streaming/rollup.py maintains rollups.

Each micro-batch of newly-ingested documents is shingled/min-hashed
ONCE, its LSH bands are matched against the at-rest band store
(new × store) and against themselves (the new-new triangle), the
resulting candidate pairs are appended to a per-epoch pairs log, and
the store is advanced to a new snapshot version containing the batch's
bands. Store-vs-store pairs are never generated — per-bucket work is
O(|new| × |bucket|), the delta-only shape that makes a 1% daily ingest
against a 100 TB corpus a nightly job instead of a full re-dedup.

Exactly-once falls out of the same version-chain contract as
IncrementalRollupSink: pairs log and store snapshot each carry a
``_COMMITTED`` marker keyed by epoch id; a replayed epoch sees its
markers and skips, a half-finished epoch left no marker and the retry
overwrites the same path. The union of all committed pairs logs equals
the batch ``q_minhash_lsh`` pair set exactly — every (doc_a, doc_b)
pair is emitted in precisely the epoch its LATER member arrives
(equivalence pinned across micro-batch splits in
tests/test_streaming_dedup.py).

At 100 TB the band store is a transactional table bucketed by
(band, band_key) — the snapshot chain here is the format-free stand-in
(same trade as rollup.py); the store grows by O(|delta| × N_BANDS)
rows per epoch and is never rescanned beyond the bucket join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.operators.dedup import (
    lsh_bands_df,
    minhash_signatures_df,
)

DOC_SCHEMA = "doc_id long, text string"


def stream_documents(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """NDJSON document file stream (doc_id, text) — one dropped file per
    micro-batch at the default trigger setting, mirroring
    stream_ops.stream_events."""
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(src_dir)
    )


def delta_candidate_pairs(
    bands_new: DataFrame,
    bands_store: DataFrame | None,
    bucket_cap: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, n_bands_matched) pairs touching the delta: the
    new-new triangle (bucket-collect inside the batch's bands) plus
    new × store bucket matches. The delta side is the small one by
    construction — it is broadcast into the store join, so the store
    is probed in place and never shuffled.

    ``bucket_cap`` is the streaming form of the batch skew guard
    (q_minhash_lsh_capped): an uninformative band key accumulates
    members in the STORE forever, so by epoch N a degenerate bucket
    pairs every new doc against an unbounded store-side posting list —
    the one place the delta-only cost model O(|new| × |bucket|) can
    silently degrade toward O(|new| × |corpus|). The cap drops band
    keys whose TOTAL occupancy (store + batch) exceeds it, on both the
    triangle and the cross join, before any pair is generated; the cap
    frame is tiny (distinct over-full keys only) and broadcast."""
    capped_new = bands_new
    capped_store = bands_store
    if bucket_cap is not None:
        occupancy = bands_new.select("band", "band_key")
        if bands_store is not None:
            occupancy = occupancy.unionByName(
                bands_store.select("band", "band_key")
            )
        overfull = (
            occupancy.groupBy("band", "band_key")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > bucket_cap)
            .select("band", "band_key")
        )
        capped_new = bands_new.join(
            F.broadcast(overfull), ["band", "band_key"], "left_anti"
        )
        if bands_store is not None:
            capped_store = bands_store.join(
                F.broadcast(overfull), ["band", "band_key"], "left_anti"
            )
    triangle = (
        capped_new.groupBy("band", "band_key")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), "
                    "y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("pr")
        )
        .select("pr.doc_a", "pr.doc_b")
    )
    matches = triangle
    if capped_store is not None:
        new = capped_new.select(
            "band", "band_key", F.col("doc_id").alias("new_id")
        )
        cross = (
            capped_store.join(F.broadcast(new), ["band", "band_key"])
            .filter(F.col("doc_id") != F.col("new_id"))
            .select(
                F.least("doc_id", "new_id").alias("doc_a"),
                F.greatest("doc_id", "new_id").alias("doc_b"),
            )
        )
        matches = matches.unionByName(cross)
    return matches.groupBy("doc_a", "doc_b").agg(
        F.count("*").alias("n_bands_matched")
    )


class StreamingLshDedupSink:
    """foreachBatch maintainer of the LSH band store + pairs log.

    ``bucket_cap``, when set, applies the streaming skew guard at every
    epoch (see delta_candidate_pairs). Streaming cap semantics are
    necessarily PREFIX semantics: occupancy is judged as of the current
    epoch, so a bucket that crosses the cap at epoch N stops producing
    pairs from N on, but its pre-N pairs were already durably emitted —
    unlike the batch q_minhash_lsh_capped, which judges final occupancy.
    That is the right trade for an append-only log (emitted pairs are
    facts; retracting them would make the log non-monotone), and the
    batch/streaming difference vanishes for buckets that never cross
    the cap (pinned in tests/test_streaming_dedup.py)."""

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        bucket_cap: int | None = None,
    ) -> None:
        self.spark = spark
        self.out_dir = out_dir
        self.bucket_cap = bucket_cap

    def _bands_dir(self, epoch_id: int) -> str:
        return os.path.join(self.out_dir, f"bands_v{epoch_id}")

    def _pairs_dir(self, epoch_id: int) -> str:
        return os.path.join(self.out_dir, f"pairs_e{epoch_id}")

    def _committed(self, path: str) -> bool:
        return os.path.exists(os.path.join(path, "_COMMITTED"))

    def _mark(self, path: str) -> None:
        with open(os.path.join(path, "_COMMITTED"), "w") as fh:
            fh.write("ok\n")

    def committed_band_versions(self) -> list[int]:
        if not os.path.isdir(self.out_dir):
            return []
        return sorted(
            int(n[len("bands_v"):])
            for n in os.listdir(self.out_dir)
            if n.startswith("bands_v") and self._committed(
                os.path.join(self.out_dir, n)
            )
        )

    def committed_pair_epochs(self) -> list[int]:
        if not os.path.isdir(self.out_dir):
            return []
        return sorted(
            int(n[len("pairs_e"):])
            for n in os.listdir(self.out_dir)
            if n.startswith("pairs_e") and self._committed(
                os.path.join(self.out_dir, n)
            )
        )

    def compact(self, retain_last: int = 1) -> list[int]:
        """Retire superseded band-store snapshots, keeping the newest
        ``retain_last`` committed versions — the streaming-store twin of
        the staging TTL / compaction ladder (sources/ingest.py). Pair
        logs are never touched (they are the output facts); only store
        snapshots are redundant, because each version fully contains
        every prior one. Returns the deleted version ids. Safe against
        a concurrent replay: a replayed epoch whose snapshot was
        compacted away still skips pair re-emission via the pairs
        marker, and its store write is reconstructed from the latest
        surviving snapshot (which already contains those bands)."""
        import shutil

        keep = self.committed_band_versions()[-max(1, retain_last):]
        dropped = []
        for v in self.committed_band_versions():
            if v not in keep:
                shutil.rmtree(self._bands_dir(v), ignore_errors=True)
                dropped.append(v)
        return dropped

    def current_bands(self) -> DataFrame | None:
        versions = self.committed_band_versions()
        if not versions:
            return None
        return self.spark.read.parquet(self._bands_dir(versions[-1]))

    def pairs(self) -> DataFrame | None:
        """Union of every committed per-epoch pairs log — the streamed
        equivalent of the batch q_minhash_lsh result."""
        epochs = self.committed_pair_epochs()
        if not epochs:
            return None
        return self.spark.read.parquet(
            *[self._pairs_dir(e) for e in epochs]
        )

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        pairs_dir = self._pairs_dir(epoch_id)
        bands_dir = self._bands_dir(epoch_id)
        if self._committed(pairs_dir) and self._committed(bands_dir):
            return  # replayed epoch: both outputs durable
        # Shingle + minhash the batch ONCE; both consumers (pair gen and
        # the store append) read the materialized bands, so the signature
        # aggregation never runs twice. localCheckpoint would also work,
        # but the store write IS a materialization — reuse it.
        store = None
        prior = [v for v in self.committed_band_versions() if v < epoch_id]
        if prior:
            store = self.spark.read.parquet(self._bands_dir(prior[-1]))
        if not self._committed(bands_dir):
            bands_new = lsh_bands_df(minhash_signatures_df(batch_df))
            staged = os.path.join(self.out_dir, f"staged_e{epoch_id}")
            bands_new.write.mode("overwrite").parquet(staged)
            bands_new = self.spark.read.parquet(staged)
        else:
            # pairs retry after a committed store write: the batch's own
            # bands are the tail the committed snapshot added on top of
            # the prior version — recompute them from the batch instead
            # of diffing snapshots (cheap, and the diff would anti-join)
            bands_new = lsh_bands_df(minhash_signatures_df(batch_df))
        if not self._committed(pairs_dir):
            delta_candidate_pairs(
                bands_new, store, bucket_cap=self.bucket_cap
            ).write.mode("overwrite").parquet(pairs_dir)
            self._mark(pairs_dir)
        later = [v for v in self.committed_band_versions() if v > epoch_id]
        if not self._committed(bands_dir) and not later:
            # skip when a LATER snapshot exists (each version fully
            # contains every prior one, so this epoch's bands are
            # already durable there) — without this, a replay of an
            # epoch whose snapshot was compact()ed away would write a
            # bogus partial snapshot built from an empty prior chain
            new_store = (
                store.unionByName(bands_new) if store is not None else bands_new
            )
            new_store.write.mode("overwrite").parquet(bands_dir)
            self._mark(bands_dir)
        staged = os.path.join(self.out_dir, f"staged_e{epoch_id}")
        if os.path.isdir(staged):
            import shutil

            shutil.rmtree(staged, ignore_errors=True)


def maintain_lsh_store(
    spark: SparkSession,
    stream_df: DataFrame,
    out_dir: str,
    name: str,
    bucket_cap: int | None = None,
):
    """Attach the streaming dedup maintainer to a document stream;
    returns (query, sink) so callers read ``sink.pairs()`` /
    ``sink.current_bands()``."""
    sink = StreamingLshDedupSink(spark, out_dir, bucket_cap=bucket_cap)
    q = (
        stream_df.writeStream.outputMode("append")
        .queryName(name)
        .foreachBatch(sink)
        .start()
    )
    return q, sink
