"""Streaming incremental MinHash-LSH dedup: the streaming twin of
``q_incremental_dedup`` (operators/dedup.py), built the way
streaming/rollup.py maintains rollups.

Each micro-batch of newly-ingested documents is shingled/min-hashed
ONCE, its LSH bands are matched against the at-rest band store
(new × store) and against themselves (the new-new triangle), the
resulting candidate pairs are appended to a per-epoch pairs log, and
the batch's bands are APPENDED to the store as a per-epoch delta.
Store-vs-store pairs are never generated — per-bucket work is
O(|new| × |bucket|), the delta-only shape that makes a 1% daily ingest
against a 100 TB corpus a nightly job instead of a full re-dedup.

The store is an append-only delta chain, NOT a rewritten snapshot:
epoch N writes only its own O(|delta|) bands (contrast rollup.py,
whose state is O(#groups) and cheap to rewrite — the band store is
O(corpus), and rewriting it per epoch would cost O(corpus) per day and
quadratic cumulative). compact() folds committed deltas into a base so
the union read stays a bounded file count — the same job a
transactional table's compaction runs at 100 TB.

Exactly-once falls out of the commit-marker contract shared with
IncrementalRollupSink: pairs log and band delta each carry a
``_COMMITTED`` marker keyed by epoch id (pairs marked FIRST, so a
committed delta implies durable pairs — what makes compacting
committed deltas replay-safe); a replayed epoch sees its markers and
skips, a half-finished epoch left no marker and the retry overwrites
the same path. The union of all committed pairs logs equals the batch
``q_minhash_lsh`` pair set exactly — every (doc_a, doc_b) pair is
emitted in precisely the epoch its LATER member arrives (equivalence
pinned across micro-batch splits in tests/test_streaming_dedup.py).
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
        # Occupancy is counted ONLY over buckets the delta touches — a
        # bucket without a new member generates no pairs this epoch, so
        # counting it is wasted work, and counting the WHOLE store per
        # epoch would be O(store)/epoch (the same quadratic-cumulative
        # shape the delta-chain store write avoids). The semi-join keys
        # are the delta's distinct band keys, broadcast; on a store
        # table bucketed by band_key this probe prunes to the touched
        # buckets.
        new_keys = bands_new.select("band", "band_key").distinct()
        occupancy = bands_new.select("band", "band_key")
        if bands_store is not None:
            occupancy = occupancy.unionByName(
                bands_store.join(
                    F.broadcast(new_keys), ["band", "band_key"], "leftsemi"
                ).select("band", "band_key")
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

    # ---- store layout: APPEND-ONLY DELTA CHAIN -----------------------
    # bands_e{N}  = epoch N's bands only (the delta). The store as of
    #               epoch E is the union of base + every committed delta
    #               < E, so the per-epoch WRITE cost is O(|delta|) — a
    #               full-store rewrite per epoch would be O(corpus) and
    #               quadratic cumulative, the one shape a daily-ingest
    #               store must never have.
    # base_v{B}   = compacted base holding every band of epochs <= B.
    #               compact() folds deltas into a new base so the union
    #               read stays a bounded file count; at 100 TB this is
    #               the transactional table's compaction job.
    # Marker order inside an epoch: pairs FIRST, then the delta — so a
    # committed delta implies its pairs are durable, which is what makes
    # compaction (which consumes committed deltas) replay-safe.

    def _delta_dir(self, epoch_id: int) -> str:
        return os.path.join(self.out_dir, f"bands_e{epoch_id}")

    def _base_dir(self, version: int) -> str:
        return os.path.join(self.out_dir, f"base_v{version}")

    def _pairs_dir(self, epoch_id: int) -> str:
        return os.path.join(self.out_dir, f"pairs_e{epoch_id}")

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

    def committed_band_versions(self) -> list[int]:
        """Committed delta epochs (excludes deltas already folded into
        the base — they are superseded, and ignored even if a crashed
        compaction left their directories behind)."""
        base = self._base_epoch()
        return [
            v
            for v in self._committed_ids("bands_e")
            if base is None or v > base
        ]

    def _base_epoch(self) -> int | None:
        bases = self._committed_ids("base_v")
        return bases[-1] if bases else None

    def committed_pair_epochs(self) -> list[int]:
        return self._committed_ids("pairs_e")

    def _store_paths(self, before_epoch: int | None = None) -> list[str]:
        base = self._base_epoch()
        paths = []
        if base is not None:
            if before_epoch is not None and base >= before_epoch:
                raise ValueError(
                    f"store as of epoch {before_epoch} is not "
                    f"reconstructible: base_v{base} already folded it in "
                    "(pair-retry of a compacted epoch — compact only "
                    "epochs whose pair logs are durable)"
                )
            paths.append(self._base_dir(base))
        paths += [
            self._delta_dir(v)
            for v in self.committed_band_versions()
            if before_epoch is None or v < before_epoch
        ]
        return paths

    def current_bands(self) -> DataFrame | None:
        paths = self._store_paths()
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def pairs(self) -> DataFrame | None:
        """Union of every committed per-epoch pairs log — the streamed
        equivalent of the batch q_minhash_lsh result."""
        epochs = self.committed_pair_epochs()
        if not epochs:
            return None
        return self.spark.read.parquet(
            *[self._pairs_dir(e) for e in epochs]
        )

    def compact(self) -> list[int]:
        """Fold every committed delta into a new base snapshot — the
        streaming-store twin of the staging TTL / compaction ladder
        (sources/ingest.py). Pair logs are never touched (they are the
        output facts). Crash-safe: the new base commits before any
        source directory is deleted, and readers ignore deltas <= the
        base epoch, so a half-swept compaction leaves only harmless
        garbage for the next sweep. Returns the folded delta epochs."""
        import shutil

        old_base = self._base_epoch()
        deltas = self.committed_band_versions()
        if not deltas:
            return []
        target = max(deltas)
        merged = self.current_bands()
        merged.write.mode("overwrite").parquet(self._base_dir(target))
        self._mark(self._base_dir(target))
        for v in deltas:
            shutil.rmtree(self._delta_dir(v), ignore_errors=True)
        if old_base is not None:
            shutil.rmtree(self._base_dir(old_base), ignore_errors=True)
        return deltas

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        pairs_dir = self._pairs_dir(epoch_id)
        delta_dir = self._delta_dir(epoch_id)
        base = self._base_epoch()
        delta_done = self._committed(delta_dir) or (
            base is not None and base >= epoch_id
        )
        if self._committed(pairs_dir) and delta_done:
            return  # replayed epoch: both outputs durable
        # Shingle + minhash the batch ONCE: the delta parquet is the
        # materialization both consumers (pair generation and the store
        # chain) read, so the signature aggregation never runs twice.
        if self._committed(delta_dir):
            bands_new = self.spark.read.parquet(delta_dir)
        else:
            bands_new = lsh_bands_df(minhash_signatures_df(batch_df))
            bands_new.write.mode("overwrite").parquet(delta_dir)
            bands_new = self.spark.read.parquet(delta_dir)
        if not self._committed(pairs_dir):
            store_paths = self._store_paths(before_epoch=epoch_id)
            store = (
                self.spark.read.parquet(*store_paths)
                if store_paths
                else None
            )
            delta_candidate_pairs(
                bands_new, store, bucket_cap=self.bucket_cap
            ).write.mode("overwrite").parquet(pairs_dir)
            self._mark(pairs_dir)
        if not delta_done:
            self._mark(delta_dir)


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
