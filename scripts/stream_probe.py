#!/usr/bin/env python
"""Streaming-store scale probe: does per-epoch cost stay FLAT as the
at-rest store grows?

Feeds N equal-size micro-batches (disjoint key-offset copies of the
sf documents fixture) through StreamingLshDedupSink and records each
epoch's wall time. With the append-only delta-chain store the per-epoch
cost is O(|delta| + touched-bucket probes) — the tail epochs should
cost about the same as the early ones even though the store holds N×
the bands. A full-store-rewrite design (the bug this probe guards
against) would show epoch cost growing ~linearly with epoch index,
i.e. last/first ratio ≈ N.

Usage: python scripts/stream_probe.py [n_epochs] [sf_dir] [sink]
``sink`` selects the maintainer: ``lsh`` (default), ``winnow``
(StreamingWinnowSink — same delta-only law, fingerprint store), or
``winnow_word`` (the word-gram granularity via fingerprints_fn).
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_project_spotify_app_spark.session import (  # noqa: E402
    get_spark,
)
from data_engineering_project_spotify_app_spark.streaming.dedup_stream import (  # noqa: E402
    StreamingLshDedupSink,
)
from data_engineering_project_spotify_app_spark.streaming.winnow_stream import (  # noqa: E402
    StreamingWinnowSink,
)
from data_engineering_project_spotify_app_spark.tables import (  # noqa: E402
    table_parallel,
)


def main() -> None:
    # head window is epochs 1-2, tail the last two: need >= 5 epochs for
    # the windows to be disjoint and each a real 2-sample average
    n_epochs = max(5, int(sys.argv[1]) if len(sys.argv) > 1 else 8)
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    which = sys.argv[3] if len(sys.argv) > 3 else "lsh"
    spark = get_spark(app_name="stream_probe")
    docs = table_parallel(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )

    def make(d):
        if which == "winnow":
            # cap matches the batch report's stop-fingerprint cull
            return StreamingWinnowSink(spark, d, df_cap=64)
        if which == "winnow_word":
            from data_engineering_project_spotify_app_spark.operators.dedup import (
                winnow_word_fingerprints_df,
            )

            return StreamingWinnowSink(
                spark,
                d,
                df_cap=64,
                fingerprints_fn=winnow_word_fingerprints_df,
            )
        return StreamingLshDedupSink(spark, d, bucket_cap=64)

    # one warm epoch on a throwaway store amortizes JVM/codegen cost
    with tempfile.TemporaryDirectory() as d:
        make(d)(docs, 0)
    off = 10_000_000
    with tempfile.TemporaryDirectory() as d:
        sink = make(d)
        times = []
        for e in range(n_epochs):
            batch = docs.withColumn(
                "doc_id", F.col("doc_id") + F.lit(off * e)
            )
            t0 = time.perf_counter()
            sink(batch, e)
            times.append(round(time.perf_counter() - t0, 2))
        store_df = (
            sink.current_fingerprints()
            if which.startswith("winnow")
            else sink.current_bands()
        )
        total_bands = store_df.count()
        n_pairs = sink.pairs().count()
    print(f"epochs: {times}")
    head = sum(times[1:3]) / 2
    tail = sum(times[-2:]) / 2
    print(
        f"store bands at end: {total_bands}  pairs: {n_pairs}\n"
        f"head avg (e1-2) {head:.2f}s  tail avg (e{n_epochs-2}-"
        f"{n_epochs-1}) {tail:.2f}s  tail/head {tail / head:.2f} "
        f"(flat ≈ 1; full-rewrite design would be ≈ {n_epochs})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
