#!/usr/bin/env python
"""Isolated min-of-N re-timer for a single registered query (VERDICT
r10 item 3: settle the q_dedup_clusters jitter question with data).

Usage: python scripts/jitter_probe.py [query_name] [n_runs] [sf_dir]
Prints one line: all run times + min/median, after the standard warm-up
(sf0.001 pass) and with the bench loop's housekeeping (gc + clearCache
between runs) so the numbers are comparable to BENCH_QUERIES.json.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from data_engineering_project_spotify_app_spark.operators import registry  # noqa: E402
from data_engineering_project_spotify_app_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "q_dedup_clusters"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    registry.load_all_modules()
    spark = get_spark(app_name=f"jitter_{name}")
    fn = registry.QUERIES[name]
    fn(spark, "/root/testdata/sf0.001").count()  # warm codegen/JIT
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        times.append(round(time.perf_counter() - t0, 3))
        gc.collect()
        spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "query": name,
                "sf_dir": sf_dir,
                "times": times,
                "min": min(times),
                "median": statistics.median(times),
                "max": max(times),
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
