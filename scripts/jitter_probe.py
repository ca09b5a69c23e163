#!/usr/bin/env python
"""Isolated min-of-N re-timer for registered queries (VERDICT r10
item 3 / r11 item 2: settle per-query jitter questions with data).

Usage: python scripts/jitter_probe.py [q_a,q_b,...] [n_runs] [sf_dir]
Prints one JSON line per query (all run times + min/median) after the
standard warm-up (sf0.001 pass) and with the bench loop's housekeeping
(gc + clearCache between runs), so the numbers are comparable to
BENCH_QUERIES.json — plus a final line with the SAME SESSION's canary
sum (bench.CANARY, min-of-2), the box-speed anchor that makes probes
from different sessions comparable (VERDICT r11 item 1/2).
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

from bench import CANARY  # noqa: E402
from data_engineering_project_spotify_app_spark.operators import registry  # noqa: E402
from data_engineering_project_spotify_app_spark.session import get_spark  # noqa: E402


def _probe(spark, name: str, n: int, sf_dir: str) -> dict:
    fn = registry.QUERIES[name]
    fn(spark, "/root/testdata/sf0.001").count()  # warm codegen/JIT
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        times.append(round(time.perf_counter() - t0, 3))
        gc.collect()
        spark.catalog.clearCache()
    return {
        "query": name,
        "sf_dir": sf_dir,
        "times": times,
        "min": min(times),
        "median": statistics.median(times),
        "max": max(times),
    }


def main() -> None:
    names = (
        sys.argv[1] if len(sys.argv) > 1 else "q_dedup_clusters"
    ).split(",")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    registry.load_all_modules()
    spark = get_spark(app_name="jitter_probe")
    for name in names:
        print(json.dumps(_probe(spark, name, n, sf_dir),
                         separators=(",", ":")))
    canary = {
        c: _probe(spark, c, 2, sf_dir)["min"] for c in CANARY
    }
    print(
        json.dumps(
            {
                "canary": canary,
                "canary_sec": round(sum(canary.values()), 3),
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
