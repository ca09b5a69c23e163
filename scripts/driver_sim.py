#!/usr/bin/env python
"""Simulate the driver's correctness gate locally.

Runs the first N (default 50) entries of ``__spark_entry__.queries()``
— the exact prefix the driver samples — at sf0.01, comparing each
against its oracle via the same rows/schema/value comparison as
tests/oracle_harness.py. Prints one line per query and a final summary.

Usage: python scripts/driver_sim.py [N] [sf_dir] [--warehouse=DIR]

``--warehouse=DIR`` pins the managed-table warehouse to DIR instead of
the per-PID /tmp default — point it at a PRE-POPULATED warehouse (e.g.
a copy of ./spark-warehouse left by a previous driver run) to reproduce
the driver's fresh-catalog-over-stale-disk environment that redded 25
r09 rows (VERDICT r9 items 1–2).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

for _arg in [a for a in sys.argv[1:] if a.startswith("--warehouse=")]:
    os.environ["SPARK_GRAFT_WAREHOUSE"] = _arg.split("=", 1)[1]
    sys.argv.remove(_arg)

import __spark_entry__ as e  # noqa: E402
from data_engineering_project_spotify_app_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import compare  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    qs = e.queries()
    oracles = e.oracle_sql()
    names = list(qs)[:n]
    spark = get_spark(app_name="driver_sim")
    failures: list[tuple[str, str]] = []
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            if name in oracles:
                compare(spark, sf_dir, name, qs[name], oracles[name])
                status = "ok"
            else:
                cnt = qs[name](spark, sf_dir).count()
                status = f"rows_only({cnt})"
        except Exception as exc:  # noqa: BLE001
            status = "FAIL"
            failures.append((name, str(exc)[:500]))
        dt = time.perf_counter() - t0
        print(f"[{i + 1:3}/{n}] {name:36} {status:14} {dt:6.2f}s", flush=True)
    print(f"\n{len(names) - len(failures)}/{len(names)} green")
    for name, msg in failures:
        print(f"FAIL {name}: {msg}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
