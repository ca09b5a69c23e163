"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual corpus lives in
``data_engineering_project_spotify_app_spark/operators/`` — every operator
from SURVEY.md §2 plus the LLM-pipeline extensions registers itself with
the registry; this module just exposes the registry to the driver.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_engineering_project_spotify_app_spark.operators import registry

registry.load_all_modules()

SF0001_DIR = "/root/testdata/sf0.001"


def _last_green_round() -> dict[str, int]:
    """Map query name -> the LAST round it passed the driver gate.

    The driver samples a prefix of ``queries()`` each round, so iteration
    order decides which operators get a fresh driver-verified correctness
    row. With every name cumulatively green, a boolean "seen" sort would
    freeze the sample on the first-50 registration-order prefix forever
    (VERDICT r10 #1). Sorting ascending by the most recent green round
    instead makes the window advance each round, so the whole registry
    re-cycles through the official gate (against the driver's real debris
    warehouse) every ~6 rounds. Never-green names sort first (round 0).
    """
    last: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        base = os.path.basename(path)
        try:
            rnd = int(base[len("CORRECTNESS_r"):-len(".json")])
        except ValueError:
            continue
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            # Count only rows that actually PASSED: either a full oracle
            # pass (all three checks true, no error) or the driver's
            # deliberate rows-only mode (err == "no_oracle" with rows
            # produced). A failed/errored row does not advance the name's
            # last-green round, so it re-enters the sample next round.
            passed = (
                row.get("err") is None
                and row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") is True
            )
            rows_only = (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if passed or rows_only:
                last[name] = max(last.get(name, 0), rnd)
    return last


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q3-style scan→join→agg→top-k — one DAG exercising filter
    pushdown, broadcast join, partial aggregation, and ordered limit.
    """
    return registry.QUERIES["q_tpch_q3"](spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Least-recently-green queries are ordered first (see _last_green_round)
    so the driver's per-round sample is a moving window over the full
    registry; ties (same last-green round) break by registration order.
    """
    last = _last_green_round()
    reg_pos = {n: i for i, n in enumerate(registry.QUERIES)}

    def key(n: str) -> tuple:
        return (last.get(n, 0), reg_pos[n])

    return {n: registry.QUERIES[n] for n in sorted(registry.QUERIES, key=key)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(registry.ORACLES)
