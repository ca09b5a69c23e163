"""Query registry — the driver-facing catalog of implemented operators.

Every operator from SURVEY.md §2 (plus the LLM-pipeline extensions) is a
named query: a PySpark callable ``(spark, sf_dir) -> DataFrame`` and,
where ANSI SQL can express the same semantics, a DuckDB oracle string.
The driver runs both at sf0.01 and compares row-count + schema +
order-insensitive value-hash (CORRECTNESS_r{N}.json), so:

- every computed column is aliased identically in Spark and SQL;
- double aggregates are rounded on BOTH sides (cross-engine summation
  order differs in the last ulp);
- DuckDB integer sums are cast to BIGINT (DuckDB widens to HUGEINT,
  Spark keeps bigint);
- LIMIT/top-k queries carry deterministic tie-breaks.

Queries with no oracle entry (approximate sketches, ML-backed LSH,
multimodal stubs) get the driver's weaker rows-only check and a pytest
asserting their semantics against an exact twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a driver query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_modules() -> None:
    """Import every operator module so registration side-effects run."""
    from data_engineering_project_spotify_app_spark.operators import (  # noqa: F401
        affinity,
        bpe,
        clusters,
        core,
        curation,
        dataset,
        entity,
        dedup,
        extras,
        funnel,
        graphs,
        incremental,
        ivf,
        ivf_adc,
        linedup,
        mlops,
        moments,
        pq,
        privacy,
        quality,
        regress,
        scale_ops,
        search,
        similarity,
        textops,
        multimodal,
        tpch,
        windows,
    )
