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

# THE rows-only carve-out list: every registered query WITHOUT a DuckDB
# oracle, with the reason it is genuinely non-oracle-able and where its
# correctness evidence lives instead. A query may ship rows-only ONLY by
# being added here — tests/test_registry_carveouts.py fails the suite on
# any unlisted (or stale) entry, so the set cannot silently grow.
ROWS_ONLY_CARVEOUTS: dict[str, str] = {
    "q_bpe_train": (
        "iterative greedy merge training — each merge depends on the "
        "previous round's corpus rewrite, not SQL-expressible; pinned "
        "against a sequential pure-Python BPE + hypothesis corpora in "
        "tests/test_bpe.py"
    ),
    "q_bpe_encode": (
        "applies the trained (engine-specific) merge table; pinned "
        "against the sequential encoder in tests/test_bpe.py"
    ),
    "q_bpe_encode_arrow": (
        "same semantics as q_bpe_encode via the Arrow batch path; "
        "equivalence with q_bpe_encode pinned in tests/test_bpe.py"
    ),
    "q_approx_distinct": (
        "HyperLogLog++ sketch — estimate is engine-specific by design; "
        "error bound vs exact count_distinct pinned in "
        "tests/test_sketches.py"
    ),
    "q_approx_quantile": (
        "Greenwald-Khanna sketch — rank-error guarantee, not a unique "
        "value; bound vs exact percentiles pinned in "
        "tests/test_sketches.py"
    ),
    "q_ann_ivf_kmeans": (
        "k-means|| centroid initialization is engine-specific, so the "
        "probed lists differ from any SQL twin; recall >= 0.6 vs brute "
        "force pinned in tests/test_ivf.py"
    ),
}


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
        diagnostics,
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
