"""Differentially-private aggregate release: contribution capping +
calibrated Laplace noise, deterministic for oracle parity.

The shape every privacy-preserving analytics export uses (Dwork et al.,
TCC'06): bound each user's contribution to at most C rows (the
sensitivity cap — without it one hyperactive user makes the released
count arbitrarily sensitive), then add Laplace(C/ε) noise to the capped
aggregate. At 100 TB the cap is ALSO the skew guard: the per-(user,
type) pre-aggregate is partial-aggregated map-side, and no user can
contribute more than C to any released cell.

Determinism discipline: real DP draws fresh noise per release; a
registry query must be reproducible across engines and runs, so the
Laplace draw derives from the released cell's md5 via the same
instr/substr hex→int uniform as the MinHash family (dedup.py:275) and
the Efraimidis–Spirakis sampler (dataset.py) — identical expression
text evaluates in Spark SQL and DuckDB. Swap `_uniform_sql` for a real
RNG in production release jobs.

The released table would carry ONLY the noisy column; `n_capped` is
emitted here so the correctness gate can check the capping stage too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.operators.dedup import (
    _hex2int_sql,
)
from data_engineering_project_spotify_app_spark.operators.registry import query
from data_engineering_project_spotify_app_spark.tables import table

CONTRIB_CAP = 5  # C: max events one user contributes to one cell
EPSILON = 1.0


def _laplace_sql() -> str:
    """Deterministic Laplace(C/ε) draw from md5(event_type): inverse-CDF
    of u ∈ (0,1), F⁻¹(u) = −b·sign(u−0.5)·ln(1−2|u−0.5|), b = C/ε."""
    u = (
        f"(({_hex2int_sql('md5(event_type)', 1)} + 1.0) / 4294967297.0)"
    )
    b = CONTRIB_CAP / EPSILON
    return (
        f"(-{b} * sign({u} - 0.5) * ln(1.0 - 2.0 * abs({u} - 0.5)))"
    )


_DP_ORACLE = f"""
    WITH per_user AS (
      SELECT user_id, event_type, least(count(*), {CONTRIB_CAP}) AS c
      FROM events GROUP BY 1, 2
    ),
    capped AS (
      SELECT event_type, sum(c) AS n_capped FROM per_user GROUP BY 1
    )
    SELECT event_type,
           CAST(n_capped AS BIGINT) AS n_capped,
           round(n_capped + {_laplace_sql()}, 4) AS noisy_n,
           CAST({EPSILON} AS DOUBLE) AS epsilon
    FROM capped
    """


@query("q_dp_release", oracle=_DP_ORACLE)
def q_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP event-count release per event type: per-user contribution
    capped at C={CONTRIB_CAP}, Laplace(C/ε) noise at ε={EPSILON}.

    Scale: the (user, type) pre-agg is the only data-sized shuffle and
    partial-aggregates map-side; the capped re-agg is |types|-sized.
    """
    e = table(spark, sf_dir, "events").select("user_id", "event_type")
    per_user = e.groupBy("user_id", "event_type").agg(
        F.least(F.count("*"), F.lit(CONTRIB_CAP)).alias("c")
    )
    capped = per_user.groupBy("event_type").agg(
        F.sum("c").alias("n_capped")
    )
    return capped.select(
        "event_type",
        F.col("n_capped").cast("bigint").alias("n_capped"),
        F.round(
            F.col("n_capped") + F.expr(_laplace_sql()), 4
        ).alias("noisy_n"),
        F.lit(float(EPSILON)).alias("epsilon"),
    )


K_ANON = 5


_KANON_ORACLE = f"""
    WITH qi AS (
      SELECT n_name AS nation, c_mktsegment AS segment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             count(*) AS n
      FROM customer
      JOIN nation ON n_nationkey = c_nationkey
      GROUP BY 1, 2, 3
    )
    SELECT nation, segment, bal_band, CAST(n AS BIGINT) AS group_size
    FROM qi WHERE n < {K_ANON}
    """


@query("q_k_anonymity", oracle=_KANON_ORACLE)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of a quasi-identifier combination (nation ×
    market segment × $1000 balance band): every QI group smaller than
    k={K_ANON} — the rows a release of "anonymized" customer data
    would leave re-identifiable, and the generalization loop's input
    (widen bands / suppress until this report is empty). Sweeney's
    classic audit as one hash aggregate.

    Scale: one partial-aggregated groupBy on the QI tuple; the nation
    dim broadcasts. Output is bounded by the QI-space size, not the
    table.
    """
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    qi = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias(
                "bal_band"
            ),
        )
        .agg(F.count("*").alias("group_size"))
    )
    return qi.filter(F.col("group_size") < K_ANON)
