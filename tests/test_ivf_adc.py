"""IVF-ADC composition invariants (oracle parity runs separately).

The composed index must agree with both parents:
- its candidate universe is the IVF probe set, so every reported
  neighbor also appears among the IVF candidate lists;
- its distances are PQ's ADC distances, so on any (query, neighbor)
  pair both operators report, the adc_d2 values are identical.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.operators import ivf_adc, pq
from data_engineering_project_spotify_app_spark.operators.ivf import (
    NPROBE,
    N_CENTROIDS,
)
from tests.conftest import SF_SMOKE


def test_results_exist_and_ranked(spark):
    rows = ivf_adc.q_ann_ivf_adc(spark, SF_SMOKE).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rnks = sorted(r.rnk for r in rs)
        assert rnks == list(range(1, len(rs) + 1)), q
        ordered = sorted(rs, key=lambda r: r.rnk)
        assert all(
            a.adc_d2 <= b.adc_d2 for a, b in zip(ordered, ordered[1:])
        ), q


def test_distances_match_full_adc(spark):
    """Shared (query, neighbor) pairs carry identical ADC distances."""
    full = {
        (r.query_id, r.neighbor_id): r.adc_d2
        for r in pq.q_pq_adc_topk(spark, SF_SMOKE).collect()
    }
    probed = ivf_adc.q_ann_ivf_adc(spark, SF_SMOKE).collect()
    shared = [
        r for r in probed if (r.query_id, r.neighbor_id) in full
    ]
    assert shared, "probe set should overlap the exact ADC top-k"
    for r in shared:
        assert r.adc_d2 == full[(r.query_id, r.neighbor_id)]


def test_neighbors_come_from_probed_lists(spark):
    """Every reported neighbor sits in one of its query's probed lists."""
    from data_engineering_project_spotify_app_spark.operators.ivf import (
        _norm_frame,
    )
    from pyspark.sql.window import Window

    n = _norm_frame(spark, SF_SMOKE)
    from data_engineering_project_spotify_app_spark.operators.similarity import dot

    cent = n.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("ccid"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    csim = F.round(
        dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm")), 4
    )
    ranked = (
        n.crossJoin(F.broadcast(cent))
        .select("vec_id", "ccid", csim.alias("csim"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.col("csim").desc(), "ccid"
                )
            ),
        )
    )
    assign = {
        r.vec_id: r.ccid
        for r in ranked.filter(F.col("rn") == 1).collect()
    }
    probes: dict[int, set] = {}
    for r in ranked.filter(F.col("rn") <= NPROBE).collect():
        probes.setdefault(r.vec_id, set()).add(r.ccid)
    for r in ivf_adc.q_ann_ivf_adc(spark, SF_SMOKE).collect():
        assert assign[r.neighbor_id] in probes[r.query_id], r
