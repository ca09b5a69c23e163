"""Shared at-rest landings (edges, baskets, minhash/simhash/bigram
frames): derive-once correctness contracts.

The landing memos are process-local ON PURPOSE: a managed table left by
a previous process may be stale against regenerated testdata, so the
first consumer in each process must re-land (mode=overwrite) rather
than trust the catalog. These tests pin that contract and the
landed == derived equivalence.
"""

from __future__ import annotations

from data_engineering_project_spotify_app_spark.operators import dedup, graphs


def test_landed_edges_equal_derived(spark, sf_dir):
    landed = {
        tuple(r)
        for r in graphs.landed_copurchase_edges(spark, sf_dir).collect()
    }
    derived = {
        tuple(r) for r in graphs.copurchase_edges(spark, sf_dir).collect()
    }
    assert landed == derived and landed


def test_landing_overwrites_stale_cross_process_table(spark, sf_dir):
    """A table left by a PREVIOUS process (memo empty) must be re-landed
    on first use, not trusted — regenerated testdata would otherwise be
    silently served from the stale catalog entry."""
    from data_engineering_project_spotify_app_spark.sources import bucketed

    want = sorted(
        tuple(r)
        for r in graphs.landed_copurchase_edges(spark, sf_dir).collect()
    )
    name = bucketed._LANDED[("copurchase_edges", sf_dir)]
    # simulate the stale leftover: same table name, junk contents
    spark.createDataFrame([(999999, 999998)], "src long, dst long").write.mode(
        "overwrite"
    ).format("parquet").saveAsTable(name)
    bucketed.invalidate_landings(sf_dir)  # "new process": memo empty
    got = sorted(
        tuple(r)
        for r in graphs.landed_copurchase_edges(spark, sf_dir).collect()
    )
    assert got == want


def test_landed_signatures_equal_derived(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.tables import table

    landed = sorted(
        tuple(r) for r in dedup._minhash_signatures(spark, sf_dir).collect()
    )
    derived = sorted(
        tuple(r)
        for r in dedup.minhash_signatures_df(
            table(spark, sf_dir, "documents").select("doc_id", "text")
        ).collect()
    )
    assert landed == derived and landed
