"""Custom Python DataSource: keyed one-object-per-file staging as a table."""

from __future__ import annotations

import pytest

from data_engineering_project_spotify_app_spark.schemas import ARTISTS_SCHEMA
from data_engineering_project_spotify_app_spark.sources.ingest import (
    stage_entity_keyed,
)
from data_engineering_project_spotify_app_spark.sources.keyed_json_source import (
    _HAS_DATASOURCE_API,
    KeyedJsonDataSource,
)
from tests.spotify_fixtures import artist

pytestmark = pytest.mark.skipif(
    not _HAS_DATASOURCE_API, reason="Spark 4 Python Data Source API required"
)


def test_roundtrip_through_custom_source(spark, tmp_path):
    rows = [artist(i) for i in range(25)]
    df = spark.createDataFrame(rows, schema=ARTISTS_SCHEMA)
    out = stage_entity_keyed(df, str(tmp_path / "stage"), "artists")

    spark.dataSource.register(KeyedJsonDataSource)
    back = (
        spark.read.format("keyed_json")
        .schema(ARTISTS_SCHEMA)
        .option("path", out)
        .option("filesPerPartition", "10")
        .load()
    )
    assert back.rdd.getNumPartitions() == 3  # 25 files / 10 per batch
    got = sorted(r["id"] for r in back.select("id").collect())
    assert got == sorted(r["id"] for r in rows)
    # nested fields survive the custom reader
    one = back.filter(back.id == "ar003").first()
    assert one["followers"]["total"] == 3000
    assert one["images"][0]["url"].endswith("ar003")


def test_empty_staging_dir_yields_empty_frame(spark, tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    spark.dataSource.register(KeyedJsonDataSource)
    back = (
        spark.read.format("keyed_json")
        .schema(ARTISTS_SCHEMA)
        .option("path", str(d))
        .load()
    )
    assert back.count() == 0
