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


def test_writer_produces_exact_keyed_layout(spark, tmp_path):
    """df.write.format('keyed_json') must land one {id}.json per row —
    the reference's staging layout — and round-trip through the reader."""
    import json
    import os

    rows = [artist(i) for i in range(7)]
    df = spark.createDataFrame(rows, schema=ARTISTS_SCHEMA)
    out = str(tmp_path / "keyed_out")
    spark.dataSource.register(KeyedJsonDataSource)
    (
        df.write.format("keyed_json")
        .option("path", out)
        .option("keyColumn", "id")
        .mode("append")
        .save()
    )
    names = sorted(f for f in os.listdir(out) if f.endswith(".json"))
    assert names == sorted(f"{r['id']}.json" for r in rows)
    # each file is ONE json object keyed by its id
    with open(os.path.join(out, names[0])) as fh:
        obj = json.load(fh)
    assert obj["id"] == names[0].removesuffix(".json")
    # commit manifest lists every file
    with open(os.path.join(out, "_MANIFEST")) as fh:
        assert sorted(fh.read().split()) == names
    back = (
        spark.read.format("keyed_json")
        .schema(ARTISTS_SCHEMA)
        .option("path", out)
        .load()
    )
    assert sorted(r["id"] for r in back.collect()) == sorted(
        r["id"] for r in rows
    )


def test_stream_reader_tails_new_keyed_files(spark, tmp_path):
    """readStream.format('keyed_json') must pick up newly staged objects
    exactly once across micro-batches."""
    import json
    import os
    import time

    d = tmp_path / "keyed_stream"
    d.mkdir()

    def put(i):
        a = artist(i)
        tmp = d / f".{a['id']}.json.tmp"
        with open(tmp, "w") as fh:
            json.dump(a, fh)
        os.replace(tmp, d / f"{a['id']}.json")

    for i in range(3):
        put(i)
    spark.dataSource.register(KeyedJsonDataSource)
    stream = (
        spark.readStream.format("keyed_json")
        .schema(ARTISTS_SCHEMA)
        .option("path", str(d))
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("keyed_tail")
        .start()
    )
    try:
        q.processAllAvailable()
        first = sorted(
            r["id"] for r in spark.sql("SELECT id FROM keyed_tail").collect()
        )
        assert first == [f"ar{i:03d}" for i in range(3)]
        for i in range(3, 5):
            put(i)
        # poll rather than a fixed sleep: under full-suite load one
        # processAllAvailable can race the source's directory listing
        want = [f"ar{i:03d}" for i in range(5)]
        deadline = time.monotonic() + 30
        got: list = []
        while time.monotonic() < deadline:
            q.processAllAvailable()
            got = sorted(
                r["id"]
                for r in spark.sql("SELECT id FROM keyed_tail").collect()
            )
            if got == want:
                break
            time.sleep(0.2)
        # exactly once: all five files, no re-reads of the first batch's
        assert got == want
    finally:
        q.stop()


def test_stream_writer_lands_keyed_objects_per_batch(spark, tmp_path):
    """writeStream.format('keyed_json'): file-source events in, one
    {id}.json per row out, _BATCHES records each committed epoch."""
    import json
    import os
    import time

    src = tmp_path / "sw_src"
    src.mkdir()

    def put_batch(name, lo, hi):
        with open(src / name, "w") as fh:
            for i in range(lo, hi):
                fh.write(json.dumps(artist(i)) + "\n")

    put_batch("b0.json", 0, 4)
    spark.dataSource.register(KeyedJsonDataSource)
    stream = (
        spark.readStream.schema(ARTISTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    out = str(tmp_path / "sw_out")
    q = (
        stream.writeStream.format("keyed_json")
        .option("path", out)
        .option("keyColumn", "id")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        put_batch("b1.json", 4, 6)
        time.sleep(0.1)
        q.processAllAvailable()
    finally:
        q.stop()
    names = sorted(f for f in os.listdir(out) if f.endswith(".json"))
    assert names == [f"ar{i:03d}.json" for i in range(6)]
    with open(os.path.join(out, "_BATCHES")) as fh:
        batches = [line.split("\t") for line in fh.read().splitlines()]
    assert len(batches) >= 2  # one commit line per non-empty epoch
    assert sum(int(n) for _, n in batches) == 6


def test_append_restage_merges_manifest(spark, tmp_path):
    """Staging the same entity twice in append mode must keep
    manifest == on-disk files: commit merges the prior manifest instead
    of rewriting it to just the second batch's names."""
    import os

    out = str(tmp_path / "restage")
    spark.dataSource.register(KeyedJsonDataSource)
    for lo, hi in [(0, 5), (3, 8)]:  # overlapping key ranges (upsert)
        df = spark.createDataFrame(
            [artist(i) for i in range(lo, hi)], schema=ARTISTS_SCHEMA
        )
        (
            df.write.format("keyed_json")
            .option("path", out)
            .mode("append")
            .save()
        )
    names = sorted(f for f in os.listdir(out) if f.endswith(".json"))
    assert names == [f"ar{i:03d}.json" for i in range(8)]
    with open(os.path.join(out, "_MANIFEST")) as fh:
        assert sorted(fh.read().split()) == names


def test_overwrite_restage_is_snapshot(spark, tmp_path):
    """mode('overwrite') is a snapshot: stale {id}.json objects from a
    prior commit are removed so manifest == files afterwards."""
    import os

    out = str(tmp_path / "snap")
    spark.dataSource.register(KeyedJsonDataSource)
    for lo, hi, mode in [(0, 6, "append"), (2, 4, "overwrite")]:
        df = spark.createDataFrame(
            [artist(i) for i in range(lo, hi)], schema=ARTISTS_SCHEMA
        )
        (
            df.write.format("keyed_json")
            .option("path", out)
            .mode(mode)
            .save()
        )
    names = sorted(f for f in os.listdir(out) if f.endswith(".json"))
    assert names == ["ar002.json", "ar003.json"]
    with open(os.path.join(out, "_MANIFEST")) as fh:
        assert sorted(fh.read().split()) == names
