"""Tests for the reference-equivalent ETL DAG (plans/pipeline.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.plans.pipeline import artist_etl
from data_engineering_project_spotify_app_spark.schemas import (
    ALBUMS_SCHEMA,
    ARTISTS_SCHEMA,
    TRACKS_SCHEMA,
)
from tests.spotify_fixtures import build_catalog


def _frames(spark):
    artists, albums_, tracks_ = build_catalog(n_artists=6, albums_per_artist=4)
    return (
        spark.createDataFrame(artists, schema=ARTISTS_SCHEMA),
        spark.createDataFrame(albums_, schema=ALBUMS_SCHEMA),
        spark.createDataFrame(tracks_, schema=TRACKS_SCHEMA),
    )


def test_full_pipeline_counts(spark):
    artists, albums, tracks = _frames(spark)
    res = artist_etl(artists, albums, tracks, "Artist 2")

    assert res.artist.count() == 1
    assert res.artist.first()["id"] == "ar002"
    # catalog: 4 albums per artist, 3 tracks per album
    assert res.albums.count() == 4
    assert res.tracks.count() == 12
    s = res.summary.first()
    assert s["artist_name"] == "Artist 2"
    assert s["albums_stored"] == 4
    assert s["tracks_stored"] == 12


def test_search_miss_yields_empty(spark):
    """P5: empty search result — engine yields empty frames, not a crash
    (the reference raises ValueError at app.py:144; job-level validation
    is the caller's choice)."""
    artists, albums, tracks = _frames(spark)
    res = artist_etl(artists, albums, tracks, "No Such Artist")
    assert res.artist.count() == 0
    assert res.albums.count() == 0
    assert res.summary.count() == 0


def test_tracks_carry_injected_album_id(spark):
    """J2: every track row carries its parent album key (README.md:18)."""
    artists, albums, tracks = _frames(spark)
    res = artist_etl(artists, albums, tracks, "Artist 0")
    bad = res.tracks.filter(
        F.col("album_id").isNull() | (F.col("album_id") != F.col("album.id"))
    )
    assert bad.count() == 0


def test_dedup_before_enrich(spark):
    """A1/O1: duplicate album references dedup to one enriched row
    (set() at app.py:164)."""
    artists, albums, tracks = _frames(spark)
    # duplicate the album rows (as if re-paginated twice) — enrichment
    # input has dups, output must not
    res = artist_etl(artists, albums.unionByName(albums), tracks, "Artist 1")
    ids = [r["id"] for r in res.albums.select("id").collect()]
    # left_semi against deduped ids keeps the duplicated full rows only
    # once per underlying album id set
    assert len(set(ids)) == 4
