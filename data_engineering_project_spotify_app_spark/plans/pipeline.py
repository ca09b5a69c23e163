"""The reference's full ETL pipeline as ONE lazy DataFrame DAG.

``run_full_etl_process`` (app.py:133–220) hard-codes a physical plan:

  search artist (app.py:140–145)
    → point lookup (147–149)
    → paginate albums (152–163)
    → dedup album ids (164)
    → batch-enrich albums (167–177)
    → per-album track scan (183–189)
    → dedup + batch-enrich tracks (190–199)
    → upload JSON per entity (201–211)
    → summary counts (213–220)

Here the same dataflow is declared once over entity DataFrames and
Catalyst/AQE choose the physical strategy (SURVEY.md §3): its four
hand-rolled ThreadPoolExecutor barriers become shuffle stage boundaries,
its `total`-probe fan-out sizing becomes AQE, its thread/semaphore
tuning becomes executor/partition config (session.py).

Inputs are the landed entity tables (any source: load_all_entities over
staging NDJSON, fixture parquet, or live-API snapshots — the transport
is infrastructure, not semantics; SURVEY.md M4).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class EtlResult:
    """Pipeline outputs: the enriched frames + the summary frame.

    ``summary`` is the 1-row equivalent of the reference's response dict
    (app.py:216–220): artist name, albums_found, albums_stored,
    tracks_stored.
    """

    artist: DataFrame
    albums: DataFrame
    tracks: DataFrame
    summary: DataFrame


def artist_etl(
    artists: DataFrame,
    albums: DataFrame,
    tracks: DataFrame,
    artist_name: str,
) -> EtlResult:
    """The reference pipeline for one artist, as a declarative DAG.

    Stage mapping (reference → here):
    - S1 search+limit1 (app.py:140–145): name-contains filter, best
      (here: lowest-id) match first — deterministic where the API's
      relevance order was not.
    - S4 child scan (152–163, 183–189): albums/tracks arrive as child
      tables joined on the parent key — the REST pagination disappears.
    - A1 dedup (164): dropDuplicates on the id before enrichment.
    - J1 batch enrich (167–177, 192–199): key-set inner join back to the
      full entity rows.
    - J2 parent inject (README.md:18): each track carries album_id.
    - A3 summary (216–220): counts grouped by entity type.
    """
    # S1/L1: search scan with predicate + limit 1
    matched = (
        artists.filter(F.col("name").contains(artist_name))
        .orderBy("id")
        .limit(1)
    )

    # S4: all albums of the matched artist (the paginated album scan);
    # membership via explode of the album's artist array (albums carry
    # their artists nested — albums_schema.json:81–99)
    album_artist = albums.select(
        F.col("id").alias("album_id"),
        F.explode("artists").alias("album_artist"),
    ).select("album_id", F.col("album_artist.id").alias("artist_id"))

    matched_ids = matched.select(F.col("id").alias("artist_id"))
    # A1: dedup album ids (an album lists the artist once per role page;
    # the reference dedups with set() at app.py:164)
    album_ids = (
        album_artist.join(F.broadcast(matched_ids), "artist_id")
        .select("album_id")
        .dropDuplicates(["album_id"])
    )

    # J1: batch enrichment == key-set inner join back to full rows
    enriched_albums = albums.join(
        F.broadcast(album_ids), albums.id == album_ids.album_id, "left_semi"
    )

    # S4 + J2: child tracks with the parent album key injected; tracks
    # embed their album struct (tracks_schema.json:107–170)
    artist_tracks = tracks.withColumn(
        "album_id", F.col("album.id")
    ).join(
        F.broadcast(album_ids),
        "album_id",
        "left_semi",
    )

    # P2: null-id guard before the sink (app.py:188, 205–206)
    valid_albums = enriched_albums.filter(F.col("id").isNotNull())
    valid_tracks = artist_tracks.filter(F.col("id").isNotNull())

    # A2/A3: the summary row (counts per entity type, app.py:216–220)
    counts = (
        valid_albums.select(F.lit("album").alias("entity"))
        .unionByName(valid_tracks.select(F.lit("track").alias("entity")))
        .groupBy("entity")
        .agg(F.count("*").alias("n"))
    )
    summary = (
        matched.select(F.col("name").alias("artist_name"))
        .crossJoin(
            counts.groupBy().pivot("entity", ["album", "track"]).sum("n")
        )
        .select(
            "artist_name",
            F.coalesce(F.col("album"), F.lit(0)).alias("albums_stored"),
            F.coalesce(F.col("track"), F.lit(0)).alias("tracks_stored"),
        )
    )
    return EtlResult(
        artist=matched,
        albums=valid_albums,
        tracks=valid_tracks,
        summary=summary,
    )
