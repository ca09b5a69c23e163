"""Engine CLI — the thin driver replacing the reference's HTTP server.

The reference exposes one route (`GET /artist/<name>/store`, app.py:229)
plus a `bq load` shell step (README.md:180–204). The engine's entry
point 3 (SURVEY.md §3) is this CLI:

    python -m data_engineering_project_spotify_app_spark etl \
        --staging DIR --warehouse DIR --artist "Name" [--out DIR]
    python -m data_engineering_project_spotify_app_spark load \
        --staging DIR --warehouse DIR
    python -m data_engineering_project_spotify_app_spark query \
        --name q_tpch_q1 --sf-dir /root/testdata/sf0.001 [--limit 20]

`etl` = the full reference pipeline (search → dedup → enrich → inject →
sink → summary) printed as the reference's JSON response shape
(app.py:216–220). `load` = the three-table overwrite load. `query` =
run any registered driver query.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _spark(app: str):
    from data_engineering_project_spotify_app_spark.session import get_spark

    return get_spark(app_name=app)


def cmd_load(args: argparse.Namespace) -> int:
    from data_engineering_project_spotify_app_spark.sources.ingest import (
        load_all_entities,
    )

    spark = _spark("cli-load")
    loaded = load_all_entities(spark, args.staging, args.warehouse)
    print(json.dumps({e: df.count() for e, df in loaded.items()}))
    return 0


def cmd_etl(args: argparse.Namespace) -> int:
    from data_engineering_project_spotify_app_spark.plans.pipeline import artist_etl
    from data_engineering_project_spotify_app_spark.sources.ingest import (
        load_all_entities,
        stage_entity,
    )

    start = time.time()
    spark = _spark("cli-etl")
    loaded = load_all_entities(spark, args.staging, args.warehouse)
    res = artist_etl(loaded["artists"], loaded["albums"], loaded["tracks"], args.artist)
    row = res.summary.first()
    if row is None:
        # P5: empty search result → error response (app.py:144, 237–239)
        print(json.dumps({"status": "error", "message": f"No artist found matching '{args.artist}'"}))
        return 1
    if args.out:
        stage_entity(res.albums, args.out, "albums")
        stage_entity(res.tracks.drop("album_id"), args.out, "tracks")
    # the reference's success payload shape (app.py:216–220)
    print(
        json.dumps(
            {
                "status": "success",
                "artist_name": row["artist_name"],
                "albums_stored": row["albums_stored"],
                "tracks_stored": row["tracks_stored"],
                "processing_time_seconds": round(time.time() - start, 2),
            }
        )
    )
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    from data_engineering_project_spotify_app_spark.operators import registry

    registry.load_all_modules()
    if args.name not in registry.QUERIES:
        print(
            json.dumps(
                {"status": "error", "message": f"unknown query {args.name!r}",
                 "available": sorted(registry.QUERIES)}
            )
        )
        return 1
    spark = _spark("cli-query")
    df = registry.QUERIES[args.name](spark, args.sf_dir)
    rows = df.limit(args.limit).collect()
    print(json.dumps({"query": args.name, "n_shown": len(rows),
                      "rows": [r.asDict() for r in rows]}, default=str))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="data_engineering_project_spotify_app_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pl = sub.add_parser("load", help="schema'd staging → warehouse load (S7)")
    pl.add_argument("--staging", required=True)
    pl.add_argument("--warehouse", required=True)
    pl.set_defaults(fn=cmd_load)

    pe = sub.add_parser("etl", help="full reference pipeline for one artist")
    pe.add_argument("--staging", required=True)
    pe.add_argument("--warehouse", required=True)
    pe.add_argument("--artist", required=True)
    pe.add_argument("--out", default=None, help="optional staging sink dir")
    pe.set_defaults(fn=cmd_etl)

    pq = sub.add_parser("query", help="run a registered driver query")
    pq.add_argument("--name", required=True)
    pq.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pq.add_argument("--limit", type=int, default=20)
    pq.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
