"""Local twin of the driver's DuckDB oracle comparison.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and
order-insensitive values (columns sorted by name, rows sorted, floats
rounded to 6 places before comparing — the queries themselves already
round their unstable aggregates harder than that).
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from data_engineering_project_spotify_app_spark.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM parquet_scan('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_cell(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # + 0.0 folds IEEE -0.0 to +0.0: -0.0 == 0.0 numerically but
        # str()s differently, which would split them in the row sort
        return round(v, 6) + 0.0
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    return v


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple(str(x) for x in r))


def compare(spark, sf_dir: str, name: str, query_fn, oracle: str) -> None:
    sdf = query_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    try:
        res = con.sql(oracle)
        d_cols = list(res.columns)
        d_rows = [tuple(r) for r in res.fetchall()]
    finally:
        con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={s_cols} duckdb={d_cols}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    cs = _canon_rows(s_cols, s_rows)
    cd = _canon_rows(d_cols, d_rows)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
