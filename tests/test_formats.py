"""Format round-trips: every supported landing format must reproduce
rows AND types exactly (or refuse loudly when it can't)."""

from __future__ import annotations

import pytest

from data_engineering_project_spotify_app_spark.sources.formats import (
    land_table,
    read_table,
)
from data_engineering_project_spotify_app_spark.tables import table

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_flat_table_roundtrips_exactly(spark, tmp_path, fmt):
    src = table(spark, SF, "supplier")  # flat: long/string/int/double
    path = str(tmp_path / f"t_{fmt}")
    land_table(src, path, fmt)
    back = read_table(spark, path, fmt, schema=src.schema)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )


def test_csv_refuses_nested_and_schemaless(spark, tmp_path):
    nested = spark.createDataFrame(
        [(1, {"a": 2})], "id long, s struct<a: long>"
    )
    with pytest.raises(ValueError, match="nested"):
        land_table(nested, str(tmp_path / "x"), "csv")
    flat = table(spark, SF, "supplier")
    land_table(flat, str(tmp_path / "y"), "csv")
    with pytest.raises(ValueError, match="schema"):
        read_table(spark, str(tmp_path / "y"), "csv")


def test_lakehouse_formats_error_clearly(spark, tmp_path):
    flat = table(spark, SF, "supplier")
    with pytest.raises(ValueError, match="connector jars"):
        land_table(flat, str(tmp_path / "d"), "delta")


def test_timestamp_column_survives_json_with_schema(spark, tmp_path):
    ev = table(spark, SF, "events").select("event_id", "ts", "value")
    path = str(tmp_path / "ev_json")
    land_table(ev, path, "json")
    back = read_table(spark, path, "json", schema=ev.schema)
    assert back.schema == ev.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, ev.collect())
    )
