"""Generic table landing across Spark's built-in columnar/text formats.

The reference's only wire format is NDJSON→BigQuery (SURVEY.md §2.1);
an engine replacing it should still land/read the standard lake formats
a user migrating real tables will have. Thin, schema-honest wrappers —
the format differences that matter are encoded here once:

- parquet / orc: self-describing columnar; schema round-trips.
- json (NDJSON): self-describing values but NOT types (ints widen to
  bigint, timestamps stringify) — read back with the declared schema.
- csv: flat text; no nested types, no schema — written with a header
  for humans, read back ONLY with an explicit schema (inferSchema is
  banned in production paths: one pass of wrong guessing at 100 TB).

Delta/Iceberg/Hudi need their jars on the classpath (absent in this
environment) — callers get a clear error instead of a stub table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SELF_DESCRIBING = {"parquet", "orc"}
SUPPORTED = {"parquet", "orc", "json", "csv"}

# microsecond-precision timestamps for the text formats (default is ms)
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def _check(fmt: str, schema: T.StructType | None) -> None:
    if fmt not in SUPPORTED:
        raise ValueError(
            f"format {fmt!r} not supported here"
            + (
                " (Delta/Iceberg/Hudi need their connector jars, absent "
                "in this environment)"
                if fmt in {"delta", "iceberg", "hudi"}
                else ""
            )
        )
    if fmt == "csv":
        if schema is None:
            raise ValueError(
                "csv round-trips only with an explicit schema "
                "(inferSchema re-guesses types per read — banned)"
            )
        for f in schema.fields:
            if isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType)):
                raise ValueError(
                    f"csv cannot represent nested column {f.name!r}"
                )


def land_table(df: DataFrame, path: str, fmt: str = "parquet") -> str:
    """Land a frame at ``path`` in ``fmt`` with overwrite semantics."""
    _check(fmt, df.schema if fmt == "csv" else None)
    writer = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if fmt in {"csv", "json"}:
        # Spark's default text timestampFormat writes MILLIS — a silent
        # precision loss on round-trip; pin microsecond precision
        writer = writer.option("timestampFormat", _TS_FMT)
    writer.save(path)
    return path


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
) -> DataFrame:
    """Read a landed table back; non-self-describing formats REQUIRE
    the declared schema (json for exact types, csv always)."""
    if fmt not in SELF_DESCRIBING:
        _check(fmt, schema)
        if schema is None:
            raise ValueError(f"{fmt} read-back requires the declared schema")
        reader = spark.read.schema(schema).format(fmt).option(
            "timestampFormat", _TS_FMT
        )
    else:
        _check(fmt, None)
        reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.load(path)
