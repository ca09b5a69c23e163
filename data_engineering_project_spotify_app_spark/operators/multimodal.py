"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as `binary`
columns with a metadata struct alongside. This module implements the
Spark-side plumbing for that pattern — schema, Arrow-batched
mapInPandas decode/feature-extract, partition sizing — with the actual
media decode STUBBED (media libs are not in this container):

- ``decode_stub`` raises NotImplementedError for real media formats and
  produces a deterministic fake for the 'fake/' format used in tests, so
  the batch shapes, schema, and partition flow are exercised for real.
- ``q_multimodal_features`` (rows-only check: mapInPandas output is not
  SQL-expressible) builds binary payloads from `documents.text`, runs
  the decode/feature pipeline, and returns typed features.

Scale notes: binary payloads ride the columnar path (Arrow) into pandas
batches — never row-at-a-time Python; `spark.sql.files.maxPartitionBytes`
bounds per-task memory; metadata-only queries never touch the payload
column (column pruning drops it at the reader).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.operators.registry import query
from data_engineering_project_spotify_app_spark.tables import table

FEATURE_SCHEMA = (
    "doc_id bigint, fmt string, byte_len bigint, "
    "width int, height int, checksum bigint"
)


def decode_stub(fmt: str, payload: bytes) -> tuple[int, int, int]:
    """Decode one media payload → (width, height, checksum).

    Real formats (jpeg/png/wav/mp4/...) would dispatch to the media lib
    here; the container has none, so they raise. The 'fake/' format
    family decodes deterministically from the payload bytes so tests and
    the driver's rows-only check exercise the full pipeline shape.
    """
    if fmt.startswith("fake/"):
        n = len(payload)
        checksum = sum(payload[:64]) + n
        # deterministic fake dimensions derived from content
        return (n % 640 + 1, (checksum % 480) + 1, checksum)
    raise NotImplementedError(
        f"media decode for {fmt!r} requires an image/audio library "
        "not present in this environment; only 'fake/*' is implemented"
    )


def extract_features(binary_df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, fmt, payload).

    Arrow delivers columnar batches; the decode loop is per-batch numpy/
    pandas, not per-row Python over Spark rows. Output is a typed,
    payload-free frame — the payload never leaves the stage.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decode_stub(fmt, payload)
                for fmt, payload in zip(pdf["fmt"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "fmt": pdf["fmt"],
                    "byte_len": pdf["payload"].map(len).astype("int64"),
                    "width": pd.Series([d[0] for d in decoded], dtype="int32"),
                    "height": pd.Series([d[1] for d in decoded], dtype="int32"),
                    "checksum": pd.Series([d[2] for d in decoded], dtype="int64"),
                }
            )

    return binary_df.mapInPandas(run, schema=FEATURE_SCHEMA)


@query("q_multimodal_features")  # rows-only: mapInPandas, not SQL-expressible
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline over synthesized binary payloads.

    documents.text → binary payload (stand-in for an image/audio blob) →
    mapInPandas decode → typed features. Driver records a rows-only
    check; tests/test_multimodal.py asserts the decode determinism and
    batch shapes.
    """
    d = table(spark, sf_dir, "documents")
    binary_df = d.select(
        "doc_id",
        F.lit("fake/text").alias("fmt"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    return extract_features(binary_df)
