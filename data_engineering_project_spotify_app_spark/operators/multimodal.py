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


try:  # optional real raster codec — import-gated, absent in container
    from PIL import Image as _PILImage  # type: ignore

    _HAS_PIL = True
except ImportError:  # pragma: no cover - container has no pillow
    _PILImage = None
    _HAS_PIL = False


def _decode_ppm_p6(payload: bytes) -> tuple[int, int, int]:
    """Pure-stdlib decode of a binary PPM (P6) raster — a REAL image
    format the pipeline exercises even without media libs: header is
    ASCII 'P6 <w> <h> <maxval>' with #-comments, then raw RGB bytes."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end-of-line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then raster
    w, h, maxval = fields
    need = w * h * (6 if maxval > 255 else 3)
    raster = payload[i : i + need]
    if len(raster) < need:
        raise ValueError(f"truncated P6 raster: {len(raster)} < {need}")
    return (w, h, sum(raster[:4096]) + len(raster))


def decode_stub(fmt: str, payload: bytes) -> tuple[int, int, int]:
    """Decode one media payload → (width, height, checksum).

    Dispatch ladder: 'fake/*' decodes deterministically from the bytes
    (the always-available test format); 'image/ppm' runs a real
    pure-stdlib P6 parser; other rasters (jpeg/png/...) go through
    pillow WHEN the environment has it (import-gated — this container
    does not), else raise. Audio/video formats stay stubbed.
    """
    if fmt.startswith("fake/"):
        n = len(payload)
        checksum = sum(payload[:64]) + n
        # deterministic fake dimensions derived from content
        return (n % 640 + 1, (checksum % 480) + 1, checksum)
    if fmt == "image/ppm":
        return _decode_ppm_p6(payload)
    if fmt.startswith("image/") and _HAS_PIL:
        import io

        with _PILImage.open(io.BytesIO(payload)) as im:
            w, h = im.size
            raster = im.convert("RGB").tobytes()
        return (w, h, sum(raster[:4096]) + len(raster))
    raise NotImplementedError(
        f"media decode for {fmt!r} requires an image/audio library "
        "not present in this environment; 'fake/*', 'image/ppm' and "
        "(with pillow) raster 'image/*' are implemented"
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


RESIZED_SCHEMA = (
    "doc_id bigint, fmt string, width int, height int, payload binary"
)

TARGET_W, TARGET_H = 64, 64


def resize_stub(payload: bytes, w: int, h: int) -> bytes:
    """Resize one media payload to (w, h) — STUB.

    A real implementation hands the decoded raster to the imaging lib;
    the deterministic fake keeps the contract (output length is a pure
    function of target dims) so partition sizing and schema flow are
    testable: output payload is the input recycled/truncated to w*h
    bytes.
    """
    need = w * h
    if not payload:
        return bytes(need)
    reps = need // len(payload) + 1
    return (payload * reps)[:need]


def resize_batch(binary_df: DataFrame, w: int = TARGET_W, h: int = TARGET_H) -> DataFrame:
    """mapInPandas resize: every payload normalized to a fixed raster.

    The pre-training normalization step (images to one resolution).
    Output payloads are constant-size, which is exactly what makes the
    downstream shuffle/storage planning predictable at 100 TB: rows
    become fixed-width, so maxPartitionBytes translates directly to
    rows-per-task.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "fmt": pdf["fmt"],
                    "width": pd.Series([w] * len(pdf), dtype="int32"),
                    "height": pd.Series([h] * len(pdf), dtype="int32"),
                    "payload": [
                        resize_stub(p, w, h) for p in pdf["payload"]
                    ],
                }
            )

    return binary_df.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, n_frames int, frame_checksum bigint"
)

FRAME_BYTES = 256
FRAME_STRIDE = 4


def sample_frames(
    binary_df: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    stride: int = FRAME_STRIDE,
) -> DataFrame:
    """mapInPandas frame sampling: one input row fans out to one row per
    sampled frame (every ``stride``-th fixed-size chunk of the payload —
    the fake stand-in for video frame extraction).

    The shape that matters: mapInPandas emitting MORE rows than it
    receives, with the payload dropped on output — the video→frames
    explosion happens inside the stage, and only small typed rows hit
    the shuffle. At 100 TB the input stays partition-pruned to the
    payload column's row groups; output cardinality is bounded by
    len(payload)/frame_bytes/stride per row.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_n, out_ck = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = [
                    payload[i : i + frame_bytes]
                    for i in range(0, len(payload), frame_bytes)
                ]
                n = len(frames)
                for k in range(0, n, stride):
                    out_doc.append(int(doc_id))
                    out_idx.append(k)
                    out_n.append(n)
                    out_ck.append(sum(frames[k]) + len(frames[k]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "n_frames": pd.Series(out_n, dtype="int32"),
                    "frame_checksum": pd.Series(out_ck, dtype="int64"),
                }
            )

    return binary_df.mapInPandas(run, schema=FRAME_SCHEMA)


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lit("fake/text").alias("fmt"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


# Oracle note (both multimodal queries): the payload is the UTF-8
# encoding of documents.text, and the fixture text is pure ASCII, so
# byte values == code points and byte length == char length — which
# makes the deterministic fake decode EXPRESSIBLE in SQL (ord/substr
# per position). What the oracle then verifies end-to-end is the Spark
# side's real plumbing: binary encode, Arrow batching, mapInPandas
# batch shapes, and the fan-out row accounting.
@query(
    "q_multimodal_frames",
    oracle="""
    WITH b AS (
      SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
      FROM documents
    ),
    f AS (
      SELECT doc_id, text, n,
             unnest([x for x in
                     generate_series(0, CAST(ceil(n / 256.0) AS BIGINT) - 1)
                     if x % 4 = 0]) AS k
      FROM b
    )
    SELECT doc_id,
           CAST(k AS INT) AS frame_idx,
           CAST(ceil(n / 256.0) AS INT) AS n_frames,
           CAST(list_sum([ord(substr(text, CAST(i AS INT), 1)) for i in
                          generate_series(k * 256 + 1,
                                          least(n, k * 256 + 256))])
                + least(256, n - k * 256) AS BIGINT) AS frame_checksum
    FROM f
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over synthesized binary payloads (video stand-in):
    every 4th 256-byte chunk becomes a typed frame row."""
    return sample_frames(_payloads(spark, sf_dir))


@query(
    "q_multimodal_features",
    oracle="""
    WITH b AS (
      SELECT doc_id, 'fake/text' AS fmt, text,
             CAST(length(text) AS BIGINT) AS n
      FROM documents
    ),
    c AS (
      SELECT doc_id, fmt, n,
             CAST(list_sum([ord(substr(text, CAST(i AS INT), 1)) for i in
                            generate_series(1, least(n, 64))])
                  + n AS BIGINT) AS checksum
      FROM b
    )
    SELECT doc_id, fmt, n AS byte_len,
           CAST(n % 640 + 1 AS INT) AS width,
           CAST(checksum % 480 + 1 AS INT) AS height,
           checksum
    FROM c
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline over synthesized binary payloads.

    documents.text → binary payload (stand-in for an image/audio blob) →
    mapInPandas decode → typed features. Fully oracle-checked (see the
    oracle note above); tests/test_multimodal.py asserts the decode
    determinism and batch shapes.
    """
    d = table(spark, sf_dir, "documents")
    binary_df = d.select(
        "doc_id",
        F.lit("fake/text").alias("fmt"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    return extract_features(binary_df)


@query(
    "q_multimodal_dedup",
    oracle="""
    SELECT sha256(text) AS payload_sha256,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           CAST(count(*) AS BIGINT) AS n_copies,
           CAST(min(length(text)) AS BIGINT) AS payload_bytes
    FROM documents
    GROUP BY 1
    """,
)
def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup of opaque BINARY payloads by content digest.

    The multimodal twin of q_dedup_exact (dedup.py:78): image/audio/video
    blobs can't be compared as text, so identity is the SHA-256 of the
    raw bytes — computed JVM-side on the binary column (no decode, no
    Python). Output is one row per distinct payload with the kept
    representative (min doc_id) and the copy count; a storage layer
    would keep one blob per row of this table.

    Oracle equivalence: the payload is the UTF-8 encoding of
    documents.text and the fixture text is ASCII, so sha256(text) in
    DuckDB hashes the identical byte string.

    Scale: the only shuffle key is the 32-byte digest — uniform by
    construction, partial-aggregated map-side; 100 TB of blobs shuffle
    only (digest, min_id, count, bytes) tuples. The blob bytes
    themselves never leave the scan stage.
    """
    d = table(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return (
        payloads.select(
            F.sha2("payload", 256).alias("payload_sha256"),
            "doc_id",
            F.length("payload").cast("bigint").alias("nbytes"),
        )
        .groupBy("payload_sha256")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
            F.min("nbytes").alias("payload_bytes"),
        )
    )
