"""Multimodal plumbing tests: Arrow batch shapes, stub determinism,
payload pruning."""

from __future__ import annotations

import pytest

from data_engineering_project_spotify_app_spark.operators import registry
from data_engineering_project_spotify_app_spark.operators.multimodal import (
    decode_stub,
    extract_features,
)

registry.load_all_modules()


def test_decode_stub_is_deterministic_for_fake_formats():
    w1, h1, c1 = decode_stub("fake/img", b"hello world" * 10)
    w2, h2, c2 = decode_stub("fake/img", b"hello world" * 10)
    assert (w1, h1, c1) == (w2, h2, c2)
    assert w1 >= 1 and h1 >= 1


def test_decode_stub_rejects_real_formats():
    with pytest.raises(NotImplementedError) as ei:
        decode_stub("image/jpeg", b"\xff\xd8\xff")
    assert "image/jpeg" in str(ei.value)


def test_pipeline_features_deterministic_and_typed(spark, sf_dir):
    df = registry.QUERIES["q_multimodal_features"](spark, sf_dir)
    assert dict(df.dtypes) == {
        "doc_id": "bigint",
        "fmt": "string",
        "byte_len": "bigint",
        "width": "int",
        "height": "int",
        "checksum": "bigint",
    }
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in df.collect())
    assert a == b and len(a) > 0
    # byte_len must equal the utf-8 length of the source text
    from data_engineering_project_spotify_app_spark.tables import table

    n_chars = {
        r["doc_id"]: r["n_chars"]
        for r in table(spark, sf_dir, "documents").collect()
    }
    for row in a[:50]:
        assert row[2] == n_chars[row[0]]  # ascii fixture: chars == bytes


def test_binary_payload_survives_roundtrip_and_batches(spark):
    rows = [(i, "fake/bin", bytes([i % 256]) * (i + 1)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id bigint, fmt string, payload binary")
    out = extract_features(df.repartition(4))
    got = {r["doc_id"]: r for r in out.collect()}
    assert len(got) == 300
    for i in (0, 7, 299):
        assert got[i]["byte_len"] == i + 1
        w, h, c = decode_stub("fake/bin", bytes([i % 256]) * (i + 1))
        assert (got[i]["width"], got[i]["height"], got[i]["checksum"]) == (w, h, c)


def test_metadata_query_prunes_payload_column(spark, tmp_path):
    """A metadata-only query over a multimodal table must not read the
    payload column from parquet (column pruning at the scan)."""
    rows = [(i, "fake/bin", b"x" * 1000) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, fmt string, payload binary")
    path = str(tmp_path / "mm.parquet")
    df.write.parquet(path)

    import io, contextlib

    meta_df = spark.read.parquet(path).groupBy("fmt").count()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        meta_df.explain("formatted")
    plan = buf.getvalue()
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "payload" not in read_schema


def test_resize_normalizes_every_payload(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.multimodal import (
        TARGET_H,
        TARGET_W,
        _payloads,
        resize_batch,
    )

    out = resize_batch(_payloads(spark, sf_dir)).limit(50).collect()
    assert out
    for r in out:
        assert (r["width"], r["height"]) == (TARGET_W, TARGET_H)
        assert len(r["payload"]) == TARGET_W * TARGET_H


def test_frame_sampling_fans_out_deterministically(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.multimodal import (
        _payloads,
        sample_frames,
    )

    stride = 2
    src = _payloads(spark, sf_dir)
    # small frames so the short fixture docs produce real fan-out
    frames = sample_frames(src, frame_bytes=32, stride=stride)
    rows = frames.collect()
    n_docs = src.count()
    assert len(rows) > n_docs  # fan-out: more frame rows than docs
    # per-doc frame idx sequence matches the stride sampling exactly
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for one in list(by_doc.values())[:20]:
        n = one[0]["n_frames"]
        assert sorted(r["frame_idx"] for r in one) == list(
            range(0, n, stride)
        )
    # determinism: same input → same checksums on rerun
    again = {
        (r["doc_id"], r["frame_idx"]): r["frame_checksum"]
        for r in sample_frames(src, frame_bytes=32, stride=stride).collect()
    }
    for r in rows:
        assert again[(r["doc_id"], r["frame_idx"])] == r["frame_checksum"]


def _ppm(w, h, comment=False):
    header = b"P6\n"
    if comment:
        header += b"# a comment line\n"
    header += f"{w} {h}\n255\n".encode()
    raster = bytes((x * 7 + 3) % 256 for x in range(w * h * 3))
    return header + raster


def test_decode_real_ppm_raster():
    """image/ppm decodes through a REAL pure-stdlib P6 parser."""
    w, h, c = decode_stub("image/ppm", _ppm(8, 6))
    assert (w, h) == (8, 6)
    w2, h2, c2 = decode_stub("image/ppm", _ppm(8, 6, comment=True))
    assert (w2, h2, c2) == (w, h, c)  # header comments don't change decode
    with pytest.raises(ValueError):
        decode_stub("image/ppm", _ppm(8, 6)[:-10])  # truncated raster


def test_decode_dispatch_ladder():
    import importlib.util

    has_pil = importlib.util.find_spec("PIL") is not None
    if not has_pil:
        with pytest.raises(NotImplementedError):
            decode_stub("image/png", b"\x89PNG\r\n")
    else:  # pragma: no cover - pillow absent in this container
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (5, 4)).save(buf, format="PNG")
        w, h, _ = decode_stub("image/png", buf.getvalue())
        assert (w, h) == (5, 4)


def test_ppm_payloads_flow_through_feature_pipeline(spark):
    """Real-format payloads ride the same mapInPandas feature path."""
    from data_engineering_project_spotify_app_spark.operators.multimodal import (
        extract_features,
    )

    rows = [(i, "image/ppm", _ppm(4 + i, 3 + i)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, fmt string, payload binary")
    got = {r["doc_id"]: r for r in extract_features(df).collect()}
    for i in range(6):
        assert (got[i]["width"], got[i]["height"]) == (4 + i, 3 + i)
        assert got[i]["byte_len"] == len(_ppm(4 + i, 3 + i))


def test_fixture_text_is_ascii_oracle_precondition(spark, sf_dir):
    """The multimodal oracles equate UTF-8 bytes with code points
    (ord/substr), valid ONLY while documents.text is pure ASCII. If a
    regenerated fixture ever breaks this, fail HERE with the reason
    rather than as an opaque driver hash mismatch — the fix would be
    scoping the two multimodal oracles back to rows-only."""
    from data_engineering_project_spotify_app_spark.tables import table

    from pyspark.sql import functions as F

    non_ascii = (
        table(spark, sf_dir, "documents")
        .where(
            F.octet_length(F.encode(F.col("text"), "UTF-8"))
            != F.length(F.col("text"))
        )
        .count()
    )
    assert non_ascii == 0, (
        "documents.text contains non-ASCII — multimodal oracles assume "
        "byte == code point; re-scope q_multimodal_* to rows-only"
    )
