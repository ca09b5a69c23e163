"""Streaming curation funnel (streaming/funnel_stream.py): the
maintained report must equal the batch ``q_curation_funnel`` for ANY
micro-batch split of the corpus, survive replays / duplicate
re-delivery / compaction, and keep ingesting afterwards.
"""

from __future__ import annotations

from data_engineering_project_spotify_app_spark.operators import registry
from data_engineering_project_spotify_app_spark.streaming.funnel_stream import (
    StreamingCurationFunnel,
)

registry.load_all_modules()

SF = "/root/testdata/sf0.001"
DOC3_SCHEMA = "doc_id long, text string, n_chars long"


def _docs(spark):
    return [
        (r.doc_id, r.text, r.n_chars)
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text", "n_chars")
        .collect()
    ]


def _batch_report(spark):
    return sorted(
        tuple(r)
        for r in registry.QUERIES["q_curation_funnel"](spark, SF).collect()
    )


def _got(funnel):
    return sorted(tuple(r) for r in funnel.report().collect())


def test_streamed_funnel_equals_batch_any_split(spark, tmp_path):
    docs = _docs(spark)
    want = _batch_report(spark)
    # deliberately uneven, out-of-order splits + a duplicate re-delivery
    splits = [
        docs[300:],
        docs[:120] + docs[300:310],
        docs[120:300],
    ]
    funnel = StreamingCurationFunnel(spark, str(tmp_path / "funnel"))
    for e, batch in enumerate(splits):
        funnel(spark.createDataFrame(batch, DOC3_SCHEMA), e)
    assert _got(funnel) == want and want
    # replayed epoch: no-op for all three stage maintainers
    funnel(spark.createDataFrame(splits[1], DOC3_SCHEMA), 1)
    assert _got(funnel) == want
    # compaction folds all three chains; report unchanged
    funnel.compact()
    assert _got(funnel) == want
    # post-compaction ingest still lands: re-deliver the whole corpus
    # (guarded, no-op) plus one short new doc -> 'length' grows by 1
    extra = [(990001, "tiny", 4)]
    funnel(spark.createDataFrame(docs + extra, DOC3_SCHEMA), 3)
    after = dict(
        (r[0], (r[1], r[2])) for r in _got(funnel)
    )
    before = dict((r[0], (r[1], r[2])) for r in want)
    assert after["length"][0] == before.get("length", (0, 0))[0] + 1
    for stage in ("kept", "exact_dup", "near_dup"):
        assert after.get(stage) == before.get(stage)


def test_streamed_funnel_two_way_split_matches(spark, tmp_path):
    """A different split shape must converge to the same report — the
    attribution depends only on the maintained states, not the split."""
    docs = _docs(spark)
    want = _batch_report(spark)
    funnel = StreamingCurationFunnel(spark, str(tmp_path / "funnel2"))
    for e, batch in enumerate([docs[250:], docs[:250]]):
        funnel(spark.createDataFrame(batch, DOC3_SCHEMA), e)
    assert _got(funnel) == want


def test_streamed_funnel_by_source_equals_batch(spark, tmp_path):
    """report(by_source=True) must equal the registered batch
    q_funnel_by_source when the ingest carries a source column."""
    docs = [
        (r.doc_id, r.text, r.n_chars, r.source)
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text", "n_chars", "source")
        .collect()
    ]
    want = sorted(
        tuple(r)
        for r in registry.QUERIES["q_funnel_by_source"](spark, SF).collect()
    )
    schema = "doc_id long, text string, n_chars long, source string"
    funnel = StreamingCurationFunnel(spark, str(tmp_path / "funnel3"))
    third = len(docs) // 3
    for e, batch in enumerate(
        [docs[third:2 * third], docs[:third], docs[2 * third:]]
    ):
        funnel(spark.createDataFrame(batch, schema), e)
    got = sorted(
        tuple(r) for r in funnel.report(by_source=True).collect()
    )
    assert got == want and want
    # the plain report still works off the same maintained state
    plain = sorted(tuple(r) for r in funnel.report().collect())
    batch_plain = sorted(
        tuple(r)
        for r in registry.QUERIES["q_curation_funnel"](spark, SF).collect()
    )
    assert plain == batch_plain
