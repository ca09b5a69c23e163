"""Corpus-curation operators: semantics the oracle can't see.

Oracle parity for q_decontaminate / q_heavy_hitters / q_pack_shards /
q_source_weights runs in test_oracle_parity.py; here we pin down the
invariants and the scale-path variant.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.operators import curation
from tests.conftest import SF_SMOKE


def test_decontaminate_excludes_eval_docs(spark):
    out = curation.q_decontaminate(spark, SF_SMOKE)
    bad = out.filter(F.col("doc_id") % curation.EVAL_MOD == 0).count()
    assert bad == 0


def test_decontaminate_overlap_is_positive(spark):
    rows = curation.q_decontaminate(spark, SF_SMOKE).collect()
    assert rows, "fixture corpus should contain contaminated docs"
    assert all(r.n_shared >= 1 for r in rows)


def test_pack_shards_two_phase_matches_window(spark):
    """The registered broadcast-prefix form must equal the single-window
    toy form."""
    a = sorted(
        tuple(r) for r in curation.q_pack_shards(spark, SF_SMOKE).collect()
    )
    b = sorted(
        tuple(r)
        for r in curation.pack_shards_single_window(spark, SF_SMOKE).collect()
    )
    assert a == b


def test_pack_shards_registered_plan_has_no_global_window(spark):
    """The registered q_pack_shards must never coalesce the corpus into
    one task: every Window node in the optimized plan either has a
    partition key (the per-range local sums) or runs over the tiny
    per-partition offset table — no `Window [ORDER BY doc_id]` over the
    corpus."""
    plan = curation.q_pack_shards(spark, SF_SMOKE)._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition(doc_id" in line.replace(" ", "").lower():
            # a corpus-wide window is only safe when partitioned by pid
            assert "pid" in line, f"global-order corpus window found: {line}"


def test_pack_shards_budget_respected(spark):
    rows = curation.q_pack_shards(spark, SF_SMOKE).collect()
    # Every shard except possibly the last stays within budget + one doc
    # (greedy packing can overshoot by at most the doc that crosses the
    # boundary; shards are closed the row they cross it).
    max_doc = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .agg(F.max("n_chars"))
        .collect()[0][0]
    )
    for r in rows:
        assert r.shard_chars <= curation.SHARD_CHAR_BUDGET + max_doc


def test_source_weights_sum_to_one(spark):
    rows = curation.q_source_weights(spark, SF_SMOKE).collect()
    assert abs(sum(r.char_share for r in rows) - 1.0) < 1e-4
    # uniform target: weight * share == 1/#strata for every stratum
    n = len(rows)
    for r in rows:
        assert abs(r.mix_weight * r.char_share - 1.0 / n) < 1e-3


def test_lm_decontaminate_flags_eval_overlap(spark, tmp_path):
    """A candidate doc PASTED FROM the eval slice must outscore (and be
    flagged above) a disjoint-vocabulary candidate, and every candidate
    bigram must be scored (n_bigrams == token count - 1)."""
    from data_engineering_project_spotify_app_spark.operators import registry

    registry.load_all_modules()
    eval_text = " ".join(f"e{i}" for i in range(50))
    rows = [
        (0, eval_text, "en", "src0", len(eval_text)),
        (1, " ".join(f"e{i}" for i in range(40)), "en", "src2", 0),
        (2, " ".join(f"z{i}" for i in range(40)), "en", "src2", 0),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = str(tmp_path / "docs")
    df.write.parquet(f"{out}/documents.parquet")
    res = {
        r["doc_id"]: r
        for r in registry.QUERIES["q_lm_decontaminate"](spark, out).collect()
    }
    assert set(res) == {1, 2}  # eval doc itself is not scored
    assert res[1]["n_bigrams"] == 39 and res[2]["n_bigrams"] == 39
    assert res[1]["avg_logprob"] > res[2]["avg_logprob"]
    assert res[1]["flagged"] and not res[2]["flagged"]


def test_dsir_ranks_target_like_docs_higher(spark, tmp_path):
    """A candidate doc pasted from the target slice must out-rank a
    disjoint-vocabulary candidate under the DSIR importance weight."""
    from data_engineering_project_spotify_app_spark.operators import registry

    registry.load_all_modules()
    target = " ".join(f"t{i % 20}" for i in range(60))
    rows = [
        (0, target, "en", "src0", len(target)),
        (1, " ".join(f"t{i % 20}" for i in range(40)), "en", "src5", 0),
        (2, " ".join(f"q{i}" for i in range(40)), "en", "src5", 0),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = str(tmp_path / "docs")
    df.write.parquet(f"{out}/documents.parquet")
    res = {
        r["doc_id"]: r
        for r in registry.QUERIES["q_dsir_weights"](spark, out).collect()
    }
    assert set(res) == {1, 2}
    assert res[1]["avg_logratio"] > res[2]["avg_logratio"]


def test_code_switch_flags_concatenated_languages(spark, tmp_path):
    """A doc whose head is English stopwords and tail is Spanish must
    flag mixed; monolingual docs must not."""
    from data_engineering_project_spotify_app_spark.operators import registry

    registry.load_all_modules()
    mixed = "the a of and the a " + "el la de y el la"
    mono = "the a of and the a of and"
    rows = [
        (0, mixed, "en", "src0", len(mixed)),
        (1, mono, "en", "src0", len(mono)),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = str(tmp_path / "docs")
    df.write.parquet(f"{out}/documents.parquet")
    res = {
        r["doc_id"]: r
        for r in registry.QUERIES["q_code_switch"](spark, out).collect()
    }
    assert res[0]["mixed"] and res[0]["lang_head"] == "en" \
        and res[0]["lang_tail"] == "es"
    assert not res[1]["mixed"]


def test_code_switch_odd_token_tail_keeps_last_token(spark, tmp_path):
    """Regression: with an ODD token count the tail half must hold
    ceil(n/2) tokens including the LAST one (t[n//2+1 : n] in the
    oracle). The old (n - n/2).cast('int') truncated 5-2.5 to 2 and
    dropped the final token from both halves — here the dropped token
    is the only Spanish vote, so the bug would report tail='en' and
    mixed=False."""
    from data_engineering_project_spotify_app_spark.operators import registry

    registry.load_all_modules()
    # 5 tokens, mid=2: head=[the,a] -> en. tail=[the,el,la] -> es 2 vs
    # en 1. The buggy 2-token tail [the,el] ties 1-1 and the en-first
    # tie-break reports 'en', mixed=False.
    rows = [(0, "the a the el la", "en", "src0", 15)]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = str(tmp_path / "docs")
    df.write.parquet(f"{out}/documents.parquet")
    r = registry.QUERIES["q_code_switch"](spark, out).collect()[0]
    assert r["lang_head"] == "en"
    assert r["lang_tail"] == "es" and r["mixed"]
