"""Text-analysis operators over the ``documents`` table.

LLM-training-data primitives (BASELINE.json north star): token counting,
language ID, quality scoring, document fingerprinting. Everything is
built-in expressions — the whole module is UDF-free, so at 100 TB the
text path stays inside WholeStageCodegen with zero Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.functions.text import (
    NORMALIZE_SQL,
    TOKENS_SQL,
    normalize,
    tokens,
)
from data_engineering_project_spotify_app_spark.operators.registry import query
from data_engineering_project_spotify_app_spark.tables import table

_TOK = TOKENS_SQL.format(col="text")

# Stopword vote sets for the n-gram language heuristic. Tie-break order is
# the CASE order (en > es > de > fr > zh) — identical in both engines.
_LANGS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "y"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "les", "et", "du"),
}


@query(
    "q_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOK}) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_measured,
           n_chars
    FROM documents
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token + char counts per document (whitespace tokenizer)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_measured"),
        "n_chars",
    )


def _lang_hits_sql(words: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"CAST(len(list_filter({_TOK}, x -> x IN ({inlist}))) AS BIGINT)"


@query(
    "q_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_lang_hits_sql(_LANGS['en'])} AS en_hits,
             {_lang_hits_sql(_LANGS['es'])} AS es_hits,
             {_lang_hits_sql(_LANGS['de'])} AS de_hits,
             {_lang_hits_sql(_LANGS['fr'])} AS fr_hits
      FROM documents
    )
    SELECT doc_id, lang, en_hits, es_hits, de_hits, fr_hits,
           CASE
             WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
             WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
             WHEN de_hits >= fr_hits THEN 'de'
             ELSE 'fr'
           END AS pred_lang
    FROM scored
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by stopword-vote heuristic (n-gram language model lite).

    Counts hits against per-language stopword lists and picks the argmax
    with a fixed tie-break. Pure array expressions — no UDF.
    """
    d = table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))

    def hits(words: tuple[str, ...]) -> Column:
        return F.size(F.filter(tok, lambda x: x.isin(*words))).cast("bigint")

    scored = d.select(
        "doc_id",
        "lang",
        hits(_LANGS["en"]).alias("en_hits"),
        hits(_LANGS["es"]).alias("es_hits"),
        hits(_LANGS["de"]).alias("de_hits"),
        hits(_LANGS["fr"]).alias("fr_hits"),
    )
    en, es, de, fr = (F.col(c) for c in ("en_hits", "es_hits", "de_hits", "fr_hits"))
    return scored.withColumn(
        "pred_lang",
        F.when((en >= es) & (en >= de) & (en >= fr), "en")
        .when((es >= de) & (es >= fr), "es")
        .when(de >= fr, "de")
        .otherwise("fr"),
    )


@query(
    "q_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len({_TOK}) AS BIGINT) AS n_tokens,
             CAST(length(text) AS BIGINT) AS n_chars,
             {_lang_hits_sql(('the', 'a', 'of', 'and'))} AS sw_hits
      FROM documents
    )
    SELECT doc_id, n_tokens,
           round(n_chars / (n_tokens + 1.0), 4) AS avg_token_len,
           round(sw_hits / (n_tokens + 1.0), 4) AS stopword_ratio,
           round(least(n_tokens / 50.0, 1.0) * 0.6
                 + least(sw_hits / (n_tokens + 1.0) * 5.0, 1.0) * 0.4, 4) AS quality
    FROM t
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: length signal + stopword-density signal.

    The standard cheap pre-filter in training-data pipelines (length
    ratios and stopword density à la C4/Gopher rules), as one
    whole-stage-codegen projection.
    """
    d = table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    sw = ("the", "a", "of", "and")
    t = d.select(
        "doc_id",
        F.size(tok).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.size(F.filter(tok, lambda x: x.isin(*sw))).cast("bigint").alias("sw_hits"),
    )
    n_tok = F.col("n_tokens")
    return t.select(
        "doc_id",
        "n_tokens",
        F.round(F.col("n_chars") / (n_tok + 1.0), 4).alias("avg_token_len"),
        F.round(F.col("sw_hits") / (n_tok + 1.0), 4).alias("stopword_ratio"),
        F.round(
            F.least(n_tok / 50.0, F.lit(1.0)) * 0.6
            + F.least(F.col("sw_hits") / (n_tok + 1.0) * 5.0, F.lit(1.0)) * 0.4,
            4,
        ).alias("quality"),
    )


@query(
    "q_doc_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5({NORMALIZE_SQL.format(col='text')}) AS fingerprint
    FROM documents
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-text fingerprint: md5 over normalized text.

    Normalization (lower, strip punct, collapse whitespace) makes the
    fingerprint robust to formatting-only edits — the exact-dedup key for
    q_dedup_exact's normalized variant.
    """
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", F.md5(normalize(F.col("text"))).alias("fingerprint"))
