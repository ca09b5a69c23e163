"""Dataset-construction operators: TF-IDF, sampling, train/test splits.

The remaining staples of a training-data pipeline, all deterministic
and exactly oracle-checked:

- q_tfidf_topterms: per-document top terms by tf-idf — the classic
  relevance weighting, computed relationally (no ml-lib state).
- q_dataset_split: content-hash train/val/test assignment — split
  membership must be a pure function of the key (stable across runs,
  machines, and engine versions), never rand().
- q_stratified_sample: per-stratum deterministic downsampling by hash
  band — the scalable form of "sample 25% of every language".
- q_weighted_sample: Efraimidis–Spirakis weighted sampling without
  replacement via a deterministic md5-derived exponential race.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_engineering_project_spotify_app_spark.functions.text import TOKENS_SQL, tokens
from data_engineering_project_spotify_app_spark.operators.registry import query
from data_engineering_project_spotify_app_spark.tables import table

_TOK = TOKENS_SQL.format(col="text")

TOP_TERMS = 3
SAMPLE_BAND = 4  # keep hash digits 0-3 of 16 → 25% per stratum


@query(
    "q_tfidf_topterms",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, tok AS term, count(*) AS tf
      FROM (SELECT doc_id, unnest({_TOK}) AS tok FROM documents)
      GROUP BY doc_id, tok
    ),
    df AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 4) AS tfidf
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, rnk FROM (
      SELECT doc_id, term, tfidf,
             CAST(row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term
             ) AS BIGINT) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_TERMS}
    """,
)
def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf.

    Scale: tf is one explode+groupBy (map-side combined); df is a
    second aggregate joined back WITHOUT a broadcast hint — vocabulary
    ≪ corpus, but an open web corpus's vocabulary (hapax-heavy) is
    still too large to pin as a mandatory broadcast; AQE broadcasts it
    at runtime while it fits and shuffle-joins co-partitioned on term
    beyond that. The smoothed idf ln((N+1)/(df+1)) keeps everything
    finite.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    # tf has two consumers (df aggregate + idf scoring join): lazy
    # localCheckpoint shares the tokenize+explode+aggregate instead of
    # replaying it per consumer (0.86 → 0.71 s min-of-3 at sf0.1 —
    # same diamond discipline as q_bm25_search). localCheckpoint, not
    # persist: CacheManager pins persist()-ed plans past GC, leaking
    # cached partitions in long-lived sessions (ADVICE r10); checkpoint
    # blocks are GC-reclaimed with the DataFrame.
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = d.count()  # scalar; driver-side by design (one number)
    scored = tf.join(df, "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log((n_docs + 1.0) / (F.col("df") + 1.0)), 4
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= TOP_TERMS)
        .select("doc_id", "term", "tfidf", "rnk")
    )


# split by the FIRST hex digit of md5(doc_id): 16 bands → 12/2/2
_SPLIT_CASE_SQL = """
    CASE
      WHEN band <= 11 THEN 'train'
      WHEN band <= 13 THEN 'val'
      ELSE 'test'
    END
    """


@query(
    "q_dataset_split",
    oracle=f"""
    SELECT doc_id, lang, split, band FROM (
      SELECT doc_id, lang,
             CAST(instr('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                  AS BIGINT) AS band,
             {_SPLIT_CASE_SQL.replace('band', "CAST(instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT)")} AS split
      FROM documents
    )
    """,
)
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (12/2/2 of 16 hash bands).

    Membership is a pure function of the key's content hash — the only
    split discipline that survives re-runs, re-partitioning, engine
    swaps, and incremental data arrival. Never rand(): a nondeterministic
    split leaks test data on every recompute.
    """
    d = table(spark, sf_dir, "documents")
    band = F.expr(
        "CAST(instr('0123456789abcdef', "
        "substring(md5(CAST(doc_id AS STRING)), 1, 1)) - 1 AS BIGINT)"
    )
    split = (
        F.when(F.col("band") <= 11, "train")
        .when(F.col("band") <= 13, "val")
        .otherwise("test")
    )
    return (
        d.select("doc_id", "lang", band.alias("band"))
        .select("doc_id", "lang", split.alias("split"), "band")
    )


@query(
    "q_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE instr('0123456789abcdef',
                substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 < {SAMPLE_BAND}
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~25% sample of every language stratum.

    Hash-band filtering (second md5 digit < 4) — reproducible, join-safe
    (two tables sampled the same way keep matching keys), and pushes as
    a cheap per-row predicate with zero shuffle. The per-stratum rate is
    uniform because the hash is independent of the stratum.
    """
    d = table(spark, sf_dir, "documents")
    keep = (
        F.expr(
            "instr('0123456789abcdef', "
            "substring(md5(CAST(doc_id AS STRING)), 2, 1)) - 1"
        )
        < SAMPLE_BAND
    )
    return d.filter(keep).select("doc_id", "lang")


WSAMPLE_K = 50

# Portable uniform in (0, 1) from the doc_id's md5 — the same
# instr/substr hex→int arithmetic as the MinHash family (dedup.py), so
# Spark SQL and DuckDB evaluate the identical expression text.
def _wsample_key_sql() -> str:
    from data_engineering_project_spotify_app_spark.operators.dedup import (
        _hex2int_sql,
    )

    u = (
        f"(({_hex2int_sql('md5(CAST(doc_id AS VARCHAR))', 1)} + 1.0) "
        "/ 4294967297.0)"
    )
    return f"(-ln({u}) / n_chars)"


@query(
    "q_weighted_sample",
    oracle=f"""
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS weight,
           round({_wsample_key_sql()}, 6) AS sample_key
    FROM documents
    WHERE n_chars > 0
    ORDER BY {_wsample_key_sql()}, doc_id
    LIMIT {WSAMPLE_K}
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006,
    the exponential-race / A-ES form): each document draws a
    deterministic uniform u from its key's md5 and races with key
    -ln(u)/weight (weight = n_chars); the {WSAMPLE_K} smallest keys ARE
    a weighted sample without replacement. The standard primitive for
    source-weighted corpus mixing when per-source quotas must be one
    distributed pass.

    Scale: a pure per-row projection (no shuffle) followed by a
    TakeOrderedAndProject top-k — no global sort, no rand() (the
    uniform is a pure function of the key: stable across runs,
    machines, retries, and engines — the same determinism discipline as
    q_dataset_split). The ORDER BY races on the UNROUNDED key (both
    engines evaluate the identical expression text; only the emitted
    column is rounded, the registry-wide double convention).
    """
    d = table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    key = F.expr(_wsample_key_sql().replace("VARCHAR", "STRING"))
    return (
        d.select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("weight"),
            F.round(key, 6).alias("sample_key"),
            key.alias("_k"),
        )
        .orderBy(F.col("_k").asc(), F.col("doc_id").asc())
        .limit(WSAMPLE_K)
        .drop("_k")
    )


WSAMPLE_PER_SOURCE_K = 10  # == streaming/stateful.RESERVOIR_K


def weighted_sample_per_source(docs: DataFrame, k: int) -> DataFrame:
    """Grouped Efraimidis–Spirakis race: the k smallest -ln(u)/weight
    keys PER SOURCE — the batch twin of weighted_reservoir_stream
    (streaming/stateful.py), sharing the identical race-key expression
    so batch and stream pick the same reservoirs (equivalence pinned in
    tests/test_stateful_streaming.py).

    Scale: one shuffle on ``source`` + a rank-limit window — Spark
    plans the rn<=k filter as WindowGroupLimit (plan-pinned), so every
    map task pre-prunes to its local top-k per source before the
    shuffle: the exchange carries O(k·sources·tasks) rows, not the
    corpus. ``docs`` must carry (doc_id, source, n_chars).
    """
    key = F.expr(_wsample_key_sql().replace("VARCHAR", "STRING"))
    w = Window.partitionBy("source").orderBy(
        F.col("_k").asc(), F.col("doc_id").asc()
    )
    return (
        docs.filter(F.col("n_chars") > 0)
        .select(
            "source",
            "doc_id",
            F.col("n_chars").cast("bigint").alias("weight"),
            key.alias("_k"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "source",
            "doc_id",
            "weight",
            F.round(F.col("_k"), 6).alias("sample_key"),
        )
    )


@query(
    "q_weighted_sample_per_source",
    oracle=f"""
    SELECT source, doc_id, CAST(n_chars AS BIGINT) AS weight,
           round({_wsample_key_sql()}, 6) AS sample_key
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY source
               ORDER BY {_wsample_key_sql()}, doc_id) AS rn
      FROM documents WHERE n_chars > 0
    )
    WHERE rn <= {WSAMPLE_PER_SOURCE_K}
    """,
)
def q_weighted_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weighted sampling without replacement: the A-ES race
    of q_weighted_sample run as a PER-SOURCE quota — the one-pass
    primitive for source-weighted corpus mixing ("10 docs from every
    source, probability ∝ length"). Deterministic md5 uniforms, no
    rand(); the races on the UNROUNDED key with a doc_id tie-break are
    identical expression text in both engines.
    """
    d = table(spark, sf_dir, "documents")
    return weighted_sample_per_source(d, WSAMPLE_PER_SOURCE_K)


TOKEN_BUDGET = 600  # per-source token quota (sf0.01 sources hold ~1.3k)


@query(
    "q_token_budget_sample",
    oracle=f"""
    WITH t AS (
      SELECT source, doc_id,
             CAST(len({_TOK}) AS BIGINT) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS pri
      FROM documents
    ),
    c AS (
      SELECT source, doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY pri, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM t
    )
    SELECT source, doc_id, n_tokens, cum_tokens
    FROM c WHERE cum_tokens <= {TOKEN_BUDGET}
    """,
)
def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source TOKEN-budget sampling — the quota the mixture sheet
    actually specifies ("300B tokens of web, 30B of code"), as opposed
    to the per-source DOC quota of q_weighted_sample_per_source: walk
    each source in a deterministic md5-shuffled order and keep the
    maximal prefix whose running token total stays within the budget.
    Hash-ordering (not length- or quality-ordering) keeps the kept set
    an unbiased sample of the source; swapping the priority column for
    a model score turns the same plan into quality-ranked selection.

    Scale: one shuffle on ``source`` + a PARTITIONED running-sum window
    (each source sorts only its own rows — no global single-partition
    WindowExec, the q_ntile lesson). The priority is a pure function of
    the key: stable across runs, retries, and engines, and the budget
    cut composes with dedup/decontamination upstream because membership
    never depends on partitioning.
    """
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "source",
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("pri"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("pri").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET)
        .select("source", "doc_id", "n_tokens", "cum_tokens")
    )


N_EPOCHS = 3
N_SHARDS = 4


@query(
    "q_epoch_shuffle",
    oracle=f"""
    WITH ep AS (SELECT unnest(generate_series(0, {N_EPOCHS - 1})) AS epoch),
    keyed AS (
      SELECT d.doc_id, ep.epoch,
             md5(CAST(ep.epoch AS VARCHAR) || ':'
                 || CAST(d.doc_id AS VARCHAR)) AS h
      FROM documents d CROSS JOIN ep
    ),
    sharded AS (
      SELECT doc_id, epoch,
             CAST(instr('0123456789abcdef', substr(h, 1, 1)) - 1
                  AS BIGINT) % {N_SHARDS} AS shard,
             h
      FROM keyed
    )
    SELECT doc_id, epoch, shard,
           CAST(row_number() OVER (
             PARTITION BY epoch, shard ORDER BY h, doc_id
           ) AS BIGINT) AS pos
    FROM sharded
    """,
)
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multi-epoch training order: for each epoch, every
    document gets a shard and an intra-shard position derived from
    md5(epoch:doc_id) — a DIFFERENT pseudo-random permutation per epoch
    (the "reshuffle each epoch" training-loader contract) that is a
    pure function of (epoch, doc_id): reproducible across reruns,
    engines, and partitionings, resumable mid-epoch, and auditable
    ("which shard/offset did doc X occupy in epoch 2?").

    Scale: NOT ``row_number() over (partition by epoch, shard)`` — with
    epochs x shards groups that window funnels corpus/shards rows
    through single tasks. Instead the two-phase range-partition global
    rank (rankutil.py) runs ONCE over the composite order (epoch,
    shard, h, doc_id); each group's position is then its global rank
    minus the group's min rank (an epochs-x-shards-row aggregate,
    broadcast back) — every stage parallel regardless of shard count.
    Shard assignment itself is a stateless projection; production
    materializes one epoch at a time (same plan, epoch filter pushed
    onto the generate).
    """
    from data_engineering_project_spotify_app_spark.operators.rankutil import (
        two_phase_global_rank,
    )

    d = table(spark, sf_dir, "documents")
    ep = F.explode(
        F.sequence(F.lit(0), F.lit(N_EPOCHS - 1))
    ).alias("epoch")
    keyed = d.select("doc_id").select("doc_id", ep).select(
        "doc_id",
        "epoch",
        F.md5(
            F.concat_ws(":", F.col("epoch").cast("string"), F.col("doc_id").cast("string"))
        ).alias("h"),
    )
    sharded = keyed.select(
        "doc_id",
        "epoch",
        F.expr(
            f"CAST(instr('0123456789abcdef', substring(h, 1, 1)) - 1 "
            f"AS BIGINT) % {N_SHARDS}"
        ).alias("shard"),
        "h",
    )
    # The ranked frame feeds the per-group min-rank aggregate AND the
    # final join, so the pid rank windows above rankutil's pinned
    # phase-1 re-run once per consumer. Measured r14: pinning the
    # ranked frame too was SLOWER (0.72 -> 0.81 s min-of-4,
    # same-session A/B at sf0.1) — the frame is corpus×epochs rows and
    # materializing it costs more than re-running the local windows
    # over the already-pinned ranged frame. Left unpinned.
    ranked = two_phase_global_rank(
        sharded,
        [F.col("epoch"), F.col("shard"), F.col("h"), F.col("doc_id")],
        max(8, spark.sparkContext.defaultParallelism),
    )
    rn0 = ranked.groupBy("epoch", "shard").agg(
        F.min("rn").alias("rn0")
    )
    return ranked.join(F.broadcast(rn0), ["epoch", "shard"]).select(
        "doc_id",
        "epoch",
        "shard",
        (F.col("rn") - F.col("rn0") + 1).cast("bigint").alias("pos"),
    )
