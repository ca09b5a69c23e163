"""Corpus-curation operators for training-data pipelines.

The reference's pipeline ends at "land clean entity tables"
(app.py:201–220); a 100 TB training-data pipeline continues from there:
remove benchmark contamination, rebalance the source mix, pack documents
into fixed-budget shards, and surface corpus-level term statistics.
These are the north-star extensions (BASELINE.json) beyond the
dedup/similarity ladder in dedup.py / similarity.py — all built-in
DataFrame ops, all DuckDB-oracled.

Scale posture shared by the module:
- the eval/benchmark set is small by definition → its shingles
  broadcast; the corpus side never self-joins;
- shard packing needs a global order → rangepartitioned sort (Spark
  samples boundaries), not a single-task window;
- term statistics are partial-aggregate friendly (explode → groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.functions.text import (
    TOKENS_SQL,
    ngrams_sql,
    tokens,
    word_ngrams,
)
from data_engineering_project_spotify_app_spark.operators.pinutil import pinned
from data_engineering_project_spotify_app_spark.operators.registry import query
from data_engineering_project_spotify_app_spark.tables import table, table_parallel

_TOK = TOKENS_SQL.format(col="text")

# Every doc_id divisible by EVAL_MOD plays the "held-out benchmark" role:
# deterministic, engine-independent, and present at every scale factor.
EVAL_MOD = 50
NGRAM_N = 4
SHARD_CHAR_BUDGET = 50_000


@query(
    "q_decontaminate",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id, {ngrams_sql(_TOK, NGRAM_N)} AS g FROM documents
    ),
    sh AS (
      SELECT doc_id, unnest(g) AS shingle FROM grams
    ),
    eval_sh AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % {EVAL_MOD} = 0
    )
    SELECT s.doc_id, count(DISTINCT s.shingle) AS n_shared
    FROM sh s
    JOIN eval_sh e ON s.shingle = e.shingle
    WHERE s.doc_id % {EVAL_MOD} <> 0
    GROUP BY s.doc_id
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any word
    4-gram with the held-out eval set.

    The standard pre-training hygiene pass (an n-gram-overlap filter):
    docs that leak eval content are reported with their overlap size so
    a downstream filter can drop or down-weight them.

    Scale: the eval set is tiny relative to the corpus, so its distinct
    shingle set builds once and BROADCASTS — the corpus side streams
    through a broadcast hash join with no shuffle of the exploded
    shingles. The corpus is tokenized exactly once (eval docs are a
    filter over the same scan at small SF; at 100 TB the eval set is a
    separate small table and the corpus scan drops the filter).
    """
    d = table_parallel(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.explode(word_ngrams(tokens(F.col("text")), NGRAM_N)).alias("shingle"),
    )
    eval_sh = (
        sh.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select("shingle")
        .distinct()
    )
    return (
        sh.filter(F.col("doc_id") % EVAL_MOD != 0)
        .join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        # word_ngrams is distinct per doc, so a plain count() would do;
        # countDistinct stays robust if the shingler ever goes multiset.
        .agg(F.countDistinct("shingle").alias("n_shared"))
    )


@query(
    "q_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct({_TOK})) AS token FROM documents
    )
    SELECT token, count(*) AS doc_freq
    FROM toks
    GROUP BY token
    ORDER BY doc_freq DESC, token
    LIMIT 20
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: top-20 tokens by document frequency.

    The exact form of the frequent-items statistic used to build
    stopword lists and spot boilerplate contamination. Scale: explode →
    groupBy is partial-aggregate friendly (map-side combine collapses
    each task to its distinct tokens before the shuffle); top-20 runs as
    TakeOrderedAndProject. For a sketched one-pass variant at extreme
    cardinality, see q_approx_distinct's posture — freqItems/CMS drop
    the oracle, so the exact form is the registered one.
    """
    d = table_parallel(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.explode(F.array_distinct(tokens(F.col("text")))).alias("token"),
        )
        .groupBy("token")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), "token")
        .limit(20)
    )


@query(
    "q_pack_shards",
    oracle=f"""
    WITH ordered AS (
      SELECT doc_id, n_chars,
             sum(n_chars) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_chars
      FROM documents
    )
    SELECT CAST((cum_chars - 1) // {SHARD_CHAR_BUDGET} AS BIGINT) AS shard_id,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS shard_chars
    FROM ordered
    GROUP BY 1
    """,
)
def q_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ~fixed-character-budget training shards —
    the 100 TB form: prefix sums without a global single-partition
    window.

    Greedy sequential packing in deterministic doc_id order: shard_id =
    floor-division of the running character total. This is how a corpus
    becomes N roughly-equal tokenizer-ready shards with stable content
    (same input → same shards, a reproducibility requirement for
    training runs).

    Scale: a naive `sum OVER (ORDER BY doc_id)` window coalesces the
    whole corpus into ONE task (Spark global-order windows have no
    partition key). Here instead: phase 1 computes per-range character
    totals (tiny: one row per partition); phase 2 broadcasts their
    running offsets back and each range partition computes its local
    cumulative sum independently — the corpus is never shuffled into a
    single task. Ranges come from `repartitionByRange(doc_id)` so the
    concatenation order is the global doc_id order. The single-window
    toy form is kept as `pack_shards_single_window` for comparison;
    equivalence is pinned in tests/test_curation.py.

    Exactness: shard_id uses integer floor semantics (`F.floor`) to
    match DuckDB's `//` BIGINT floor division — a cast('bigint') on a
    double quotient truncates toward zero and loses exactness past
    2^53 cumulative chars.
    """
    d = table(spark, sf_dir, "documents")
    # range count scales with the cluster, not a constant: one range per
    # core (floor 8 keeps the two-phase shape exercised at toy scale).
    # Phase 1 stays tiny either way — one (pid, total) row per range.
    n_ranges = max(8, spark.sparkContext.defaultParallelism)
    # lazy localCheckpoint: the per-range totals and the local windows
    # must read ONE boundary sampling — the range exchange seeds its
    # sampler per execution, and its two consumers are not guaranteed
    # to reuse one exchange under every config (the r13 invariance
    # sweep caught the un-pinned form misaligning cumulative sums in
    # q_lorenz_curve; rankutil's module docstring has the mechanism)
    ranged = d.repartitionByRange(n_ranges, "doc_id").select(
        "doc_id", "n_chars", F.spark_partition_id().alias("pid")
    ).localCheckpoint(eager=False)
    part_totals = ranged.groupBy("pid").agg(
        F.sum("n_chars").alias("part_chars"),
        F.min("doc_id").alias("lo"),
    )
    offsets = part_totals.select(
        "pid",
        (
            F.sum("part_chars").over(
                Window.orderBy("lo").rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("offset"),
    ).fillna(0, subset=["offset"])
    local_w = (
        Window.partitionBy("pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.join(F.broadcast(offsets), "pid")
        .select(
            "doc_id",
            "n_chars",
            (F.col("offset") + F.sum("n_chars").over(local_w)).alias("cum_chars"),
        )
        .select(
            F.floor((F.col("cum_chars") - 1) / F.lit(SHARD_CHAR_BUDGET))
            .cast("bigint")
            .alias("shard_id"),
            "n_chars",
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("shard_chars"),
        )
    )


def pack_shards_single_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The toy form of q_pack_shards: one global-order running-sum
    window. Spark plans this as a SINGLE task holding the whole corpus
    — fine at bench scale, wrong at 100 TB. Kept only as the
    equivalence witness for the registered two-phase plan."""
    d = table(spark, sf_dir, "documents")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    return (
        d.select("doc_id", "n_chars", F.sum("n_chars").over(w).alias("cum_chars"))
        .select(
            F.floor((F.col("cum_chars") - 1) / F.lit(SHARD_CHAR_BUDGET))
            .cast("bigint")
            .alias("shard_id"),
            "n_chars",
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("shard_chars"),
        )
    )


@query(
    "q_source_weights",
    oracle="""
    WITH per_source AS (
      SELECT lang, source,
             count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM documents
      GROUP BY lang, source
    )
    SELECT lang, source, n_docs, total_chars,
           round(total_chars / sum(total_chars) OVER (), 6) AS char_share,
           round((1.0 / count(*) OVER ())
                 / (total_chars / sum(total_chars) OVER ()), 4) AS mix_weight
    FROM per_source
    """,
)
def q_source_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mix rebalancing weights: how much to up/down-sample each
    (lang, source) stratum to reach a uniform character budget.

    mix_weight > 1 means the stratum is under-represented (sample it
    more); < 1 over-represented. This is the sampling-weight table a
    data-mixing stage consumes (cf. q_stratified_sample, which applies
    per-stratum rates).

    Scale: the corpus collapses to one row per stratum BEFORE any
    window runs — the empty-frame window (sum OVER ()) executes over
    #strata rows, which is trivially small at any corpus size.
    """
    d = table(spark, sf_dir, "documents")
    per_source = d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    w = Window.partitionBy()
    share = F.col("total_chars") / F.sum("total_chars").over(w)
    return per_source.select(
        "lang",
        "source",
        "n_docs",
        "total_chars",
        F.round(share, 6).alias("char_share"),
        F.round((1.0 / F.count("*").over(w)) / share, 4).alias("mix_weight"),
    )


SWEEP_GRID = [0, 8, 16, 32, 64, 128]  # min-token-count thresholds

_SWEEP_ORACLE = f"""
    WITH t0 AS (
      SELECT doc_id, CAST(len({TOKENS_SQL.format(col='text')}) AS BIGINT)
               AS n_tok
      FROM documents
    ),
    nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM t0),
    grid AS (SELECT unnest({SWEEP_GRID}) AS threshold)
    SELECT CAST(grid.threshold AS BIGINT) AS threshold,
           CAST(sum(CASE WHEN t0.n_tok >= grid.threshold THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           round(sum(CASE WHEN t0.n_tok >= grid.threshold
                          THEN 1 ELSE 0 END) / nd.n, 4) AS keep_rate
    FROM t0 CROSS JOIN grid CROSS JOIN nd
    GROUP BY grid.threshold, nd.n
    """


@query("q_threshold_sweep", oracle=_SWEEP_ORACLE)
def q_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-threshold sweep: keep-count and keep-rate of a min-token
    length filter at every grid point, in ONE corpus pass. The curve a
    curation run consults before pinning a cutoff — "how much data does
    raising the floor from 32 to 64 tokens actually cost?" — computed
    without re-scanning per candidate threshold.

    Scale: the per-doc statistic is computed once; the grid (a handful
    of literals) is cross-joined broadcast so each doc row fans out
    |grid| aggregation inputs — map-side partial-aggregated down to
    |grid| rows before the single shuffle. Swap in any registered
    scorer for n_tok; the sweep shape is scorer-independent.
    """
    d = table_parallel(spark, sf_dir, "documents")
    t0 = d.select(
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tok")
    )
    nd = t0.agg(F.count("*").cast("double").alias("n"))
    grid = spark.createDataFrame(
        [(t,) for t in SWEEP_GRID], "threshold bigint"
    )
    return (
        t0.crossJoin(F.broadcast(grid))
        .crossJoin(F.broadcast(nd))
        .groupBy("threshold", "n")
        .agg(
            F.sum(
                F.when(F.col("n_tok") >= F.col("threshold"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_kept")
        )
        .select(
            "threshold",
            "n_kept",
            F.round(F.col("n_kept") / F.col("n"), 4).alias("keep_rate"),
        )
    )


_DIVERSITY_ORACLE = f"""
    WITH tf AS (
      SELECT source, unnest({TOKENS_SQL.format(col='text')}) AS term
      FROM documents
    ),
    cnts AS (
      SELECT source, term, CAST(count(*) AS DOUBLE) AS c
      FROM tf GROUP BY 1, 2
    )
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct_terms,
           round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4) AS entropy
    FROM cnts GROUP BY source
    """


@query("q_source_diversity", oracle=_DIVERSITY_ORACLE)
def q_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical diversity: Shannon entropy of each source's
    term distribution (plus token/vocab counts). The mixing-table
    signal the per-doc metrics can't give — a source can contain zero
    near-dups yet still be lexically narrow (templated boilerplate);
    low entropy argues for down-weighting it regardless of dedup
    survival.

    Single-pass entropy: H = ln(T) - sum(c*ln c)/T over term counts, so
    no totals-then-rejoin second pass — two hash aggregations total
    ((source, term) counts, then per-source) and nothing else.
    """
    d = table_parallel(spark, sf_dir, "documents")
    tf = d.select("source", F.explode(tokens(F.col("text"))).alias("term"))
    cnts = tf.groupBy("source", "term").agg(
        F.count("*").cast("double").alias("c")
    )
    return cnts.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_distinct_terms"),
        F.round(
            F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c"),
            4,
        ).alias("entropy"),
    )


_SNAPDIFF_ORACLE = """
    WITH a AS (
      SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 10 < 8
    ),
    b AS (
      SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 10 >= 2
    ),
    j AS (
      SELECT coalesce(a.source, b.source) AS source,
             CASE WHEN a.doc_id IS NULL THEN 'added'
                  WHEN b.doc_id IS NULL THEN 'removed'
                  ELSE 'retained' END AS status,
             coalesce(b.n_chars, a.n_chars) AS n_chars
      FROM a FULL JOIN b ON a.doc_id = b.doc_id
    )
    SELECT source, status,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars_total
    FROM j GROUP BY 1, 2
    """


@query("q_snapshot_diff", oracle=_SNAPDIFF_ORACLE)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot membership diff: per (source, status) counts and char
    mass of documents added / removed / retained between two corpus
    snapshots — the ingest-health view that complements q_corpus_drift
    (drift watches the token DISTRIBUTION shift; this watches
    MEMBERSHIP churn — a source silently re-crawling everything shows
    100% added+removed here while its distribution barely moves).

    Snapshots are simulated with overlapping hash bands of doc_id
    (the q_incremental_dedup delta-predicate convention); production
    points the two scans at yesterday's and today's landings — same
    plan.

    Scale: one FULL OUTER hash join on the key (the only corpus-sized
    operation; both sides pre-projected to 3 columns) and a
    sources x 3 rollup. No windows, no skew surface beyond the join
    key itself.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    a = d.filter(F.pmod(F.col("doc_id"), F.lit(10)) < 8).select(
        F.col("doc_id").alias("id_a"),
        F.col("source").alias("src_a"),
        F.col("n_chars").alias("nc_a"),
    )
    b = d.filter(F.pmod(F.col("doc_id"), F.lit(10)) >= 2).select(
        F.col("doc_id").alias("id_b"),
        F.col("source").alias("src_b"),
        F.col("n_chars").alias("nc_b"),
    )
    j = a.join(b, F.col("id_a") == F.col("id_b"), "full").select(
        F.coalesce(F.col("src_a"), F.col("src_b")).alias("source"),
        F.when(F.col("id_a").isNull(), "added")
        .when(F.col("id_b").isNull(), "removed")
        .otherwise("retained")
        .alias("status"),
        F.coalesce(F.col("nc_b"), F.col("nc_a")).alias("n_chars"),
    )
    return j.groupBy("source", "status").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars_total"),
    )


MIX_ALPHAS = (0.3, 0.7)

_TEMPMIX_ORACLE = f"""
    WITH per AS (
      SELECT source, CAST(sum(n_chars) AS DOUBLE) AS chars
      FROM documents GROUP BY 1
    ),
    tot AS (SELECT sum(chars) AS t FROM per)
    SELECT source,
           round(per.chars / tot.t, 6) AS raw_share,
           {", ".join(
             "round(pow(per.chars / tot.t, " + str(a) + ") / "
             "(SELECT sum(pow(p2.chars / tot2.t, " + str(a) + ")) "
             "FROM per p2, tot tot2), 6) AS share_a" + str(a).replace('.', '')
             for a in MIX_ALPHAS
           )}
    FROM per, tot
    """


@query("q_temperature_mix", oracle=_TEMPMIX_ORACLE)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing: sampling probability
    p_s proportional to share_s^alpha, renormalized — the standard
    multilingual/multi-source rebalancing knob (alpha = 1 keeps natural
    proportions, alpha -> 0 approaches uniform; 0.3/0.7 are the
    published working points). Complements q_source_weights (which
    targets exactly-uniform): the temperature form trades off
    representation vs fidelity continuously, and the output is the
    multinomial a shard-sampling stage consumes directly.

    Scale: corpus collapses to one row per source before any
    arithmetic; the normalizing sums run over #sources rows.
    """
    d = table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.sum("n_chars").cast("double").alias("chars")
    )
    w = Window.partitionBy()
    share = F.col("chars") / F.sum("chars").over(w)
    out = per.select("source", share.alias("raw_share"))
    cols = [F.col("source"), F.round("raw_share", 6).alias("raw_share")]
    for a in MIX_ALPHAS:
        p = F.pow(F.col("raw_share"), F.lit(a))
        cols.append(
            F.round(p / F.sum(p).over(w), 6).alias(
                f"share_a{str(a).replace('.', '')}"
            )
        )
    return out.select(*cols)


_QNORM_ORACLE = """
    WITH s AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS r,
             count(*) OVER (PARTITION BY source) AS ns
      FROM documents
    ),
    g AS (
      SELECT n_chars AS val,
             row_number() OVER (ORDER BY n_chars, doc_id) AS gr
      FROM documents
    ),
    nn AS (SELECT count(*) AS n FROM documents),
    p AS (
      SELECT doc_id, source, n_chars,
             CASE WHEN ns = 1 THEN 0.5
                  ELSE (r - 1.0) / (ns - 1.0) END AS pct
      FROM s
    ),
    pos AS (
      SELECT p.*, 1.0 + p.pct * (nn.n - 1.0) AS pos FROM p CROSS JOIN nn
    )
    SELECT pos.doc_id, pos.source,
           CAST(pos.n_chars AS BIGINT) AS n_chars,
           round(pos.pct, 6) AS pct,
           round(lo.val + (pos.pos - floor(pos.pos)) * (hi.val - lo.val), 4)
             AS normalized
    FROM pos
    JOIN g lo ON lo.gr = CAST(floor(pos.pos) AS BIGINT)
    JOIN g hi ON hi.gr = CAST(ceil(pos.pos) AS BIGINT)
    """


@query("q_quantile_normalize", oracle=_QNORM_ORACLE)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization across sources: map each document's
    length onto the GLOBAL length distribution at its WITHIN-SOURCE
    percentile — after it, every source has the same marginal
    distribution (the microarray-normalization trick, standard for
    making per-source quality/length scores comparable before a global
    threshold is applied; the cross-source twin of q_robust_scale's
    per-source winsorized z).

    Scale-safe ranking, zero data-sized windows:
    - ONE two-phase global rank over the composite key (source,
      n_chars, doc_id) yields within-source ranks after subtracting
      each source's broadcast min-rank (the q_epoch_shuffle pattern —
      a per-source window would funnel corpus/|sources| through one
      task);
    - a SECOND two-phase rank over (n_chars, doc_id) gives the global
      order; the percentile position interpolates between the two
      bracketing globally-ranked values via two integer-rank joins
      (shuffle joins on a dense bigint key — co-partitioned, no skew).
    """
    from data_engineering_project_spotify_app_spark.operators.rankutil import (
        two_phase_global_rank,
    )

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    # Within-source rank from ONE composite-key global rank.
    # comp feeds the per-source offset aggregate AND the percentile
    # join; g feeds both interpolation sides (lo/hi). rankutil pins
    # only its phase-1 ranged frame, so the rank windows above it
    # re-ran once per consumer (before-plan: 26 exchanges / 16 RDD
    # scans). Both frames are corpus-sized but narrow — lazy pins
    # halve the window work (guide §2.4).
    comp = pinned(
        two_phase_global_rank(
            d, [F.col("source"), F.col("n_chars"), F.col("doc_id")], 8
        ).withColumnRenamed("rn", "crn")
    )
    src_off = comp.groupBy("source").agg(
        F.min("crn").alias("min_rn"), F.count("*").alias("ns")
    )
    p = (
        comp.join(F.broadcast(src_off), "source")
        .withColumn("r", F.col("crn") - F.col("min_rn") + 1)
        .withColumn(
            "pct",
            F.when(F.col("ns") == 1, F.lit(0.5)).otherwise(
                (F.col("r") - 1.0) / (F.col("ns") - 1.0)
            ),
        )
        .select("doc_id", "source", "n_chars", "pct", "n")
    )
    # Global order of values for the interpolation lookup.
    g = pinned(
        two_phase_global_rank(
            d.select(F.col("n_chars").alias("val"), "doc_id"),
            [F.col("val"), F.col("doc_id")],
            8,
        ).select("val", F.col("rn").alias("gr"))
    )
    pos = F.lit(1.0) + F.col("pct") * (F.col("n") - F.lit(1.0))
    lo = g.select(F.col("gr").alias("lo_gr"), F.col("val").alias("lo_val"))
    hi = g.select(F.col("gr").alias("hi_gr"), F.col("val").alias("hi_val"))
    return (
        p.withColumn("pos", pos)
        .withColumn("lo_gr", F.floor("pos").cast("bigint"))
        .withColumn("hi_gr", F.ceil("pos").cast("bigint"))
        .join(lo, "lo_gr")
        .join(hi, "hi_gr")
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.round("pct", 6).alias("pct"),
            F.round(
                F.col("lo_val")
                + (F.col("pos") - F.floor("pos"))
                * (F.col("hi_val") - F.col("lo_val")),
                4,
            ).alias("normalized"),
        )
    )


_MI_ORACLE = """
    WITH c AS (
      SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2
    ),
    nn AS (SELECT sum(n) AS total FROM c),
    ms AS (SELECT source, sum(n) AS ns FROM c GROUP BY 1),
    ml AS (SELECT lang, sum(n) AS nl FROM c GROUP BY 1)
    SELECT c.source, c.lang,
           CAST(c.n AS BIGINT) AS n,
           round(ln(c.n * 1.0 * nn.total / (ms.ns * ml.nl)), 6) AS pmi,
           round((c.n * 1.0 / nn.total)
                 * ln(c.n * 1.0 * nn.total / (ms.ns * ml.nl)), 6)
             AS mi_contribution
    FROM c
    JOIN ms ON ms.source = c.source
    JOIN ml ON ml.lang = c.lang
    CROSS JOIN nn
    """


@query("q_source_lang_mi", oracle=_MI_ORACLE)
def q_source_lang_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-information decomposition of the source × language
    contingency table: per cell, the pointwise MI and its contribution
    p(s,l)·ln(p(s,l)/p(s)p(l)) — summing the last column gives
    MI(source; lang), the confounding screen run before attributing a
    quality difference to "source" when it is really "language" (the
    categorical twin of q_cooccurrence_pmi's term-pair PMI).

    Scale: one partial-aggregated pass to the |sources|×|langs| table;
    marginals and the total are broadcast-sized re-aggregations of it.
    Zero cells are absent (observed-support convention, matching the
    oracle row-for-row); their p·ln p → 0 contribution is the correct
    limit anyway.
    """
    # The contingency table feeds the total, both marginals, and the
    # final join — unpinned, each consumer re-ran the documents scan +
    # groupBy. |sources|×|langs| rows — pin it (guide §2.4).
    c = (
        table(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )
    nn = c.agg(F.sum("n").alias("total"))
    ms = c.groupBy("source").agg(F.sum("n").alias("ns"))
    ml = c.groupBy("lang").agg(F.sum("n").alias("nl"))
    pmi = F.log(F.col("n") * F.col("total") / (F.col("ns") * F.col("nl")))
    return (
        c.join(F.broadcast(ms), "source")
        .join(F.broadcast(ml), "lang")
        .crossJoin(F.broadcast(nn))
        .select(
            "source",
            "lang",
            F.col("n").cast("bigint").alias("n"),
            F.round(pmi, 6).alias("pmi"),
            F.round((F.col("n") / F.col("total")) * pmi, 6).alias(
                "mi_contribution"
            ),
        )
    )


_ZIPF_ORACLE = f"""
    WITH tf AS (
      SELECT t.tok, count(*) AS freq
      FROM (SELECT unnest({TOKENS_SQL.format(col='text')}) AS tok
            FROM documents) t
      GROUP BY 1
    ),
    ranked AS (
      SELECT freq,
             row_number() OVER (ORDER BY freq DESC, tok) AS rnk
      FROM tf
    )
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           round(regr_slope(ln(CAST(freq AS DOUBLE)),
                            ln(CAST(rnk AS DOUBLE))), 6) AS zipf_exponent,
           round(regr_intercept(ln(CAST(freq AS DOUBLE)),
                                ln(CAST(rnk AS DOUBLE))), 6) AS intercept,
           round(regr_r2(ln(CAST(freq AS DOUBLE)),
                         ln(CAST(rnk AS DOUBLE))), 6) AS r2
    FROM ranked
    """


@query("q_zipf_fit", oracle=_ZIPF_ORACLE)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS of ln(frequency)
    on ln(rank) — natural text sits near exponent −1 with high r²;
    synthetic, templated, or spam-heavy corpora bend the curve, which
    makes this single row a cheap corpus-health fingerprint (and the
    law behind every "cap the stop-head" heuristic in the dedup/PMI
    family).

    Scale: term counting is the standard explode→partial-agg; the
    frequency ranking is the TWO-PHASE global rank (rankutil.py — a
    vocabulary is millions of rows at 100 TB, so no single-partition
    window), and the fit is the one-pass closed-form regr_* aggregate
    over (ln rank, ln freq). Rank ties broken by token so both engines
    rank identically.
    """
    from data_engineering_project_spotify_app_spark.operators.rankutil import (
        two_phase_global_rank,
    )

    d = table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    ranked = two_phase_global_rank(
        tf, [F.col("freq").desc(), F.col("tok")], 8
    )
    lr = F.log(F.col("rn").cast("double"))
    lf = F.log(F.col("freq").cast("double"))
    return ranked.agg(
        F.count("*").alias("n_terms"),
        F.round(F.regr_slope(lf, lr), 6).alias("zipf_exponent"),
        F.round(F.regr_intercept(lf, lr), 6).alias("intercept"),
        F.round(F.regr_r2(lf, lr), 6).alias("r2"),
    )


_HEAPS_ORACLE = f"""
    WITH firsts AS (
      SELECT t.tok, min(t.doc_id) AS first_doc
      FROM (SELECT doc_id, unnest({TOKENS_SQL.format(col='text')}) AS tok
            FROM documents) t
      GROUP BY 1
    ),
    nn AS (SELECT max(doc_id) AS mx FROM documents),
    grid AS (SELECT unnest(generate_series(1, 10)) AS decile)
    SELECT CAST(g.decile AS INT) AS decile,
           CAST(count(CASE WHEN f.first_doc <= nn.mx * g.decile / 10.0
                           THEN 1 END) AS BIGINT) AS vocab_size
    FROM grid g, nn, firsts f
    GROUP BY 1
    """


@query("q_heaps_law", oracle=_HEAPS_ORACLE)
def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: distinct vocabulary size
    after each tenth of the corpus (by doc_id order) — sublinear growth
    (V ≈ K·Nᵝ, β < 1) is the natural-text signature; a FLAT curve
    means a closed template vocabulary, a LINEAR one means ids/noise
    minting new "words" forever (both are curation red flags; pairs
    with q_zipf_fit's frequency view).

    Scale: vocabulary first-occurrence is ONE min-aggregate per token
    (map-side combined); the curve is a 10-bucket conditional count
    over the (token, first_doc) frame — no per-prefix re-scan of the
    corpus, which is the naive formulation's N²/10 trap.
    """
    d = table(spark, sf_dir, "documents")
    firsts = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    mx = d.agg(F.max("doc_id").alias("mx"))
    deciles = d.sparkSession.range(1, 11).select(
        F.col("id").cast("int").alias("decile")
    )
    return (
        firsts.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(deciles))
        .groupBy("decile")
        .agg(
            F.count(
                F.when(
                    F.col("first_doc")
                    <= F.col("mx") * F.col("decile") / F.lit(10.0),
                    1,
                )
            ).alias("vocab_size")
        )
    )


TERM_BURST_TOP_K = 20


_TERM_BURST_ORACLE = f"""
    WITH occ AS (
      SELECT doc_id, t.tok, count(*) AS k
      FROM (SELECT doc_id, unnest({TOKENS_SQL.format(col='text')}) AS tok
            FROM documents) t
      GROUP BY 1, 2
    ),
    stats AS (
      SELECT tok, sum(k) AS tf, count(*) AS df FROM occ GROUP BY 1
    )
    SELECT tok AS term,
           CAST(tf AS BIGINT) AS tf,
           CAST(df AS BIGINT) AS df,
           round((tf - df) * 1.0 / tf, 4) AS repeat_rate,
           round(tf * 1.0 / df, 4) AS mean_burst
    FROM stats
    ORDER BY tf DESC, tok
    LIMIT {TERM_BURST_TOP_K}
    """


@query("q_term_burstiness", oracle=_TERM_BURST_ORACLE)
def q_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word burstiness (Church & Gale): for the {TERM_BURST_TOP_K} most
    frequent terms, how much usage CLUMPS — repeat_rate = share of
    occurrences that are repeats within a document, mean_burst = mean
    occurrences per containing document. Content words burst (a doc
    about a topic repeats its nouns); function words scatter — the
    distinction TF-IDF exploits, measured directly, and the reason a
    per-doc cap on term counts (BM25's k1 saturation) exists.

    Scale: one (doc, term) pre-aggregate off the explode (map-side
    combined), one term-level re-aggregate, TakeOrdered top-k.
    """
    d = table(spark, sf_dir, "documents")
    occ = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("k"))
    )
    stats = occ.groupBy("tok").agg(
        F.sum("k").alias("tf"), F.count("*").alias("df")
    )
    return (
        stats.select(
            F.col("tok").alias("term"),
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            F.round((F.col("tf") - F.col("df")) / F.col("tf"), 4).alias(
                "repeat_rate"
            ),
            F.round(F.col("tf") / F.col("df"), 4).alias("mean_burst"),
        )
        .orderBy(F.col("tf").desc(), "term")
        .limit(TERM_BURST_TOP_K)
    )


TRENDING_TOP_K = 15


_TRENDING_ORACLE = f"""
    WITH halves AS (
      SELECT doc_id <= (SELECT max(doc_id) / 2 FROM documents) AS is_old,
             unnest({TOKENS_SQL.format(col='text')}) AS tok
      FROM documents
    ),
    c AS (
      SELECT tok,
             sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS n_old,
             sum(CASE WHEN NOT is_old THEN 1 ELSE 0 END) AS n_new
      FROM halves GROUP BY 1
    ),
    tot AS (SELECT sum(n_old) AS t_old, sum(n_new) AS t_new FROM c)
    SELECT tok AS term,
           CAST(n_old AS BIGINT) AS n_old,
           CAST(n_new AS BIGINT) AS n_new,
           round(ln(((n_new + 1.0) / (tot.t_new + 2.0))
                    / ((n_old + 1.0) / (tot.t_old + 2.0))), 6)
             AS log_odds_shift
    FROM c, tot
    ORDER BY ln(((n_new + 1.0) / (tot.t_new + 2.0))
                / ((n_old + 1.0) / (tot.t_old + 2.0))) DESC, tok
    LIMIT {TRENDING_TOP_K}
    """


@query("q_trending_terms", oracle=_TRENDING_ORACLE)
def q_trending_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending vocabulary: the {TRENDING_TOP_K} terms with the largest
    Laplace-smoothed log-odds shift from the corpus's first half to
    its second (by doc_id order — the ingest-time axis) — the TEMPORAL
    twin of q_source_keywords' cross-source contrast, and the
    term-level explanation behind a q_corpus_drift alarm ("drifted
    toward WHAT?").

    Scale: one explode→(term, half) conditional aggregate (map-side
    combined), broadcast totals, TakeOrdered top-k on the UNROUNDED
    score with a term tie-break.
    """
    d = table(spark, sf_dir, "documents")
    mid = d.agg((F.max("doc_id") / 2).alias("mid"))
    halves = (
        d.crossJoin(F.broadcast(mid))
        .select(
            (F.col("doc_id") <= F.col("mid")).alias("is_old"),
            F.explode(tokens(F.col("text"))).alias("tok"),
        )
    )
    # The per-term half counts feed the totals scalar AND the scored
    # output; unpinned, the corpus explode + aggregate ran twice.
    # Vocab-sized — pin it (guide §2.4).
    c = halves.groupBy("tok").agg(
        F.sum(F.when(F.col("is_old"), 1).otherwise(0)).alias("n_old"),
        F.sum(F.when(~F.col("is_old"), 1).otherwise(0)).alias("n_new"),
    ).localCheckpoint(eager=False)
    tot = c.agg(
        F.sum("n_old").alias("t_old"), F.sum("n_new").alias("t_new")
    )
    score = F.log(
        ((F.col("n_new") + 1.0) / (F.col("t_new") + 2.0))
        / ((F.col("n_old") + 1.0) / (F.col("t_old") + 2.0))
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            F.col("tok").alias("term"),
            F.col("n_old").cast("bigint").alias("n_old"),
            F.col("n_new").cast("bigint").alias("n_new"),
            F.round(score, 6).alias("log_odds_shift"),
            score.alias("_s"),
        )
        .orderBy(F.col("_s").desc(), "term")
        .limit(TRENDING_TOP_K)
        .drop("_s")
    )


_EFFECTIVE_VOCAB_ORACLE = f"""
    WITH tf AS (
      SELECT t.tok, count(*) AS c
      FROM (SELECT unnest({TOKENS_SQL.format(col='text')}) AS tok
            FROM documents) t
      GROUP BY 1
    ),
    agg AS (
      SELECT count(*) AS v,
             sum(c) AS t,
             ln(sum(c)) - sum(c * ln(c)) / sum(c) AS h
      FROM tf
    )
    SELECT CAST(v AS BIGINT) AS vocab_size,
           CAST(t AS BIGINT) AS n_tokens,
           round(h, 6) AS unigram_entropy,
           round(exp(h), 4) AS effective_vocab,
           round(exp(h) / v, 6) AS vocab_efficiency
    FROM agg
    """


@query("q_effective_vocab", oracle=_EFFECTIVE_VOCAB_ORACLE)
def q_effective_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus unigram entropy and EFFECTIVE vocabulary exp(H) — the
    perplexity of the unigram distribution: how many equally-likely
    terms the corpus behaves as if it had (Zipf head-heaviness makes
    exp(H) ≪ |V|; efficiency exp(H)/|V| near 1 means a flat, likely
    synthetic distribution). One corpus-health scalar that moves when
    templated text floods in, complementing q_zipf_fit's slope and
    q_source_diversity's source-level entropy (same
    H = ln T − Σc·ln c / T single-pass form).

    Scale: one explode→count aggregate, one moment row.
    """
    d = table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    h = F.log(F.sum("c")) - F.sum(
        F.col("c") * F.log(F.col("c"))
    ) / F.sum("c")
    return tf.agg(
        F.count("*").alias("vocab_size"),
        F.sum("c").alias("n_tokens"),
        F.round(h, 6).alias("unigram_entropy"),
        F.round(F.exp(h), 4).alias("effective_vocab"),
        F.round(F.exp(h) / F.count("*"), 6).alias("vocab_efficiency"),
    )
