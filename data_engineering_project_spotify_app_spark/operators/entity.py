"""Entity resolution: blocked fuzzy matching over a name dictionary.

The reference keys everything on exact Spotify ids (app.py:164, 204–208)
— real ingested catalogs don't have clean ids, they have near-identical
name strings. The standard scale recipe: (1) collapse rows to the
DISTINCT-name dictionary with occurrence counts (the dictionary is
orders of magnitude smaller than the row count), (2) self-join the
dictionary only within a cheap blocking key so edit distance never runs
on the full cross product, (3) join survivors back to rows by name.
Steps 1–2 are the operator here; step 3 is an ordinary equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spotify_app_spark.operators.registry import query
from data_engineering_project_spotify_app_spark.tables import table

MAX_EDIT_DISTANCE = 3


@query(
    "q_fuzzy_match",
    oracle=f"""
    WITH names AS (
      SELECT p_name, count(*) AS n_parts FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
           a.n_parts AS n_a, b.n_parts AS n_b
    FROM names a
    JOIN names b
      ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
     AND a.p_name < b.p_name
     AND levenshtein(a.p_name, b.p_name) BETWEEN 1 AND {MAX_EDIT_DISTANCE}
    """,
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part-name pairs: blocked Levenshtein ≤ 3 over the
    distinct-name dictionary.

    Scale: the groupBy collapses the corpus to its name dictionary
    first — edit distance (quadratic per block, not pushdown-able) runs
    on dictionary entries only, and only within a blocking key (the
    first token; production adds more blocks — prefixes, phonetic keys,
    length bands — and unions the candidate sets). The dictionary
    self-join broadcasts its smaller side; at no point does the row-level
    table enter a non-equi join.
    """
    p = table(spark, sf_dir, "part")
    names = p.groupBy("p_name").agg(F.count("*").alias("n_parts"))
    block = F.substring_index(F.col("p_name"), " ", 1)
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("n_parts").alias("n_a"),
        block.alias("block_a"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("n_parts").alias("n_b"),
        block.alias("block_b"),
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(
            b,
            (F.col("block_a") == F.col("block_b"))
            & (F.col("name_a") < F.col("name_b")),
        )
        .filter(dist.between(1, MAX_EDIT_DISTANCE))
        .select(
            "name_a",
            "name_b",
            dist.cast("bigint").alias("dist"),
            "n_a",
            "n_b",
        )
    )
