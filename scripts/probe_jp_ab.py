"""Same-session A/B probe: q_jaccard_prefix_join r14 form vs r15
signature-pruned form, sf0.1, min-of-N with clearCache+gc between
samples (both variants warmed first). Throwaway measurement tooling —
numbers land in OPTIMIZATION_r15.md.
"""
import gc
import sys
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from data_engineering_project_spotify_app_spark.session import get_spark
from data_engineering_project_spotify_app_spark.operators import dedup
from data_engineering_project_spotify_app_spark.operators.rankutil import (
    two_phase_global_rank,
)

SF_DIR = "/root/testdata/sf0.1"
N = 4


def _per_doc_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    sets = (
        dedup._bigram_grams(spark, sf_dir)
        .select("doc_id", "bg")
        .filter(F.size("bg") > 0)
    )
    sh = sets.select("doc_id", F.explode("bg").alias("sh"))
    dfreq = sh.groupBy("sh").agg(F.count("*").alias("df"))
    ranked = two_phase_global_rank(
        dfreq, [F.col("df").asc(), F.col("sh").asc()], 32
    ).select("sh", F.col("rn").cast("bigint").alias("srank"))
    return (
        sh.join(ranked, "sh")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("srank")).alias("ranks"))
        .withColumn("n", F.size("ranks"))
        .withColumn(
            "p",
            F.col("n")
            - F.floor(
                (dedup.JP_T_NUM * F.col("n") + (dedup.JP_T_DEN - 1))
                / dedup.JP_T_DEN
            )
            + 1,
        )
    )


def q_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_doc = _per_doc_old(spark, sf_dir).localCheckpoint(eager=False)
    pref = per_doc.select(
        "doc_id",
        "n",
        F.explode(F.slice("ranks", 1, F.col("p").cast("int"))).alias("srank"),
    ).localCheckpoint(eager=False)
    a = pref.select(
        F.col("srank").alias("srank_a"),
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("na"),
    )
    b = pref.select(
        F.col("srank").alias("srank_b"),
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("nb"),
    )
    cand_ids = (
        a.join(
            b,
            (F.col("srank_a") == F.col("srank_b"))
            & (F.col("doc_a") < F.col("doc_b"))
            & (
                F.least("na", "nb") * dedup.JP_T_DEN
                >= F.greatest("na", "nb") * dedup.JP_T_NUM
            ),
        )
        .select("doc_a", "doc_b")
        .repartition(
            2 * spark.sparkContext.defaultParallelism, "doc_a", "doc_b"
        )
        .distinct()
    )
    ra = per_doc.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("n_a"),
        F.col("ranks").alias("ranks_a"),
    )
    rb = per_doc.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("n_b"),
        F.col("ranks").alias("ranks_b"),
    )
    cand = cand_ids.join(ra, "doc_a").join(rb, "doc_b")
    ni = F.size(F.array_intersect("ranks_a", "ranks_b"))
    union = F.col("n_a") + F.col("n_b") - ni
    return (
        cand.withColumn("ni", ni)
        .filter(F.col("ni") * dedup.JP_T_DEN >= union * dedup.JP_T_NUM)
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("ni") / (F.col("n_a") + F.col("n_b") - F.col("ni")), 4
            ).alias("jaccard"),
        )
    )


def time_variant(spark, fn, label):
    times = []
    for i in range(N):
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext.setJobDescription(f"{label}#{i}")
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    print(f"{label}: min={min(times):.3f} samples={[round(t,3) for t in times]}")
    return min(times)


def main():
    spark = get_spark()
    # warm both variants (JIT + shuffle services) before timing
    q_old(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    dedup.q_jaccard_prefix_join(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    # sanity: identical results
    o = sorted(map(tuple, q_old(spark, SF_DIR).collect()))
    n = sorted(map(tuple, dedup.q_jaccard_prefix_join(spark, SF_DIR).collect()))
    print("rows:", len(o), "identical:", o == n)
    order = sys.argv[1] if len(sys.argv) > 1 else "old_first"
    if order == "old_first":
        t_old = time_variant(spark, q_old, "jp_old")
        t_new = time_variant(spark, dedup.q_jaccard_prefix_join, "jp_new")
    else:
        t_new = time_variant(spark, dedup.q_jaccard_prefix_join, "jp_new")
        t_old = time_variant(spark, q_old, "jp_old")
    print(f"speedup: {t_old / t_new:.2f}x")


if __name__ == "__main__":
    main()
