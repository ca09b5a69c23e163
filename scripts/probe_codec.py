"""Shuffle-codec A/B (VERDICT r14 item 4): time a shuffle-heavy query
subset under spark.io.compression.codec=<argv[1]> in a fresh process
(core conf — cannot flip inside a session). Same protocol as the other
probes: warm every query once, then min-of-3 with clearCache+gc between
samples. Prints one JSON line; compare runs of this script launched
with different codecs.

Usage: python scripts/probe_codec.py lz4|zstd [zstd_level]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_project_spotify_app_spark.operators import registry
from data_engineering_project_spotify_app_spark.session import get_spark

QUERIES = [
    # top of the committed 32-core map + the shuffle-dominated families
    "q_bpe_encode",
    "q_lsh_calibration",
    "q_ann_recall_report",
    "q_ann_ivf_adc",
    "q_abc_classification",
    "q_association_rules",
    "q_item_cf",
    "q_price_index",
    "q_triangle_count",
    "q_curation_funnel",
    "q_jaccard_prefix_join",
    "q_pq_adc_topk",
    "q_rrf_fusion",
    "q_cluster_size_histogram",
    "q_dedup_savings",
]
N = 3


def main() -> None:
    codec = sys.argv[1] if len(sys.argv) > 1 else "lz4"
    extra = {"spark.io.compression.codec": codec}
    if len(sys.argv) > 2:
        extra["spark.io.compression.zstd.level"] = sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all_modules()
    spark = get_spark(app_name=f"codec_probe_{codec}", extra_conf=extra)
    assert spark.conf.get("spark.io.compression.codec") == codec
    noop = lambda df: df.write.format("noop").mode("overwrite").save()
    for name in QUERIES:  # warm: landings, codegen, JIT
        noop(registry.QUERIES[name](spark, sf_dir))
    out: dict[str, float] = {}
    for name in QUERIES:
        best = 1e18
        for i in range(N):
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext.setJobDescription(f"{codec}:{name}#{i}")
            t0 = time.perf_counter()
            noop(registry.QUERIES[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    print(
        json.dumps(
            {"codec": codec, "total": round(sum(out.values()), 3), "queries": out}
        )
    )


if __name__ == "__main__":
    main()
