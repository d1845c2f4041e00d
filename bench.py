"""Benchmark runner (driver contract: one JSON line on stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Protocol per
BASELINE.md: one warm-up run, then median of 3 timed runs on a warm
session; `value` is the sum of per-query medians.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "scan_pushdown_filter",   # scan + pushdown
    "agg_pricing_summary",    # flagship hash agg
    "join_star_5way",         # fact-fact + broadcast dims
    "win_topk_per_group",     # window family
    "win_running_sum",        # window family (frames)
    "stream_tumbling_batch",  # time-window agg
    "llm_text_tfidf",         # text pipeline (explode + joins + window)
    "llm_sim_knn",            # vector search brute-force
    "llm_dedup_minhash",      # scalable near-dup (signatures + banding)
    "tpch_q3_shipping",       # composite pipeline: 3-way join + top-k
    "tpch_q18_bigorders",     # composite pipeline: pre-agg + HAVING + dims
    "llm_dedup_components",   # iterative min-label propagation (cache loop)
    "llm_embed_pca",          # Arrow partial-covariance + driver eigensolve
    "llm_dedup_near_exact",   # O(n²) exact Jaccard baseline (parallelized BNLJ)
    "tpch_q9_profit",         # 5-way join, 3 broadcast dims, nation-year agg
    "tpch_q21_waiting",       # decorrelated EXISTS pair (per-order agg reuse)
    "llm_contamination_bloom",# bloom build + codegen probe (100 TB plan form)
]

RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import big_data_management_and_analytics_spark as engine
    from big_data_management_and_analytics_spark.sources.session import get_spark

    engine.load_all()
    registry = engine.all_queries()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry[name].fn
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm-up
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)

    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
