"""Fixed-character 10x slope harness (round-4 verdict item 5).

Separates ENGINE scaling from corpus-shape change: the sf0.1 tables are
replicated 10x with per-replica-disjoint keys/vocabulary so duplicate
mass, candidate counts, and (where applicable) output rows scale exactly
10x by construction. An operator whose wall time grows ~10x on this step
is linear; a super-linear engine term (accidental cross-replica work,
quadratic candidate growth, collapsing partitions) shows up as a larger
slope.

Usage:
    python tools/slope10x.py                      # the round-5 target set
    python tools/slope10x.py op1 op2 ...          # chosen ops
    python tools/slope10x.py --skew               # mega-basket skew probe

Replication rules (one replica k = 0..9):
- documents: doc_id += k*10^7; every token suffixed `_k` for k >= 1
  (replica 0 keeps the original text so fixed query workloads like
  llm_hybrid_rrf's BM25 terms still match; replicas >= 1 share no tokens
  / grams / shingles with anything else).
- embeddings: vec_id += k*10^7 (vectors repeat; dense scans and
  assignment passes scale in rows, and id tiebreaks keep outputs
  deterministic).
- orders/lineitem: all join keys (orderkey, custkey, partkey, suppkey)
  += k*10^7 — replicas are disjoint subgraphs / item vocabularies.

The 10x fixture is generated under /tmp (TESTDATA is read-only) and
reused across runs of the same session day.

The --skew probe plants one mega-basket (a single synthetic order
holding SKEW_ITEMS distinct parts) into an otherwise-1x lineitem and
times mkt_item_similarity against the unplanted baseline: its pair
stage is Sigma |basket|^2, so one basket of 2000 items adds ~4M pairs —
the harness reports the measured delta so the skew exposure is a
recorded number, not a guess.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/bdma_slope10x"
SKEW_OUT = "/tmp/bdma_slope_skew"
OFFSET = 10_000_000
SKEW_ITEMS = 2000

TARGETS = [
    "llm_hybrid_rrf",
    "llm_embed_pq",
    "graph_label_propagation",
    "llm_containment_join",
    "mkt_item_similarity",
]

RUNS = 3


def build_10x(spark) -> None:
    import pyspark.sql.functions as F

    if os.path.isdir(os.path.join(OUT, "lineitem.parquet")):
        return
    os.makedirs(OUT, exist_ok=True)

    def reps(df, keycols, suffix_text=False):
        parts = []
        for k in range(10):
            r = df
            for c in keycols:
                r = r.withColumn(c, F.col(c) + F.lit(k * OFFSET))
            if suffix_text and k >= 1:
                r = r.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), r"\s+"),
                            lambda t: F.concat(t, F.lit(f"_{k}")),
                        ),
                        " ",
                    ),
                )
            parts.append(r)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out

    reps(
        spark.read.parquet(f"{SRC}/documents.parquet"), ["doc_id"], True
    ).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")
    reps(
        spark.read.parquet(f"{SRC}/embeddings.parquet"), ["vec_id"]
    ).write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")
    reps(
        spark.read.parquet(f"{SRC}/orders.parquet"),
        ["o_orderkey", "o_custkey"],
    ).write.mode("overwrite").parquet(f"{OUT}/orders.parquet")
    reps(
        spark.read.parquet(f"{SRC}/lineitem.parquet"),
        ["l_orderkey", "l_partkey", "l_suppkey"],
    ).write.mode("overwrite").parquet(f"{OUT}/lineitem.parquet")


def build_skew(spark) -> None:
    import pyspark.sql.functions as F

    if os.path.isdir(os.path.join(SKEW_OUT, "lineitem.parquet")):
        return
    os.makedirs(SKEW_OUT, exist_ok=True)
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    mega = (
        spark.range(SKEW_ITEMS)
        .select(
            F.lit(99_000_001).alias("l_orderkey"),
            (F.col("id") + 90_000_000).alias("l_partkey"),
            F.lit(1).cast("long").alias("l_suppkey"),
            (F.col("id") + 1).cast("int").alias("l_linenumber"),
            F.lit(1.0).alias("l_quantity"),
            F.lit(1.0).alias("l_extendedprice"),
            F.lit(0.0).alias("l_discount"),
            F.lit(0.0).alias("l_tax"),
            F.lit("N").alias("l_returnflag"),
            F.lit("O").alias("l_linestatus"),
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias("l_shipdate"),
        )
    )
    li.select(*mega.columns).unionAll(mega).write.mode("overwrite").parquet(
        f"{SKEW_OUT}/lineitem.parquet"
    )


def timed(fn, spark, sf_dir, runs=RUNS):
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 2)


def main() -> None:
    import big_data_management_and_analytics_spark as engine
    from big_data_management_and_analytics_spark.sources.session import get_spark

    engine.load_all()
    registry = engine.all_queries()
    spark = get_spark("slope10x")
    spark.sparkContext.setLogLevel("ERROR")

    if "--skew" in sys.argv:
        build_skew(spark)
        fn = registry["mkt_item_similarity"].fn
        base = timed(fn, spark, SRC)
        skew = timed(fn, spark, SKEW_OUT)
        print(f"mkt_item_similarity  base={base}s  +mega-basket({SKEW_ITEMS} items)={skew}s  delta={round(skew - base, 2)}s")
        spark.stop()
        return

    names = [a for a in sys.argv[1:] if not a.startswith("-")] or TARGETS
    build_10x(spark)
    print(f"| operator | sf0.1 | 10x | slope |")
    print(f"|---|---|---|---|")
    for name in names:
        fn = registry[name].fn
        t1 = timed(fn, spark, SRC)
        t10 = timed(fn, spark, OUT)
        print(f"| `{name}` | {t1} s | {t10} s | {round(t10 / t1, 1)}x |")
    spark.stop()


if __name__ == "__main__":
    main()
