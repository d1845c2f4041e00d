"""Category K (dedup) — exact and near-duplicate detection (SURVEY.md §2.K).

Three tiers of dedup, mirroring a production training-data pipeline:

- exact: content-hash groupBy — embarrassingly parallel, one shuffle.
- near-exact: token-set Jaccard over all pairs — O(n²), the exact
  small-scale reference implementation the MinHash path approximates.
- minhash: MinHash+LSH banding — the 100 TB path: signatures are computed
  per document (linear), candidate pairs come from band-bucket grouping
  (shuffle on band hash), never from a cross join. The hash family is
  xxhash64(seed, token) — a fixed published algorithm, deterministic across
  clusters/sessions; rows-tier, so no cross-engine oracle must reproduce it
  (SURVEY.md §7 hard-item 6).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_management_and_analytics_spark.functions.strings import tokens
from big_data_management_and_analytics_spark.plans.registry import register
from big_data_management_and_analytics_spark.sources.io import load

N_HASHES = 16
BAND_SIZE = 4  # 4 bands × 4 rows


@register(
    "llm_dedup_exact",
    "K",
    oracle="""
        SELECT md5(text) AS content_hash,
               MIN(doc_id) AS keeper_doc_id,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY md5(text)
    """,
    doc="Exact dedup: md5 content hash, keep min doc_id per hash group.",
)
def llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.withColumn("content_hash", F.md5("text"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@register(
    "llm_dedup_near_exact",
    "K",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   list_distinct(string_split_regex(lower(text), '\\s+')) AS tok
            FROM documents
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               ROUND(CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
                     / (len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok))),
                     6) AS jaccard
        FROM toks a JOIN toks b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
              / (len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok))) >= 0.8
    """,
    doc=(
        "Exact pairwise near-dup: token-set Jaccard ≥ 0.8 over all pairs — "
        "the O(n²) reference; llm_dedup_minhash is the scalable path."
    ),
)
def llm_dedup_near_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.array_distinct(tokens(F.col("text"))).alias("tok"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = F.size(F.array_intersect(F.col("a.tok"), F.col("b.tok")))
    union = F.size(F.col("a.tok")) + F.size(F.col("b.tok")) - inter
    jaccard = inter.cast("double") / union
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(jaccard >= 0.8)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jaccard, 6).alias("jaccard"),
        )
    )


@register(
    "llm_dedup_minhash",
    "K",
    doc=(
        "MinHash+LSH near-dup grouping (approximate → rows-tier §2.0.8): "
        "16 min-hashes per doc, 4 bands of 4; docs sharing a band bucket "
        "join a candidate group keyed by the group's min doc_id "
        "(1-hop union). Output is (doc_id, group_rep) — linear in docs, "
        "NOT in pairs: a cluster of k near-identical docs costs k rows, "
        "not k², which is what survives a 100 TB corpus with degenerate "
        "near-dup blocks. Everything is signature pass + two groupBys."
    ),
)
def llm_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # Signature via explode + 16 min-aggregates: every expression here is
    # whole-stage-codegen (higher-order lambdas would evaluate interpreted
    # per element). xxhash64 is a fixed published hash, so signatures are
    # deterministic across clusters/sessions; the seed family is the seed
    # mixed into the hashed tuple.
    words = d.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok")
    )
    sigs = words.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("tok"))).alias(f"s{i}")
            for i in range(N_HASHES)
        ]
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.lit(b),
                    *[F.col(f"s{b * BAND_SIZE + j}") for j in range(BAND_SIZE)],
                ).alias("bucket"),
            )
            for b in range(N_HASHES // BAND_SIZE)
        ]
    )
    banded = sigs.select("doc_id", F.explode(bands).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    # Cluster assignment without pair materialization: each bucket's
    # representative is its min doc_id; each doc's group_rep is the min
    # representative over its buckets (1-hop union — iterate to a fixpoint
    # for full connected components; 1 hop is the standard LSH-dedup pass).
    bucket_rep = banded.groupBy("band", "bucket").agg(
        F.min("doc_id").alias("bucket_rep"), F.count(F.lit(1)).alias("bucket_n")
    )
    return (
        banded.join(bucket_rep, ["band", "bucket"])
        .groupBy("doc_id")
        .agg(
            F.min("bucket_rep").alias("group_rep"),
            F.max("bucket_n").alias("max_bucket_size"),
        )
        .withColumn("is_candidate_dup", F.col("group_rep") < F.col("doc_id"))
    )
