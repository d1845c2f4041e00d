"""Graph analytics over the fixture's purchase graph.

The engine's iterative-DataFrame pattern (bounded lineage via cache +
unpersist, driver-checked convergence — same discipline as
``llm_dedup_components``) applied to the other classic: PageRank.

Determinism: all arithmetic is integer fixed-point at 10^-15 scale —
long division floors deterministically and long sums are exact and
order-independent, so ranks are bit-identical under any partitioning
(the repo's §2.0 partition-invariance rule). Plain double accumulation
would drift with shuffle order, and DECIMAL(38,18) products overflow
Spark's 38-digit cap and silently re-round to a coarse scale (measured:
0.2% mass drift over 10 iterations) — longs do neither.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_management_and_analytics_spark.plans.registry import register
from big_data_management_and_analytics_spark.sources.io import load

# Fixed-point scale: ranks sum to ~SCALE; per-node ranks ≤ SCALE fit a
# long, and the damping step computes mass DIV 100 * 85 (shed two digits
# BEFORE the multiply so 1600 nodes × SCALE × 85 stays < 2^63).
SCALE = 1_000_000_000_000_000  # 1e15


@register(
    "graph_pagerank",
    "G",
    doc=(
        "PageRank over the undirected customer↔supplier purchase graph "
        "(edge = customer ordered a lineitem shipped by supplier; both "
        "directions, so the walk is reversible and no node dangles). "
        "10 power iterations, damping 0.85, in integer fixed-point at "
        "10^-15 scale: floor divisions are deterministic and long sums "
        "exact, so ranks are partition-invariant where double "
        "accumulation would drift (floor loss only ever SHRINKS mass, "
        "bounded by edges·10^-15 per pass — asserted in tests). Per "
        "iteration ONE join rank⋈edges + one dst groupBy — the degree is "
        "folded into the edge table before the loop and the edges cached "
        "pre-partitioned on the join key, so each pass shuffles only the "
        "small rank table; superseded rank tables unpersist immediately "
        "(bounded executor storage, as llm_dedup_components). Rows-tier: "
        "iterative ranking is not single-statement SQL; tests assert "
        "rank-mass conservation and supplier/customer rank separation."
    ),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # Distinct customer↔supplier pairs; tag node ids into one space.
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # Fold the degree into the edge table ONCE (instead of a second join
    # every iteration) and pin its partitioning on the join key so each
    # pass shuffles only the small rank table, never the edges. Explicit
    # count: AQE would coalesce the small fixture shuffle and the join
    # would then re-partition both sides anyway.
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edgew = (
        edges.join(deg, "src")
        .select("src", "dst", "out_deg")
        .repartition(n_parts, "src")
        .cache()
    )
    nodes = deg.select("src")
    n_nodes = nodes.count()
    teleport_fp = (SCALE * 15 // 100) // n_nodes  # (1-α)/n at fixed point

    ranks = nodes.select(
        "src", F.lit(SCALE // n_nodes).cast("long").alias("rank_fp")
    ).cache()
    ranks.count()
    for _ in range(10):
        contribs = edgew.join(ranks, "src").select(
            "dst", F.expr("rank_fp DIV out_deg").alias("w")
        )
        new_ranks = (
            contribs.groupBy(F.col("dst").alias("src"))
            .agg(F.sum("w").alias("in_mass"))
            .select(
                "src",
                (
                    F.lit(teleport_fp) + F.expr("in_mass DIV 100") * 85
                ).cast("long").alias("rank_fp"),
            )
            .cache()
        )
        new_ranks.count()
        ranks.unpersist()
        ranks = new_ranks
    edgew.unpersist()
    is_supp = F.col("src") % 2 == 1
    return ranks.select(
        (F.col("src") / 2).cast("long").alias("node_id"),
        F.when(is_supp, F.lit("supplier")).otherwise(F.lit("customer")).alias(
            "node_type"
        ),
        F.round(F.col("rank_fp") / F.lit(float(SCALE)), 8).alias("pagerank"),
    )
