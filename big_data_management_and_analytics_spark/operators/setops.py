"""Category G — set operations (SURVEY.md §2.G)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_management_and_analytics_spark.plans.registry import register
from big_data_management_and_analytics_spark.sources.io import load


def _urgent(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_custkey", "o_orderpriority")
    )


def _high(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "2-HIGH")
        .select("o_orderkey", "o_custkey", "o_orderpriority")
    )


@register(
    "set_union_all",
    "G",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderpriority FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
    doc="Bag union (UNION ALL) — no shuffle, pure concatenation.",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _urgent(spark, sf_dir).union(_high(spark, sf_dir))


@register(
    "set_union_distinct",
    "G",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION
        SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
    doc="Set union (UNION) — concatenation + hash-distinct.",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _urgent(spark, sf_dir).select("o_custkey")
    b = _high(spark, sf_dir).select("o_custkey")
    return a.union(b).distinct()


@register(
    "set_intersect",
    "G",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
    doc="INTERSECT — customers placing both urgent and high-priority orders.",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _urgent(spark, sf_dir).select("o_custkey")
    b = _high(spark, sf_dir).select("o_custkey")
    return a.intersect(b)


@register(
    "set_except",
    "G",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
    doc="EXCEPT (distinct) — urgent-only customers.",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _urgent(spark, sf_dir).select("o_custkey")
    b = _high(spark, sf_dir).select("o_custkey")
    return a.subtract(b)


@register(
    "set_union_by_name",
    "G",
    oracle="""
        SELECT c_custkey AS entity_id, c_name AS entity_name, 'customer' AS kind
        FROM customer
        UNION ALL
        SELECT s_suppkey AS entity_id, s_name AS entity_name, 'supplier' AS kind
        FROM supplier
    """,
    doc="Schema-aligned union by column NAME (inputs built in different order).",
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("entity_name"),
        F.lit("customer").alias("kind"),
    )
    # Deliberately different column order — unionByName must realign.
    s = load(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_name").alias("entity_name"),
        F.col("s_suppkey").alias("entity_id"),
    )
    return c.unionByName(s)


@register(
    "set_intersect_all",
    "G",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
    doc=(
        "Bag intersection (INTERSECT ALL): customers kept once per "
        "min(urgent-count, high-count) occurrence — multiplicity-preserving, "
        "unlike set_intersect."
    ),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _urgent(spark, sf_dir).select("o_custkey")
    b = _high(spark, sf_dir).select("o_custkey")
    return a.intersectAll(b)


@register(
    "set_except_all",
    "G",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
    doc=(
        "Bag difference (EXCEPT ALL): keeps max(urgent-count − high-count, "
        "0) copies per customer — the multiplicity-preserving complement "
        "of set_except."
    ),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _urgent(spark, sf_dir).select("o_custkey")
    b = _high(spark, sf_dir).select("o_custkey")
    return a.exceptAll(b)


@register(
    "cdc_apply_changes",
    "G",
    oracle="""
        WITH changes AS (
            SELECT CASE WHEN c_custkey % 10 = 2 THEN c_custkey + 1000000
                        ELSE c_custkey END AS key,
                   CASE WHEN c_custkey % 10 = 0 THEN 'D'
                        WHEN c_custkey % 10 = 1 THEN 'U'
                        ELSE 'I' END AS op,
                   c_name,
                   CASE WHEN c_custkey % 10 = 1 THEN c_acctbal + 100
                        ELSE c_acctbal END AS c_acctbal
            FROM customer
            WHERE c_custkey % 10 < 3
        ),
        survivors AS (
            SELECT c_custkey AS key, c_name, c_acctbal
            FROM customer
            WHERE c_custkey NOT IN (SELECT key FROM changes WHERE op IN ('D','U'))
        )
        SELECT key, c_name, c_acctbal FROM survivors
        UNION ALL
        SELECT key, c_name, c_acctbal FROM changes WHERE op IN ('I','U')
    """,
    doc=(
        "CDC changelog application (the MERGE INTO pattern without a "
        "transactional table format): a derived I/U/D changelog applies "
        "onto the customer base - deletes and updates anti-join the base "
        "on key, then upserts union in. One shuffle on the merge key; at "
        "100 TB both sides bucket on key so the anti-join and union are "
        "co-partitioned. Composes with win_dedup_latest (changelog "
        "compaction) for multi-version feeds."
    ),
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    mod = F.col("c_custkey") % 10
    changes = (
        c.filter(mod < 3)
        .select(
            F.when(mod == 2, F.col("c_custkey") + 1000000)
            .otherwise(F.col("c_custkey"))
            .alias("key"),
            F.when(mod == 0, F.lit("D"))
            .when(mod == 1, F.lit("U"))
            .otherwise(F.lit("I"))
            .alias("op"),
            "c_name",
            F.when(mod == 1, F.col("c_acctbal") + 100)
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
        )
    )
    tombstones = changes.filter(F.col("op").isin("D", "U")).select("key")
    survivors = c.join(
        tombstones, c.c_custkey == tombstones.key, "left_anti"
    ).select(F.col("c_custkey").alias("key"), "c_name", "c_acctbal")
    upserts = changes.filter(F.col("op").isin("I", "U")).select(
        "key", "c_name", "c_acctbal"
    )
    return survivors.unionByName(upserts)


@register(
    "cdc_incremental_agg",
    "G",
    oracle="""
        WITH applied AS (
            SELECT o_orderpriority,
                   CASE WHEN o_orderkey % 100 = 1 THEN o_totalprice + 50
                        ELSE o_totalprice END AS price
            FROM orders
            WHERE o_orderkey % 100 <> 0
            UNION ALL
            SELECT o_orderpriority, 100.0 AS price
            FROM orders WHERE o_orderkey % 100 = 2
        )
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM applied
        GROUP BY o_orderpriority
    """,
    doc=(
        "Incremental materialized-view maintenance: a per-priority "
        "count/sum view is maintained from a derived I/U/D changelog "
        "(okey%100: 0=delete, 1=update price+50, 2=insert a $100 order) "
        "by aggregating SIGNED deltas (-1/-old for D, +diff for U, "
        "+1/+new for I) and merging them into the stored view with one "
        "same-key union+re-aggregate — the base is NOT rescanned. The "
        "oracle applies the changelog row-wise and recomputes from "
        "scratch, proving delta maintenance ≡ full recompute. All money "
        "in integer cents; at 100 TB the delta side is the day's "
        "changelog while the base aggregate is O(groups)."
    ),
)
def cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_management_and_analytics_spark.plans.determinism import cents

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    # The stored view (in production: read back, not recomputed).
    base = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("dn"),
        F.sum(cents("o_totalprice")).alias("dc"),
    )
    mod = F.col("o_orderkey") % 100
    # Signed per-row deltas straight off the changelog.
    deltas = o.filter(mod.isin(0, 1, 2)).select(
        "o_orderpriority",
        F.when(mod == 0, F.lit(-1)).when(mod == 1, F.lit(0)).otherwise(1).alias(
            "dn"
        ),
        F.when(mod == 0, -cents("o_totalprice"))
        .when(mod == 1, F.lit(5000))
        .otherwise(F.lit(10000))
        .cast("long")
        .alias("dc"),
    )
    delta_agg = deltas.groupBy("o_orderpriority").agg(
        F.sum("dn").alias("dn"), F.sum("dc").alias("dc")
    )
    return (
        base.unionByName(delta_agg)
        .groupBy("o_orderpriority")
        .agg(F.sum("dn").alias("n_orders"), F.sum("dc").alias("c"))
        .filter(F.col("n_orders") > 0)
        .select(
            "o_orderpriority",
            "n_orders",
            (F.col("c") / 100.0).cast("double").alias("total_price"),
        )
    )


@register(
    "cdc_snapshot_diff",
    "G",
    oracle="""
        WITH v1 AS (
            SELECT c_custkey, c_name, c_acctbal
            FROM customer WHERE c_custkey % 17 <> 3
        ),
        v2 AS (
            SELECT c_custkey, c_name,
                   CASE WHEN c_custkey % 7 = 2 THEN c_acctbal + 10.0
                        ELSE c_acctbal END AS c_acctbal
            FROM customer WHERE c_custkey % 13 <> 5
        )
        SELECT COALESCE(v1.c_custkey, v2.c_custkey) AS c_custkey,
               CASE WHEN v1.c_custkey IS NULL THEN 'I'
                    WHEN v2.c_custkey IS NULL THEN 'D'
                    ELSE 'U' END AS op,
               v1.c_acctbal AS old_acctbal,
               v2.c_acctbal AS new_acctbal
        FROM v1 FULL OUTER JOIN v2 USING (c_custkey)
        WHERE v1.c_custkey IS NULL
           OR v2.c_custkey IS NULL
           OR v1.c_acctbal <> v2.c_acctbal
    """,
    doc=(
        "Snapshot differencing — the INVERSE of cdc_apply_changes: "
        "given two table states (v2 simulates later inserts, deletes, "
        "and balance updates derived deterministically from the base), "
        "derive the I/U/D change feed by a FULL OUTER JOIN on the "
        "primary key, classifying by side-nullness and value "
        "inequality. This is how a pipeline bootstraps CDC from "
        "periodic snapshots when no changelog exists. One co-partitioned "
        "shuffle on the key (at 100 TB both snapshots bucket by PK and "
        "the diff is shuffle-free); unchanged rows — the overwhelming "
        "majority — are filtered before leaving the join, so output is "
        "change-bound. The update comparison is on stored doubles both "
        "engines derive identically (+10.0 on a 2-decimal value)."
    ),
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    v1 = c.filter(F.col("c_custkey") % 17 != 3).select(
        F.col("c_custkey").alias("k1"), F.col("c_acctbal").alias("old_acctbal")
    )
    v2 = c.filter(F.col("c_custkey") % 13 != 5).select(
        F.col("c_custkey").alias("k2"),
        F.when(
            F.col("c_custkey") % 7 == 2, F.col("c_acctbal") + 10.0
        )
        .otherwise(F.col("c_acctbal"))
        .alias("new_acctbal"),
    )
    return (
        v1.join(v2, v1.k1 == v2.k2, "full_outer")
        .filter(
            F.col("k1").isNull()
            | F.col("k2").isNull()
            | (F.col("old_acctbal") != F.col("new_acctbal"))
        )
        .select(
            F.coalesce(F.col("k1"), F.col("k2")).alias("c_custkey"),
            F.when(F.col("k1").isNull(), F.lit("I"))
            .when(F.col("k2").isNull(), F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            "old_acctbal",
            "new_acctbal",
        )
    )
