"""Category L — composite analytical pipelines (TPC-H-shaped, adapted to the
fixture schema; FIXTURES.md is ground truth for available columns).

These are multi-operator end-to-end queries — scan + pushdown filter +
broadcast dim join + fact-fact shuffle join + exact-money aggregation +
top-k — the shapes a warehouse runs all day. They double as bench
headliners because they exercise whole plan pipelines, not single operators.

Scale posture: every query keeps dimension joins broadcast (customer is the
largest dim side and joins AFTER aggregation where possible), facts shuffle
on their join key exactly once, and aggregation happens before join when the
join key is the grouping key (Q18: pre-aggregate lineitem, then join orders).
Money sums use the integer-cents fast path (plans/determinism.py) — pure
long codegen, bit-identical to DECIMAL(18,2) casts.

The reference repo is an empty course stub
(`/root/reference/README.md:1-2`) — these queries realize the TPC-H-ish
workload its fixtures mandate (`/root/repo/TESTDATA.md:3`).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_management_and_analytics_spark.plans.determinism import cents
from big_data_management_and_analytics_spark.plans.registry import register
from big_data_management_and_analytics_spark.sources.io import load


def _revenue_sum(alias: str) -> F.Column:
    """sum(l_extendedprice * (1 - l_discount)) — exact 4-decimal fixed point."""
    prod = (cents("l_extendedprice") * (100 - cents("l_discount"))).cast(
        "decimal(28,0)"
    )
    return (F.sum(prod) / F.lit(10000)).cast("double").alias(alias)


_SQL_REVENUE = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
)


@register(
    "tpch_q3_shipping",
    "L",
    oracle=f"""
        SELECT l_orderkey, {_SQL_REVENUE} AS revenue, o_orderdate
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate  > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    doc="TPC-H Q3 shape: segment filter → 3-way join → revenue top-10.",
)
def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_revenue_sum("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q4_priority",
    "L",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01'
          AND o_orderdate <  TIMESTAMP '1999-01-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY
          )
        GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS (→ left-semi join) + count by priority.",
)
def tpch_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "tpch_q6_forecast",
    "L",
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_shipdate <  TIMESTAMP '1999-01-01'
          AND CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) BETWEEN 5 AND 7
          AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: tight scan-filter-aggregate (pushdown showcase).",
)
def tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        & cents("l_discount").between(5, 7)
        & (F.col("l_quantity") < 24)
    )
    prod = (cents("l_extendedprice") * cents("l_discount")).cast("decimal(28,0)")
    return li.agg(
        (F.sum(prod) / F.lit(10000)).cast("double").alias("revenue")
    )


@register(
    "tpch_q10_returned",
    "L",
    oracle=f"""
        SELECT c_custkey, c_name, {_SQL_REVENUE} AS revenue, c_acctbal, n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1998-01-01'
          AND o_orderdate <  TIMESTAMP '1998-07-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer, top-20.",
)
def tpch_q10_returned(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    # Aggregate to o_custkey BEFORE touching the wide customer row: the
    # fact-fact join shuffles once on orderkey, then the per-customer rollup
    # joins a small aggregate against broadcast-able dims.
    per_cust = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(_revenue_sum("revenue"))
    )
    return (
        per_cust.join(F.broadcast(c), per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q18_bigorders",
    "L",
    oracle="""
        WITH big AS (
            SELECT l_orderkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
        )
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
        FROM big
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
    """,
    doc="TPC-H Q18 shape: pre-aggregated HAVING filter, then enrich with dims.",
)
def tpch_q18_bigorders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg((F.sum(cents("l_quantity")) / 100.0).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )
