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


@register(
    "tpch_q7_volume",
    "L",
    oracle=f"""
        SELECT supp_nation, cust_nation, l_year, {_SQL_REVENUE} AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(DATE_PART('year', l_shipdate) AS INT) AS l_year,
                   l_extendedprice, l_discount
            FROM supplier
            JOIN lineitem ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1999-01-01'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
    doc=(
        "TPC-H Q7 shape: bilateral trade volume between two nations by "
        "ship year - 5-way join with both ends of the supply chain "
        "nation-qualified, broadcast dims, exact-cents revenue."
    ),
)
def tpch_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    n1 = n.withColumnRenamed("n_name", "supp_nation").withColumnRenamed(
        "n_nationkey", "nk1"
    )
    n2 = n.withColumnRenamed("n_name", "cust_nation").withColumnRenamed(
        "n_nationkey", "nk2"
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("nk1"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("nk2"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            "l_extendedprice",
            "l_discount",
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_revenue_sum("revenue"))
    )


@register(
    "tpch_q13_custdist",
    "L",
    oracle="""
        WITH c_orders AS (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        SELECT c_count, COUNT(*) AS custdist
        FROM c_orders
        GROUP BY c_count
    """,
    doc=(
        "TPC-H Q13 shape: distribution of customers by order count - "
        "LEFT JOIN with a join-level predicate (kept customers with zero "
        "qualifying orders count as 0), then a second aggregation over "
        "the first. Two shuffles; the second input is one row per "
        "customer, tiny at any scale."
    ),
)
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    c_orders = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q15_topsupp",
    "L",
    oracle=f"""
        WITH revenue0 AS (
            SELECT l_suppkey AS supplier_no, {_SQL_REVENUE} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1998-01-01'
              AND l_shipdate <  TIMESTAMP '1998-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    """,
    doc=(
        "TPC-H Q15 shape: quarterly revenue per supplier, then the "
        "top supplier(s) via a scalar MAX subquery. Exact-cents revenue "
        "makes the max comparison exact (no float-tie hazard)."
    ),
)
def tpch_q15_topsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _revenue_sum("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("mx"))
        .join(F.broadcast(s), rev.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q17_smallqty",
    "L",
    oracle="""
        WITH avg_per_part AS (
            SELECT l_partkey AS ap_partkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       / COUNT(*) AS avg_qty
            FROM lineitem
            GROUP BY l_partkey
        )
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                    / 7.0 AS DOUBLE) AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN avg_per_part ON ap_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < 0.2 * avg_qty
    """,
    doc=(
        "TPC-H Q17 shape: small-quantity-order revenue - per-part average "
        "quantity (exact sum / count) joined back against the fact, "
        "brand-filtered. The 0.2*avg threshold compares identical doubles "
        "on both sides, so the filter decisions match exactly."
    ),
)
def tpch_q17_smallqty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    avg_q = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        ((F.sum(cents("l_quantity")) / 100.0) / F.count(F.lit(1))).alias("avg_qty")
    )
    flagged = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_q, li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    )
    return flagged.agg(
        ((F.sum(cents("l_extendedprice")) / 100.0) / F.lit(7.0))
        .cast("double")
        .alias("avg_yearly")
    )


@register(
    "tpch_q5_localsupp",
    "L",
    oracle=f"""
        SELECT n_name, {_SQL_REVENUE} AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    doc=(
        "TPC-H Q5 shape: local-supplier volume — revenue per nation where "
        "customer and supplier share the nation, region + year qualified. "
        "Facts (lineitem⋈orders) shuffle on orderkey once; supplier/"
        "nation/region broadcast; the c_nationkey = s_nationkey locality "
        "predicate rides the customer join. Exact 4-decimal revenue."
    ),
)
def tpch_q5_localsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select(
        "r_regionkey"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_revenue_sum("revenue"))
    )


@register(
    "tpch_q8_marketshare",
    "L",
    oracle="""
        WITH all_sales AS (
            SELECT year(o_orderdate) AS o_year,
                   CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
                   n2.n_name AS supp_nation
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region   ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'AMERICA'
              AND p_type = 'STANDARD'
              AND o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
        )
        SELECT o_year,
               ROUND(
                   CAST(SUM(CASE WHEN supp_nation = 'NATION_1'
                                 THEN volume ELSE 0 END) AS DOUBLE)
                   / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
        FROM all_sales
        GROUP BY o_year
    """,
    doc=(
        "TPC-H Q8 shape: national market share — NATION_1's fraction of "
        "AMERICA-market STANDARD-part revenue per order year. Two nation "
        "roles (customer side filters the market, supplier side labels "
        "volume); numerator and denominator are both exact decimal sums "
        "converted to double before the one division (round 6). Dims "
        "broadcast; facts shuffle once per join key."
    ),
)
def tpch_q8_marketshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD").select(
        "p_partkey"
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA").select(
        "r_regionkey"
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    prod = (cents("l_extendedprice") * (100 - cents("l_discount"))).cast(
        "decimal(28,0)"
    )
    sales = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            prod.alias("vol4"),
            "supp_nation",
        )
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_1", F.col("vol4")).otherwise(
            F.lit(0).cast("decimal(28,0)")
        )
    )
    den = F.sum(F.col("vol4"))
    return sales.groupBy("o_year").agg(
        F.round(
            (num / F.lit(10000)).cast("double") / (den / F.lit(10000)).cast("double"),
            6,
        ).alias("mkt_share")
    )


@register(
    "tpch_q14_promo",
    "L",
    oracle="""
        SELECT
            ROUND(
                100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    ELSE 0 END) AS DOUBLE)
                / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
                4) AS promo_revenue_pct
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    doc=(
        "TPC-H Q14 shape: promotion revenue share for one ship month — "
        "conditional revenue over total revenue, both exact decimal sums "
        "with one terminal double division (round 4). Part broadcast, "
        "single aggregate, month filter pushed to the lineitem scan."
    ),
)
def tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    prod = (cents("l_extendedprice") * (100 - cents("l_discount"))).cast(
        "decimal(28,0)"
    )
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        prod.alias("vol4"), "p_type"
    )
    num = F.sum(
        F.when(F.col("p_type") == "PROMO", F.col("vol4")).otherwise(
            F.lit(0).cast("decimal(28,0)")
        )
    )
    den = F.sum(F.col("vol4"))
    return joined.agg(
        F.round(
            100.0
            * (num / F.lit(10000)).cast("double")
            / (den / F.lit(10000)).cast("double"),
            4,
        ).alias("promo_revenue_pct")
    )
