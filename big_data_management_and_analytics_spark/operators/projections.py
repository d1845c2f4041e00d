"""Category B — projection / filter / predicates (SURVEY.md §2.B).

All expressions are built-in Column ops so they stay inside whole-stage
codegen and push down to the scan where possible.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_management_and_analytics_spark.plans.determinism import DEC, dec2
from big_data_management_and_analytics_spark.plans.registry import register
from big_data_management_and_analytics_spark.sources.io import load


@register(
    "proj_compute",
    "B",
    oracle="""
        SELECT
            l_orderkey,
            l_linenumber,
            CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
    """,
    doc="Computed column in exact decimal, surfaced as DOUBLE.",
)
def proj_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    revenue = dec2("l_extendedprice") * (F.lit(1).cast(DEC) - dec2("l_discount"))
    return li.select(
        "l_orderkey", "l_linenumber", revenue.cast("double").alias("revenue")
    )


@register(
    "filter_compound",
    "B",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE (o_orderstatus = 'O' AND o_orderpriority IN ('1-URGENT', '2-HIGH'))
           OR (o_totalprice BETWEEN 100000 AND 150000
               AND NOT o_orderpriority LIKE '5%')
    """,
    doc="AND/OR/NOT + BETWEEN + IN + LIKE in one predicate tree.",
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    cond = (
        (o.o_orderstatus == "O") & (o.o_orderpriority.isin("1-URGENT", "2-HIGH"))
    ) | (
        o.o_totalprice.between(100000, 150000) & ~o.o_orderpriority.like("5%")
    )
    return o.filter(cond).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )


@register(
    "filter_null_semantics",
    "B",
    oracle="""
        SELECT
            o_orderkey,
            NULLIF(o_orderstatus, 'P') AS status_or_null,
            COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_filled,
            (NULLIF(o_orderstatus, 'P') IS NULL) AS is_pending,
            (NULLIF(o_orderstatus, 'P') IS NOT DISTINCT FROM 'O') AS nsafe_open
        FROM orders
        WHERE o_orderkey <= 5000
    """,
    doc="Three-valued logic: NULLIF/COALESCE/IS NULL/null-safe equality.",
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        status_or_null.alias("status_or_null"),
        F.coalesce(status_or_null, F.lit("PENDING")).alias("status_filled"),
        status_or_null.isNull().alias("is_pending"),
        status_or_null.eqNullSafe(F.lit("O")).alias("nsafe_open"),
    )


@register(
    "proj_case_when",
    "B",
    oracle="""
        SELECT
            c_custkey,
            CASE
                WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium'
            END AS balance_band
        FROM customer
    """,
    doc="Conditional projection (CASE WHEN chain).",
)
def proj_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    band = (
        F.when(c.c_acctbal < 0, "debt")
        .when(c.c_acctbal < 5000, "standard")
        .otherwise("premium")
    )
    return c.select("c_custkey", band.alias("balance_band"))


@register(
    "proj_distinct",
    "B",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    doc="Distinct projection (hash-distinct).",
)
def proj_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


@register(
    "proj_cast_matrix",
    "B",
    oracle="""
        SELECT
            l_orderkey,
            l_linenumber,
            CAST(l_linenumber AS BIGINT) AS line_as_long,
            CAST(l_orderkey AS DOUBLE) AS key_as_double,
            CAST(trunc(l_quantity) AS INT) AS qty_as_int,
            CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS price_as_str,
            CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_day_str
        FROM lineitem
        WHERE l_orderkey <= 2000
    """,
    doc=(
        "Cast lattice int→long→double, double→int, decimal→string, "
        "timestamp→date→string. Spark's double→int cast TRUNCATES while "
        "DuckDB's ROUNDS — the oracle spells trunc() explicitly so the "
        "semantics agree for non-integral doubles too."
    ),
)
def proj_cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_linenumber").cast("long").alias("line_as_long"),
        F.col("l_orderkey").cast("double").alias("key_as_double"),
        F.col("l_quantity").cast("int").alias("qty_as_int"),
        dec2("l_extendedprice").cast("string").alias("price_as_str"),
        # DATE-typed outputs are never surfaced raw: Spark→pandas yields
        # datetime.date while DuckDB→pandas yields midnight Timestamps, so
        # dates serialize to ISO strings (§2.0 convention, like rule 5).
        F.col("l_shipdate").cast("date").cast("string").alias("ship_day_str"),
    )


@register(
    "proj_fillna_dropna",
    "B",
    oracle="""
        SELECT c_custkey,
               COALESCE(o_orderkey, -1) AS o_orderkey,
               CAST(COALESCE(o_totalprice, 0.0) AS DOUBLE) AS o_totalprice,
               COALESCE(o_orderpriority, 'NONE') AS priority
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
    doc=(
        "NA-handling surface (the R idiom the reference's .gitignore "
        "signals): nulls from a left join repaired with na.fill — typed "
        "defaults per column, matching COALESCE semantics exactly."
    ),
)
def proj_fillna_dropna(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    joined = c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey",
        "o_orderkey",
        "o_totalprice",
        F.col("o_orderpriority").alias("priority"),
    )
    return joined.na.fill(
        {"o_orderkey": -1, "o_totalprice": 0.0, "priority": "NONE"}
    )


@register(
    "proj_try_arith",
    "B",
    oracle="""
        SELECT p_partkey,
               ROUND(p_retailprice / NULLIF(p_size - 5, 0), 6) AS safe_unit_price,
               TRY_CAST(p_brand AS INTEGER) AS brand_as_int,
               TRY_CAST(SPLIT_PART(p_name, ' ', 1) AS INTEGER) AS word_as_int,
               STRING_SPLIT(p_name, ' ')[99] AS word99,
               CAST(NULL AS BIGINT) AS overflow_add
        FROM part
    """,
    doc=(
        "ANSI-safe TRY arithmetic (Spark 4 runs ANSI mode ON, so plain "
        "overflow/bad-cast ERROR): try_divide yields NULL on zero "
        "divisors, try_cast NULL on malformed input, try_element_at NULL "
        "out of range, try_add NULL on BIGINT overflow (oracle encodes the "
        "overflow result literally - DuckDB BIGINT + errors instead of "
        "NULLing, which is exactly the semantic try_add adds)."
    ),
)
def proj_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.round(
            F.try_divide(F.col("p_retailprice"), F.col("p_size") - 5), 6
        ).alias("safe_unit_price"),
        F.col("p_brand").try_cast("int").alias("brand_as_int"),
        F.element_at(words, 1).try_cast("int").alias("word_as_int"),
        F.try_element_at(words, F.lit(99)).alias("word99"),
        F.try_add(F.lit(9223372036854775807).cast("long"), F.lit(1).cast("long")).alias(
            "overflow_add"
        ),
    )


@register(
    "proj_transpose",
    "B",
    oracle="""
        SELECT 'n_lines' AS key,
               CAST(COUNT(*) FILTER (WHERE l_returnflag = 'A') AS BIGINT)
                   AS "A",
               CAST(COUNT(*) FILTER (WHERE l_returnflag = 'N') AS BIGINT)
                   AS "N",
               CAST(COUNT(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT)
                   AS "R"
        FROM lineitem
        UNION ALL
        SELECT 'sum_qty',
               CAST(SUM(CAST(l_quantity AS BIGINT))
                    FILTER (WHERE l_returnflag = 'A') AS BIGINT),
               CAST(SUM(CAST(l_quantity AS BIGINT))
                    FILTER (WHERE l_returnflag = 'N') AS BIGINT),
               CAST(SUM(CAST(l_quantity AS BIGINT))
                    FILTER (WHERE l_returnflag = 'R') AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'sum_price_cents',
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                    FILTER (WHERE l_returnflag = 'A') AS BIGINT),
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                    FILTER (WHERE l_returnflag = 'N') AS BIGINT),
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                    FILTER (WHERE l_returnflag = 'R') AS BIGINT)
        FROM lineitem
    """,
    doc=(
        "DataFrame TRANSPOSE (Spark 4.0 relational pivot of a compact "
        "summary): per-returnflag metrics flip to one row per metric "
        "with a column per flag — the report-layout step that previously "
        "forced a driver-side pandas detour. Spark sorts the new columns "
        "by index value and types them by the common value type (all "
        "BIGINT here), so the shape is deterministic; the oracle states "
        "the transposed layout directly with conditional aggregates. "
        "Scale note: transpose materializes one column PER DISTINCT "
        "index value — valid for bounded summaries like this 3-row "
        "aggregate, never for high-cardinality frames (that inversion "
        "is agg_pivot's guarded territory)."
    ),
)
def proj_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_management_and_analytics_spark.plans.determinism import cents

    li = load(spark, sf_dir, "lineitem")
    small = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sum_qty"),
        F.sum(cents("l_extendedprice")).cast("bigint").alias("sum_price_cents"),
    )
    return small.transpose("l_returnflag")
