"""Category H (dates) — date/time functions (SURVEY.md §2.H).

Rules (SURVEY.md §0 P5): never bare dayofweek (numbering differs between
engines); date-typed outputs serialize to ISO strings; extraction results
cast to INT on both sides (DuckDB date_part returns BIGINT).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_management_and_analytics_spark.plans.registry import register
from big_data_management_and_analytics_spark.sources.io import load


@register(
    "date_parts",
    "H",
    oracle="""
        SELECT
            o_orderkey,
            CAST(year(o_orderdate) AS INT) AS yr,
            CAST(month(o_orderdate) AS INT) AS mo,
            CAST(day(o_orderdate) AS INT) AS dy,
            CAST(quarter(o_orderdate) AS INT) AS qtr,
            CAST(isodow(o_orderdate) AS INT) AS iso_dow,
            date_trunc('month', o_orderdate) AS month_start,
            CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end
        FROM orders
    """,
    doc="year/month/day/quarter/ISO-dow/date_trunc/last_day.",
)
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    # ISO day-of-week (Mon=1..Sun=7) — the only cross-engine-safe numbering:
    # Spark dayofweek is Sun=1, DuckDB dayofweek is Sun=0 (P5).
    iso_dow = F.expr("extract(DAYOFWEEK_ISO FROM o_orderdate)").cast("int")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        iso_dow.alias("iso_dow"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.last_day("o_orderdate").cast("string").alias("month_end"),
    )


@register(
    "date_arith",
    "H",
    oracle="""
        SELECT
            o_orderkey,
            o_orderdate + INTERVAL 3 DAY AS due_ts,
            o_orderdate + INTERVAL 90 MINUTE AS review_ts,
            CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INT) AS days_to_2002,
            CAST((2002 - year(o_orderdate)) * 12 - month(o_orderdate) + 1 AS INT) AS months_to_2002
        FROM orders
    """,
    doc="Interval arithmetic + day/month difference (portable formulation).",
)
def date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    months = (
        (F.lit(2002) - F.year("o_orderdate")) * 12 - F.month("o_orderdate") + 1
    ).cast("int")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 3 DAYS")).alias("due_ts"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 MINUTES")).alias("review_ts"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate"))
        .cast("int")
        .alias("days_to_2002"),
        months.alias("months_to_2002"),
    )


@register(
    "date_epoch",
    "H",
    oracle="""
        SELECT o_orderkey,
               CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
               epoch_ms(o_orderdate) AS epoch_ms,
               CAST(to_timestamp(CAST(epoch(o_orderdate) AS BIGINT)) AS TIMESTAMP)
                   AS from_epoch
        FROM orders
    """,
    doc=(
        "Epoch conversions (UTC session both sides): timestamp → unix "
        "seconds / millis and the seconds → timestamp round-trip."
    ),
)
def date_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.unix_millis(F.col("o_orderdate")).alias("epoch_ms"),
        F.timestamp_seconds(F.unix_timestamp("o_orderdate")).alias("from_epoch"),
    )


@register(
    "date_dow_iso",
    "H",
    oracle="""
        SELECT o_orderkey,
               CAST(isodow(o_orderdate) AS INT) AS iso_dow,
               dayname(o_orderdate) AS dow_name,
               CAST(weekofyear(o_orderdate) AS INT) AS iso_week
        FROM orders
    """,
    doc=(
        "Safe day-of-week handling (P5: bare dayofweek DISAGREES across "
        "engines — Spark Sun=1, DuckDB Sun=0). The portable mapping: "
        "ISO dow = ((spark_dayofweek + 5) % 7) + 1, names via date_format "
        "EEEE ≡ dayname, ISO week via weekofyear (both ISO-8601)."
    ),
)
def date_dow_iso(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (((F.dayofweek("o_orderdate") + 5) % 7) + 1).cast("int").alias("iso_dow"),
        F.date_format("o_orderdate", "EEEE").alias("dow_name"),
        F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
    )


@register(
    "gen_date_spine",
    "H",
    oracle="""
        WITH spine AS (
            SELECT unnest(generate_series(
                TIMESTAMP '1992-01-01', TIMESTAMP '1998-12-31', INTERVAL 1 MONTH
            )) AS month_start
        ),
        actual AS (
            SELECT date_trunc('month', o_orderdate) AS month_start,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY 1
        )
        SELECT s.month_start, COALESCE(a.n_orders, 0) AS n_orders
        FROM spine s LEFT JOIN actual a USING (month_start)
    """,
    doc=(
        "Calendar densification: a generated month spine left-joined to "
        "actual per-month counts — months with no orders appear with 0 "
        "(the gap-fill prerequisite of any time-series model). The spine "
        "is sequence+explode (codegen, no driver loop); the join "
        "broadcasts the tiny spine."
    ),
)
def gen_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1992-01-01").cast("timestamp"),
                F.lit("1998-12-31").cast("timestamp"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("month_start")
    )
    actual = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month_start")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    return F.broadcast(spine).join(actual, "month_start", "left").select(
        "month_start", F.coalesce("n_orders", F.lit(0)).alias("n_orders")
    )


@register(
    "date_format_str",
    "H",
    oracle="""
        SELECT
            o_orderkey,
            STRFTIME(o_orderdate, '%Y-%m-%d') AS iso_date,
            STRFTIME(o_orderdate, '%Y-%m') AS year_month,
            STRFTIME(o_orderdate, '%H:%M:%S') AS clock,
            STRFTIME(o_orderdate, '%A') AS day_name,
            STRFTIME(o_orderdate, '%B') AS month_name,
            STRFTIME(o_orderdate, '%j') AS day_of_year
        FROM orders
    """,
    doc=(
        "Timestamp-to-string formatting matrix: ISO date, year-month, "
        "clock, English day/month names, zero-padded day-of-year. Spark "
        "date_format (JVM, locale US) vs DuckDB strftime - name formats "
        "validated equal on the full fixture date range."
    ),
)
def date_format_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM-dd").alias("iso_date"),
        F.date_format(d, "yyyy-MM").alias("year_month"),
        F.date_format(d, "HH:mm:ss").alias("clock"),
        F.date_format(d, "EEEE").alias("day_name"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.date_format(d, "DDD").alias("day_of_year"),
    )
