"""Category H (JSON) — JSON extraction and production (SURVEY.md §2.H).

`events.props` is JSON text of shape {"k": <int 0..99>} (FIXTURES.md).
json_produce restricts struct fields to ints/strings — double formatting
inside JSON differs between engines (validated at build time, §2.H note).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from big_data_management_and_analytics_spark.plans.registry import register
from big_data_management_and_analytics_spark.sources.io import load


@register(
    "json_extract",
    "H",
    oracle="""
        SELECT
            event_type,
            CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
            COUNT(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 50) AS n_high_k
        FROM events
        GROUP BY event_type
    """,
    doc="get_json_object → typed extraction, aggregated.",
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("sum_k"),
        F.count(F.when(k >= 50, 1)).alias("n_high_k"),
    )


@register(
    "json_schema_parse",
    "H",
    oracle="""
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        FROM events
    """,
    doc="from_json with an explicit schema (the streaming-safe parse path).",
)
def json_schema_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    return ev.select(
        "event_id", F.from_json("props", schema).getField("k").alias("k")
    )


@register(
    "json_produce",
    "H",
    oracle="""
        SELECT o_orderkey,
               to_json(struct_pack(key := o_orderkey, status := o_orderstatus)) AS payload
        FROM orders
    """,
    doc="to_json(struct(...)) — int/string fields only (float formats diverge).",
)
def json_produce(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("key"),
                F.col("o_orderstatus").alias("status"),
            )
        ).alias("payload"),
    )


@register(
    "json_variant",
    "H",
    oracle="""
        SELECT event_id,
               CAST(JSON_EXTRACT(props, '$.k') AS INT) AS k_int,
               JSON_EXTRACT_STRING(props, '$.k') AS k_str,
               JSON_EXTRACT(props, '$.missing') IS NOT NULL AS has_missing
        FROM events
    """,
    doc=(
        "Semi-structured VARIANT path (Spark 4): parse_json once, then "
        "typed variant_get extractions - the open-schema alternative to "
        "from_json with a pinned schema. Binary variant encoding scans "
        "faster than repeated string JSON parsing at 100 TB; the oracle "
        "uses DuckDB's JSON extraction on the same paths."
    ),
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        (~F.isnull(F.variant_get(v, "$.missing", "string"))).alias("has_missing"),
    )
