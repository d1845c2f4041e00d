"""Category H (strings) — string functions + tokenizing generators (SURVEY.md §2.H).

Regex patterns are restricted to the dialect intersection of Java regex
(Spark) and RE2 (DuckDB): \\w, \\d, anchors, classes — no lookbehind.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_management_and_analytics_spark.plans.registry import register
from big_data_management_and_analytics_spark.sources.io import load

# THE canonical tokenizer for every text operator (SURVEY.md §7 M5: one
# regex, one lowercase rule, used identically in Spark and oracle SQL).
TOKEN_SPLIT_RE = r"\s+"


def tokens(col):
    return F.split(F.lower(col), TOKEN_SPLIT_RE)


SQL_TOKENS = "string_split_regex(lower({col}), '\\s+')"


@register(
    "str_basic",
    "H",
    oracle="""
        SELECT
            p_partkey,
            UPPER(p_name) AS name_upper,
            LOWER(p_brand) AS brand_lower,
            TRIM('  ' || p_name || ' ') AS name_trimmed,
            SUBSTRING(p_name, 1, 4) AS name_prefix,
            CAST(LENGTH(p_name) AS INT) AS name_len,
            CONCAT_WS('/', p_brand, p_type) AS brand_type,
            LPAD(CAST(p_size AS VARCHAR), 5, '0') AS size_padded,
            REPLACE(p_name, ' ', '_') AS name_snake
        FROM part
    """,
    doc="upper/lower/trim/substring/length/concat_ws/lpad/replace.",
)
def str_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 5, "0").alias("size_padded"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
    )


@register(
    "str_split_explode",
    "H",
    oracle=f"""
        SELECT doc_id, UNNEST({SQL_TOKENS.format(col='text')}) AS word
        FROM documents
    """,
    doc="Tokenize: split + explode (the generator-shaped UDTF pattern).",
)
def str_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", F.explode(tokens(F.col("text"))).alias("word"))


@register(
    "str_regex",
    "H",
    oracle="""
        SELECT
            p_partkey,
            regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
            regexp_replace(p_name, '\\d+', '#') AS name_nodigits,
            regexp_matches(p_name, 'widget|bolt') AS is_hardware
        FROM part
    """,
    doc="regexp_extract / regexp_replace / rlike (RE2∩Java dialect).",
)
def str_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_name", r"\d+", "#").alias("name_nodigits"),
        F.col("p_name").rlike("widget|bolt").alias("is_hardware"),
    )


@register(
    "str_distance",
    "H",
    oracle="""
        SELECT p_partkey, p_name,
               CAST(levenshtein(p_name, 'blue bolt') AS INT) AS dist_blue_bolt
        FROM part
        WHERE levenshtein(p_name, 'blue bolt') <= 6
    """,
    doc="Edit distance between part names and a probe string.",
)
def str_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    dist = F.levenshtein(F.col("p_name"), F.lit("blue bolt"))
    return p.filter(dist <= 6).select(
        "p_partkey", "p_name", dist.alias("dist_blue_bolt")
    )


@register(
    "str_format",
    "H",
    oracle="""
        SELECT p_partkey,
               printf('%s#%07d', p_brand, p_partkey) AS part_tag,
               repeat('*', CAST(p_size // 10 AS INT)) AS size_bar,
               reverse(p_brand) AS brand_rev,
               translate(p_type, ' ', '-') AS type_dashed
        FROM part
    """,
    doc=(
        "Formatting family: format_string ≡ printf (C-style), repeat, "
        "reverse, translate — all codegen string ops."
    ),
)
def str_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.format_string("%s#%07d", F.col("p_brand"), F.col("p_partkey")).alias(
            "part_tag"
        ),
        F.repeat(F.lit("*"), (F.col("p_size") / 10).cast("int")).alias("size_bar"),
        F.reverse("p_brand").alias("brand_rev"),
        F.translate("p_type", " ", "-").alias("type_dashed"),
    )
