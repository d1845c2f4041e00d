"""Category H (strings) — string functions + tokenizing generators (SURVEY.md §2.H).

Regex patterns are restricted to the dialect intersection of Java regex
(Spark) and RE2 (DuckDB): \\w, \\d, anchors, classes — no lookbehind.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_management_and_analytics_spark.plans.registry import register
from big_data_management_and_analytics_spark.sources.io import load, spread

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
    # spread + explode_outer: see sources/io.py::spread — keeps tokenize
    # off the single-file scan task and out of the inferred size>0 filter.
    return (
        spread(d, "doc_id")
        .select("doc_id", F.explode_outer(tokens(F.col("text"))).alias("word"))
        .filter(F.col("word").isNotNull())
    )


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


@register(
    "str_locate_split",
    "H",
    oracle="""
        SELECT
            p_partkey,
            CAST(STRPOS(p_name, 'a') AS INT) AS pos_a,
            SPLIT_PART(p_name, ' ', 1) AS first_word,
            SPLIT_PART(p_name, ' ', 2) AS second_word,
            LEFT(p_name, 3) AS prefix3,
            RIGHT(p_name, 3) AS suffix3,
            STARTS_WITH(p_name, 's') AS starts_s,
            ENDS_WITH(p_name, 'e') AS ends_e,
            CONTAINS(p_name, 'er') AS has_er,
            ARRAY_TO_STRING(
                LIST_TRANSFORM(STRING_SPLIT(p_name, ' '),
                               w -> UPPER(SUBSTRING(w, 1, 1)) || SUBSTRING(w, 2)),
                ' ') AS name_title
        FROM part
    """,
    doc=(
        "Position/split/affix family: instr-strpos, split_part, left/right, "
        "startswith/endswith/contains predicates, initcap (oracle emulates "
        "initcap via per-word transform; fixture names are single-spaced)."
    ),
)
def str_locate_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    name = F.col("p_name")
    return p.select(
        "p_partkey",
        F.instr(name, "a").alias("pos_a"),
        F.split_part(name, F.lit(" "), F.lit(1)).alias("first_word"),
        F.split_part(name, F.lit(" "), F.lit(2)).alias("second_word"),
        F.expr("left(p_name, 3)").alias("prefix3"),
        F.expr("right(p_name, 3)").alias("suffix3"),
        F.startswith(name, F.lit("s")).alias("starts_s"),
        F.endswith(name, F.lit("e")).alias("ends_e"),
        F.contains(name, F.lit("er")).alias("has_er"),
        F.initcap(name).alias("name_title"),
    )


@register(
    "str_base64",
    "H",
    oracle="""
        SELECT
            c_custkey,
            BASE64(ENCODE(c_name)) AS name_b64,
            DECODE(FROM_BASE64(BASE64(ENCODE(c_name)))) AS name_roundtrip,
            CAST(OCTET_LENGTH(ENCODE(c_name)) AS INT) AS name_bytes
        FROM customer
    """,
    doc=(
        "Binary-text bridge: base64 encode, decode round-trip, byte length. "
        "Spark base64 uses unwrapped RFC 4648 (java.util.Base64) - same "
        "alphabet and padding as DuckDB's blob base64."
    ),
)
def str_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    blob = F.encode(F.col("c_name"), "utf-8")
    return c.select(
        "c_custkey",
        F.base64(blob).alias("name_b64"),
        F.decode(F.unbase64(F.base64(blob)), "utf-8").alias("name_roundtrip"),
        F.octet_length(blob).alias("name_bytes"),
    )


@register(
    "str_mask",
    "H",
    oracle="""
        SELECT c_custkey,
               REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
                   c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
                   '[0-9]', 'n', 'g') AS name_masked,
               REGEXP_REPLACE(c_name, '[0-9]', '*', 'g') AS digits_starred
        FROM customer
    """,
    doc=(
        "PII masking (F.mask, Spark 3.4+): shape-preserving redaction - "
        "upper to X, lower to x, digits to n, punctuation kept - the "
        "redact-before-training pattern for LLM corpora (masked text keeps "
        "token-shape statistics). Oracle reproduces the class mapping with "
        "global regex passes; the starred variant masks digits only."
    ),
)
def str_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.mask(F.col("c_name")).alias("name_masked"),
        F.expr("mask(c_name, NULL, NULL, '*')").alias("digits_starred"),
    )


@register(
    "str_collation",
    "H",
    oracle="""
        WITH mixed AS (
            SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_name)
                        ELSE p_name END AS name
            FROM part
        )
        SELECT lower(name) AS name_ci,
               COUNT(*) AS n,
               MIN(name) AS min_cased
        FROM mixed
        GROUP BY lower(name)
    """,
    doc=(
        "Spark 4 collation-aware grouping: half the part names uppercased, "
        "then grouped under the UTF8_LCASE collation — the engine-level "
        "form of case-insensitive semantics (comparisons, joins and aggs "
        "all honor the collated type, no per-row lower() rewrite needed). "
        "Output keys are canonicalized with lower() so the hash compare "
        "is representative-independent; the oracle expresses the same "
        "grouping with lower()."
    ),
)
def str_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    mixed = p.select(
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_name"))
        .otherwise(F.col("p_name"))
        .alias("name")
    )
    return (
        mixed.groupBy(F.collate(F.col("name"), "UTF8_LCASE").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"), F.min("name").alias("min_cased"))
        .select(
            # Canonical, binary-collated output key (collated strings keep
            # their collation through lower(); cast back for a stable wire
            # representation).
            F.lower(F.col("k")).cast("string").alias("name_ci"),
            "n",
            "min_cased",
        )
    )


@register(
    "str_url_parse",
    "H",
    oracle="""
        WITH u AS (
            SELECT doc_id,
                   'https://' || source || '.example.com/' || lang
                   || '/doc-' || doc_id || '?ref=' || (doc_id % 7)
                   || '&utm=x#s-' || (doc_id % 3) AS url
            FROM documents
        )
        SELECT doc_id, url,
               regexp_extract(url, '^([a-z]+)://', 1) AS proto,
               regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
               regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
               regexp_extract(url, '\\?([^#]*)', 1) AS query,
               regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS ref_param,
               regexp_extract(url, '#(.*)$', 1) AS fragment
        FROM u
    """,
    doc=(
        "URL decomposition with Spark's builtin parse_url (PROTOCOL / "
        "HOST / PATH / QUERY / REF plus keyed QUERY lookup) over URLs "
        "synthesized deterministically from the document metadata — the "
        "crawl-provenance parser every web-corpus pipeline runs before "
        "domain-level dedup and quality filtering. parse_url is a JVM "
        "expression (no UDF), fully codegen, map-only — linear at any "
        "scale. The oracle derives the identical components independently "
        "with anchored regexp_extract, so the check verifies parse_url's "
        "component semantics (path keeps its leading slash, query "
        "excludes '?', fragment excludes '#') rather than replaying it."
    ),
)
def str_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id"),
        F.lit("?ref="),
        F.col("doc_id") % 7,
        F.lit("&utm=x#s-"),
        F.col("doc_id") % 3,
    )
    with_url = d.select("doc_id", url.alias("url"))
    return with_url.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
        F.parse_url("url", F.lit("REF")).alias("fragment"),
    )
