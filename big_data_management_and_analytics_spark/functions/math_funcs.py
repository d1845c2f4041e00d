"""Category H (math) — math functions (SURVEY.md §2.H).

round() on raw doubles is avoided where a value can sit on a rounding
boundary: 2-decimal money is first cast to DECIMAL(18,2) so rounding is
defined on the exact decimal value in both engines. Transcendentals are
rounded to 6 digits (libm low-bit divergence, §2.0 rule 2).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_management_and_analytics_spark.plans.determinism import dec2
from big_data_management_and_analytics_spark.plans.registry import register
from big_data_management_and_analytics_spark.sources.io import load


@register(
    "math_basic",
    "H",
    oracle="""
        SELECT
            s_suppkey,
            ABS(s_acctbal) AS abs_bal,
            CAST(ROUND(CAST(s_acctbal AS DECIMAL(18,2)), 1) AS DOUBLE) AS bal_round1,
            CAST(FLOOR(s_acctbal) AS BIGINT) AS bal_floor,
            CAST(CEIL(s_acctbal) AS BIGINT) AS bal_ceil,
            CAST(s_suppkey % 7 AS BIGINT) AS key_mod7,
            CAST(SIGN(s_acctbal) AS DOUBLE) AS bal_sign,
            CAST(POW(s_suppkey, 2) AS DOUBLE) AS key_sq,
            ROUND(SQRT(ABS(s_acctbal)), 6) AS bal_sqrt
        FROM supplier
    """,
    doc="abs/round/floor/ceil/mod/sign/pow/sqrt.",
)
def math_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.abs("s_acctbal").alias("abs_bal"),
        F.round(dec2("s_acctbal"), 1).cast("double").alias("bal_round1"),
        F.floor("s_acctbal").cast("long").alias("bal_floor"),
        F.ceil("s_acctbal").cast("long").alias("bal_ceil"),
        (F.col("s_suppkey") % 7).cast("long").alias("key_mod7"),
        F.signum("s_acctbal").cast("double").alias("bal_sign"),
        F.pow("s_suppkey", F.lit(2)).cast("double").alias("key_sq"),
        F.round(F.sqrt(F.abs("s_acctbal")), 6).alias("bal_sqrt"),
    )


@register(
    "math_transcendental",
    "H",
    oracle="""
        SELECT
            p_partkey,
            ROUND(EXP(p_retailprice / 1000), 6) AS exp_scaled,
            ROUND(LN(p_retailprice), 6) AS ln_price,
            ROUND(LOG10(p_retailprice), 6) AS log10_price
        FROM part
    """,
    doc="exp/ln/log10 rounded to 6 (libm parity margin).",
)
def math_transcendental(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round(F.exp(F.col("p_retailprice") / 1000), 6).alias("exp_scaled"),
        F.round(F.log(F.col("p_retailprice")), 6).alias("ln_price"),
        F.round(F.log10(F.col("p_retailprice")), 6).alias("log10_price"),
    )


@register(
    "cond_greatest_least",
    "H",
    oracle="""
        SELECT
            c_custkey,
            GREATEST(c_acctbal, 0.0) AS bal_floor0,
            LEAST(c_acctbal, 5000.0) AS bal_cap5k,
            COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_masked
        FROM customer
    """,
    doc="greatest/least/nvl-style conditionals.",
)
def cond_greatest_least(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_floor0"),
        F.least("c_acctbal", F.lit(5000.0)).alias("bal_cap5k"),
        F.nvl(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "segment_masked"
        ),
    )


@register(
    "hash_funcs",
    "H",
    oracle="""
        SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256
        FROM documents
    """,
    doc="Content addressing: md5 + sha256 hex digests.",
)
def hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@register(
    "math_bitwise",
    "H",
    oracle="""
        SELECT l_orderkey, l_partkey,
               l_orderkey & l_partkey AS band,
               l_orderkey | l_partkey AS bor,
               xor(l_orderkey, l_partkey) AS bxor,
               CAST(bit_count(l_orderkey) AS INT) AS popcount,
               l_orderkey << 2 AS shl,
               l_orderkey >> 1 AS shr
        FROM lineitem WHERE l_linenumber = 1
    """,
    doc="Bitwise family: and/or/xor, population count, shifts (codegen).",
)
def math_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    k = F.col("l_orderkey")
    p = F.col("l_partkey")
    return li.select(
        "l_orderkey",
        "l_partkey",
        k.bitwiseAND(p).alias("band"),
        k.bitwiseOR(p).alias("bor"),
        k.bitwiseXOR(p).alias("bxor"),
        F.bit_count(k).alias("popcount"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 1).alias("shr"),
    )


@register(
    "math_trig",
    "H",
    oracle="""
        SELECT
            l_orderkey, l_linenumber,
            ROUND(SIN(l_quantity), 6) AS sin_q,
            ROUND(COS(l_quantity), 6) AS cos_q,
            ROUND(TAN(l_discount), 6) AS tan_d,
            ROUND(ATAN(l_discount), 6) AS atan_d,
            ROUND(ATAN2(l_quantity, 1 + l_discount), 6) AS atan2_qd,
            ROUND(DEGREES(l_discount), 6) AS deg_d,
            ROUND(RADIANS(l_quantity), 6) AS rad_q,
            ROUND(PI(), 6) AS pi_const
        FROM lineitem
    """,
    doc=(
        "Trigonometric family (sin/cos/tan/atan/atan2/degrees/radians/pi), "
        "terminal-rounded to 6 digits (JVM Math vs libm may differ in the "
        "last ULP; rounding absorbs it - validated over 60k rows)."
    ),
)
def math_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    q, d = F.col("l_quantity"), F.col("l_discount")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin(q), 6).alias("sin_q"),
        F.round(F.cos(q), 6).alias("cos_q"),
        F.round(F.tan(d), 6).alias("tan_d"),
        F.round(F.atan(d), 6).alias("atan_d"),
        F.round(F.atan2(q, d + F.lit(1)), 6).alias("atan2_qd"),
        F.round(F.degrees(d), 6).alias("deg_d"),
        F.round(F.radians(q), 6).alias("rad_q"),
        F.round(F.lit(3.141592653589793), 6).alias("pi_const"),
    )
