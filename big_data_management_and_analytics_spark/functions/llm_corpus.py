"""Category K (corpus) — corpus-level curation operators a training-data
pipeline needs beyond per-document scoring: exact substring-span dedup,
inverted-index construction, PII redaction, and BPE tokenizer training /
application (SURVEY.md §2.K extras; task-mandated LLM-pipeline family).

All oracle-tier: each operator's DuckDB twin replays the identical
tokenizer (functions/strings.py) and the identical portable md5 hash
basis (functions/portable_hash.py), so outputs hash-match cross-engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_management_and_analytics_spark.functions.portable_hash import ph0
from big_data_management_and_analytics_spark.functions.strings import SQL_TOKENS, tokens
from big_data_management_and_analytics_spark.plans.registry import register
from big_data_management_and_analytics_spark.sources.io import load, spread

# Token k-gram width for exact substring-span dedup. Real pipelines use
# 50 BPE tokens (Lee et al., "Deduplicating Training Data Makes Language
# Models Better"); the fixture docs are ~30 tokens, so k=8 keeps the
# gram space populated at every sf.
K_SUB = 8

SQL_PH0 = "('0x' || substr(md5({col}), 1, 15))::BIGINT"


@register(
    "llm_dedup_substring",
    "K",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {SQL_TOKENS.format(col='text')} AS tok FROM documents
        ),
        g AS (
            SELECT doc_id,
                   UNNEST(list_transform(
                       generate_series(1, len(tok) - {K_SUB - 1}),
                       i -> {SQL_PH0.format(
                           col=f"array_to_string(list_slice(tok, i, i + {K_SUB - 1}), ' ')"
                       )}
                   )) AS h
            FROM t
            WHERE len(tok) >= {K_SUB}
        ),
        shared AS (SELECT h FROM g GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
        totals AS (SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY doc_id),
        dups AS (
            SELECT doc_id, COUNT(*) AS dup_grams
            FROM g SEMI JOIN shared USING (h)
            GROUP BY doc_id
        )
        SELECT t.doc_id, t.n_grams, d.dup_grams,
               ROUND(CAST(d.dup_grams AS DOUBLE) / t.n_grams, 6) AS dup_frac
        FROM totals t JOIN dups d ON t.doc_id = d.doc_id
    """,
    doc=(
        "Exact substring-span dedup (the Lee-et-al. exact-substring "
        "criterion at token-k-gram granularity): a position is duplicated "
        "iff its k-gram occurs in >= 2 distinct documents. Per-position "
        "sliding k-grams reduce to one portable 60-bit md5 hash each, so "
        "the shuffle carries 8 bytes per position, never the gram text — "
        "the 100 TB form of suffix-array dedup's 'is this span repeated' "
        "query. Shape: explode grams -> hash -> groupBy(h) distinct-doc "
        "count (map-side partial agg) -> semi-join back -> per-doc "
        "fraction. Linear in corpus positions; no pair space."
    ),
)
def llm_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    # Total expression (empty array below k tokens) — a filter would be
    # substituted below the spread() exchange, re-tokenizing in the
    # single scan task (same trap documented at llm_dedup_shingle).
    gram_hashes = F.when(
        F.size(tok) >= K_SUB,
        F.transform(
            F.sequence(F.lit(1), F.size(tok) - (K_SUB - 1)),
            lambda i: ph0(F.concat_ws(" ", F.slice(tok, i, K_SUB))),
        ),
    ).otherwise(F.array().cast("array<long>"))
    g = (
        spread(d, "doc_id")
        .select("doc_id", F.explode_outer(gram_hashes).alias("h"))
        .filter(F.col("h").isNotNull())
    )
    shared = (
        g.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    totals = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    dups = (
        g.join(shared, "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("dup_grams"))
    )
    return totals.join(dups, "doc_id").select(
        "doc_id",
        "n_grams",
        "dup_grams",
        F.round(F.col("dup_grams").cast("double") / F.col("n_grams"), 6).alias(
            "dup_frac"
        ),
    )


@register(
    "llm_inverted_index",
    "K",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, UNNEST({SQL_TOKENS.format(col='text')}) AS term
            FROM documents
        )
        SELECT term,
               COUNT(DISTINCT doc_id) AS df,
               COUNT(*) AS cf,
               STRING_AGG(DISTINCT doc_id, ',' ORDER BY doc_id) AS postings
        FROM t
        WHERE term <> ''
        GROUP BY term
    """,
    doc=(
        "Inverted-index construction: term -> (document frequency, "
        "collection frequency, sorted distinct posting list). One "
        "explode + one hash aggregate — the map-side partial collect_set "
        "keeps the shuffle at |distinct (term, doc)| rows; the posting "
        "list serializes to a joined string (§2.0 amendment 11: raw array "
        "columns are container-unstable across the compare bridge). At "
        "100 TB a "
        "stop-word's posting list exceeds a single struct, so production "
        "shards high-df postings into fixed-size blocks keyed by "
        "(term, block_no) — same plan shape, one extra bucketing key; "
        "the fixture's 31-term vocabulary needs no sharding."
    ),
)
def llm_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    e = (
        spread(d, "doc_id")
        .select("doc_id", F.explode_outer(tokens(F.col("text"))).alias("term"))
        .filter(F.col("term").isNotNull() & (F.col("term") != ""))
    )
    return e.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df"),
        F.count(F.lit(1)).alias("cf"),
        F.concat_ws(",", F.sort_array(F.collect_set("doc_id"))).alias("postings"),
    )


# PII patterns — identical semantics under Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition and \b only; no
# lookaround (RE2 has none), no engine-specific escapes.
RE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
RE_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
RE_PHONE = r"\b555-[0-9]{4}\b"

# The synthetic fixture has no PII, so the operator first composes a
# deterministic dirty-text column from customer attributes — both
# engines build the identical string, then the redaction chain (the
# thing under test) runs on it.
SQL_DIRTY = (
    "c_name || ' <user' || c_custkey || '@example.com> call 555-' || "
    "lpad(CAST(c_custkey * 7 % 10000 AS VARCHAR), 4, '0') || "
    "' from 10.' || CAST(c_custkey % 256 AS VARCHAR) || '.0.' || "
    "CAST(c_custkey * 3 % 256 AS VARCHAR) || ' segment ' || c_mktsegment"
)


@register(
    "llm_pii_redact",
    "K",
    oracle=f"""
        WITH dirty AS (
            SELECT c_custkey, {SQL_DIRTY} AS txt FROM customer
        )
        SELECT c_custkey,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(txt, '{RE_EMAIL}', '[EMAIL]', 'g'),
                       '{RE_IP}', '[IP]', 'g'),
                   '{RE_PHONE}', '[PHONE]', 'g') AS clean,
               len(regexp_extract_all(txt, '{RE_EMAIL}')) AS n_email,
               len(regexp_extract_all(txt, '{RE_IP}')) AS n_ip,
               len(regexp_extract_all(txt, '{RE_PHONE}')) AS n_phone
        FROM dirty
    """,
    doc=(
        "PII redaction: email / IPv4 / phone scrub with per-category "
        "match counts. Map-only regexp_replace chain — whole-stage "
        "codegen, no shuffle, embarrassingly parallel at any scale. "
        "Patterns restricted to the Java-regex ∩ RE2 common subset so "
        "the oracle replays them bit-identically. Email is redacted "
        "before IP so the dotted domain can never be half-eaten by the "
        "IP rule."
    ),
)
def llm_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    dirty = F.concat(
        F.col("c_name"),
        F.lit(" <user"),
        F.col("c_custkey").cast("string"),
        F.lit("@example.com> call 555-"),
        F.lpad(((F.col("c_custkey") * 7) % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."),
        (F.col("c_custkey") % 256).cast("string"),
        F.lit(".0."),
        ((F.col("c_custkey") * 3) % 256).cast("string"),
        F.lit(" segment "),
        F.col("c_mktsegment"),
    )
    txt = F.col("txt")
    return spread(c, "c_custkey").select(
        "c_custkey", dirty.alias("txt")
    ).select(
        "c_custkey",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(txt, RE_EMAIL, "[EMAIL]"), RE_IP, "[IP]"
            ),
            RE_PHONE,
            "[PHONE]",
        ).alias("clean"),
        F.regexp_count(txt, F.lit(RE_EMAIL)).alias("n_email"),
        F.regexp_count(txt, F.lit(RE_IP)).alias("n_ip"),
        F.regexp_count(txt, F.lit(RE_PHONE)).alias("n_phone"),
    )
