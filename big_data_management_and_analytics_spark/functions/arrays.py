"""Category H (arrays/maps/structs) — collection functions + generators
(SURVEY.md §2.H).

Array outputs are either scalars derived from arrays or arrays serialized
to strings (§2.0 rules 5-6) — never raw float arrays (container-type
round-trips differ between the two pandas bridges).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_management_and_analytics_spark.plans.registry import register
from big_data_management_and_analytics_spark.sources.io import load


@register(
    "arr_basic",
    "H",
    oracle="""
        SELECT
            vec_id,
            CAST(len(embedding) AS INT) AS n_dims,
            CAST(embedding[1] AS DOUBLE) AS first_dim,
            CAST(len(list_distinct(embedding)) AS INT) AS n_distinct,
            CAST(list_aggregate(embedding::DOUBLE[], 'max') AS DOUBLE) AS max_dim,
            CAST(list_aggregate(embedding::DOUBLE[], 'min') AS DOUBLE) AS min_dim,
            array_to_string(generate_series(0, greatest(label, 0)), ',') AS label_seq
        FROM embeddings
    """,
    doc="size/element_at/array_distinct/array_max/array_min/sequence.",
)
def arr_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.element_at("embedding", 1).cast("double").alias("first_dim"),
        F.size(F.array_distinct("embedding")).alias("n_distinct"),
        F.array_max("embedding").cast("double").alias("max_dim"),
        F.array_min("embedding").cast("double").alias("min_dim"),
        # greatest(label,0): Spark sequence(0, n) with n<0 counts DOWN while
        # DuckDB generate_series returns empty — clamp so both agree even
        # if a label were ever negative.
        F.concat_ws(
            ",",
            F.sequence(F.lit(0), F.greatest("label", F.lit(0))).cast("array<string>"),
        ).alias("label_seq"),
    )


@register(
    "arr_higher_order",
    "H",
    oracle="""
        SELECT
            vec_id,
            ROUND(SQRT(list_aggregate(
                list_transform(embedding::DOUBLE[], x -> x * x), 'sum')), 6) AS l2_norm,
            CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
            ROUND(list_aggregate(
                list_transform(embedding::DOUBLE[], x -> abs(x)), 'sum'), 6) AS l1_norm
        FROM embeddings
    """,
    doc="Higher-order lambdas: transform/filter/aggregate — L1/L2 norms.",
)
def arr_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    sq_sum = F.aggregate(
        F.transform(emb, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )
    abs_sum = F.aggregate(
        F.transform(emb, lambda x: F.abs(x)), F.lit(0.0), lambda acc, x: acc + x
    )
    return e.select(
        "vec_id",
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        F.round(abs_sum, 6).alias("l1_norm"),
    )


@register(
    "map_ops",
    "H",
    oracle="""
        SELECT user_id, event_type AS k, COUNT(*) AS v
        FROM events
        GROUP BY user_id, event_type
    """,
    doc=(
        "map_from_entries → map_entries round-trip: per-user event-type "
        "counts packed into a map then exploded back to sorted entries "
        "(§2.0 rule 5: no map-typed output)."
    ),
)
def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    packed = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("type_counts")
    )
    entry = F.explode(F.map_entries("type_counts")).alias("entry")
    return packed.select("user_id", entry).select(
        "user_id",
        F.col("entry.key").alias("k"),
        F.col("entry.value").alias("v"),
    )


@register(
    "struct_ops",
    "H",
    oracle="""
        SELECT
            c_custkey,
            c_name AS packed_name,
            c_acctbal AS packed_bal,
            (c_acctbal > 5000) AS packed_rich
        FROM customer
    """,
    doc="struct() build + field access, flattened for output.",
)
def struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    packed = c.select(
        "c_custkey",
        F.struct(
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("bal"),
            (F.col("c_acctbal") > 5000).alias("rich"),
        ).alias("s"),
    )
    return packed.select(
        "c_custkey",
        F.col("s.name").alias("packed_name"),
        F.col("s.bal").alias("packed_bal"),
        F.col("s.rich").alias("packed_rich"),
    )


@register(
    "gen_posexplode",
    "H",
    oracle="""
        SELECT vec_id, i AS dim, CAST(embedding[i] AS DOUBLE) AS val
        FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) AS dims
    """,
    doc="Positional explode with ordinality (no WITH ORDINALITY in DuckDB — P4).",
)
def gen_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val_f")
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("dim"),
        F.col("val_f").cast("double").alias("val"),
    )


@register(
    "gen_sequence_rows",
    "H",
    oracle="""
        SELECT n, n * n AS n_sq, n % 5 AS n_mod5
        FROM (SELECT unnest(generate_series(1, 1000)) AS n) AS t
    """,
    doc="Row generator (spark.range ≡ generate_series).",
)
def gen_sequence_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.range(1, 1001).select(
        F.col("id").alias("n"),
        (F.col("id") * F.col("id")).alias("n_sq"),
        (F.col("id") % 5).alias("n_mod5"),
    )


@register(
    "arr_set_ops",
    "H",
    oracle="""
        WITH toks AS (
            SELECT doc_id, list_distinct(string_split_regex(lower(text), '\\s+')) AS t
            FROM documents
        )
        SELECT a.doc_id,
               array_to_string(list_sort(list_distinct(a.t || b.t)), ' ') AS vocab_union,
               COALESCE(array_to_string(list_sort(list_filter(a.t, x -> list_contains(b.t, x))), ' '), '')
                   AS vocab_common,
               COALESCE(array_to_string(list_sort(list_filter(a.t, x -> NOT list_contains(b.t, x))), ' '), '')
                   AS vocab_only_a
        FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1
    """,
    doc=(
        "Array set algebra on adjacent docs' vocabularies: union / "
        "intersect / except, canonically sorted and serialized (§2.0 "
        "rules 6+11). Spark's array_union/intersect/except are "
        "distinct-semantics; the oracle emulates with list lambdas."
    ),
)
def arr_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_management_and_analytics_spark.functions.strings import tokens

    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.array_distinct(tokens(F.col("text"))).alias("t"))
    a = toks.alias("a")
    b = toks.alias("b")
    return a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1).select(
        F.col("a.doc_id").alias("doc_id"),
        F.concat_ws(
            " ", F.sort_array(F.array_union(F.col("a.t"), F.col("b.t")))
        ).alias("vocab_union"),
        F.concat_ws(
            " ", F.sort_array(F.array_intersect(F.col("a.t"), F.col("b.t")))
        ).alias("vocab_common"),
        F.concat_ws(
            " ", F.sort_array(F.array_except(F.col("a.t"), F.col("b.t")))
        ).alias("vocab_only_a"),
    )


@register(
    "map_higher_order",
    "H",
    oracle="""
        WITH counts AS (
            SELECT user_id, event_type, COUNT(*) AS n
            FROM events
            GROUP BY user_id, event_type
        )
        SELECT user_id,
               COALESCE(
                   string_agg(event_type || ':' || CAST(n * 2 AS VARCHAR), ','
                              ORDER BY event_type)
                       FILTER (WHERE n >= 2),
                   ''
               ) AS busy_types
        FROM counts
        GROUP BY user_id
    """,
    doc=(
        "Higher-order map functions: per-user event-type count map -> "
        "map_filter (keep counts >= 2) -> transform_values (x2) -> "
        "entries serialized sorted-by-key (§2.0.5: no raw MAP output). "
        "The oracle computes the same relationally with string_agg "
        "(ORDER BY event_type) — both sides serialize key-ascending."
    ),
)
def map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    busy = F.transform_values(
        F.map_filter(F.col("m"), lambda k, v: v >= 2), lambda k, v: v * 2
    )
    entries = F.transform(
        F.sort_array(F.map_entries(busy)),
        lambda e: F.concat_ws(":", e.key, e.value.cast("string")),
    )
    return m.select("user_id", F.concat_ws(",", entries).alias("busy_types"))


@register(
    "gen_explode_outer",
    "H",
    oracle="""
        WITH longtoks AS (
            SELECT doc_id,
                   LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\\s+'),
                               t -> LENGTH(t) > 8) AS lt
            FROM documents
        )
        SELECT doc_id, UNNEST(
            CASE WHEN LEN(lt) = 0 THEN [NULL]::VARCHAR[] ELSE lt END
        ) AS long_token
        FROM longtoks
    """,
    doc=(
        "explode_outer generator: documents with no >8-char token survive "
        "with a NULL row (outer semantics). Oracle pads empty lists with "
        "[NULL] before UNNEST - same row multiset."
    ),
)
def gen_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    lt = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: F.length(t) > 8
    )
    return d.select("doc_id", F.explode_outer(lt).alias("long_token"))


@register(
    "arr_advanced",
    "H",
    oracle="""
        WITH toks AS (
            SELECT doc_id, STRING_SPLIT_REGEX(LOWER(text), '\\s+') AS t
            FROM documents
        )
        SELECT doc_id,
               CAST(COALESCE(LIST_POSITION(t, 'spark'), 0) AS BIGINT) AS pos_spark,
               COALESCE(ARRAY_TO_STRING(
                   FLATTEN([LIST_SLICE(t, 1, 3), LIST_SLICE(t, 4, 6)]), ' '),
                   '') AS first6,
               COALESCE(ARRAY_TO_STRING(
                   LIST_FILTER(t, x -> x <> 'spark'), ' '), '') AS no_spark,
               COALESCE(ARRAY_TO_STRING(
                   LIST_PREPEND('<s>', LIST_APPEND(t, '</s>')), ' '), '')
                   AS sentinel_wrapped
        FROM toks
    """,
    doc=(
        "Advanced array surface: array_position (0 when absent, matching "
        "COALESCE(list_position)), flatten of slices, array_remove, "
        "prepend/append sentinels - serialized via concat_ws per SURVEY "
        "rule 2.0.6/11 (DuckDB array_to_string on empty lists yields NULL, "
        "hence the COALESCE wrap)."
    ),
)
def arr_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", F.split(F.lower(F.col("text")), r"\s+").alias("t")
    )
    t = F.col("t")
    return base.select(
        "doc_id",
        F.array_position(t, "spark").alias("pos_spark"),
        F.concat_ws(
            " ", F.flatten(F.array(F.slice(t, 1, 3), F.slice(t, 4, 3)))
        ).alias("first6"),
        F.concat_ws(" ", F.array_remove(t, "spark")).alias("no_spark"),
        F.concat_ws(
            " ", F.array_prepend(F.array_append(t, "</s>"), "<s>")
        ).alias("sentinel_wrapped"),
    )


@register(
    "gen_stack",
    "H",
    oracle="""
        SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    """,
    doc=(
        "stack() generator - the wide-to-long pivot inverse as a "
        "zero-shuffle row generator (3x fan-out inside the scan stage, "
        "no union re-scan: one pass emits all measures, vs the oracle's "
        "triple scan). Values are per-row scalars, bit-identical."
    ),
)
def gen_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'price', l_extendedprice,"
            " 'discount', l_discount)"
        ).alias("measure", "val"),
    )
