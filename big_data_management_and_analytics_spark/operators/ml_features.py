"""ML feature-engineering operators: the table-in/table-out preprocessing
steps a training pipeline runs ahead of any model fit — scaling, encoding,
binning, the hashing trick, and a deterministic bootstrap.

All are published preprocessing shapes (Hastie/Tibshirani/Friedman for
scaling & binning; Micci-Barreca, SIGKDD Expl. 2001 for smoothed target
encoding; Weinberger et al., ICML 2009 for feature hashing; Chamandy et
al., "Estimating uncertainty for massive data streams", Google TR 2012
for the Poisson bootstrap) re-expressed Spark-first:

- Scalers join a per-group aggregate (≤ distinct-group rows, broadcast)
  back to the fact rows — never a per-group window, whose parallelism
  collapses to the distinct-group count (5 priorities ≠ 1000 executors).
- Moments accumulate exactly (integer cents / DECIMAL(38,0) squares),
  so the scaled output is one IEEE expression over exact integers —
  bit-identical cross-engine without rounding tricks beyond the final
  ROUND(...,6) projection.
- The bootstrap is the hash-seeded Poisson(1) resample: replica weights
  are a pure column expression, so 32 virtual resamples cost one
  explode + one aggregate — no data movement per replica, the only
  formulation that survives 100 TB (driver-side sampling loops do not).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from big_data_management_and_analytics_spark.operators.global_rank import (
    ntile_expr,
    with_global_row_number,
)
from big_data_management_and_analytics_spark.plans.determinism import cents
from big_data_management_and_analytics_spark.plans.registry import register
from big_data_management_and_analytics_spark.sources.io import load

# Poisson(1) CDF thresholds (exact doubles of e^-1 partial sums): a
# hash-uniform u in [0,1) maps to the replica multiplicity w via the
# inverse-CDF walk. P(w>5) ≈ 6e-5 is truncated to w=5 — the same
# truncation both engines apply, so determinism is unaffected.
_POIS_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
)

_TWO60 = 1152921504606846976.0  # 2^60 as an exact double


@register(
    "feat_standard_scale",
    "L",
    oracle="""
        WITH m AS (
            SELECT o_orderpriority,
                   COUNT(*) AS n,
                   SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS s,
                   SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                            * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                            AS DECIMAL(38,0))) AS ss
            FROM orders GROUP BY o_orderpriority
        )
        SELECT o.o_orderkey, o.o_orderpriority,
               ROUND(
                   (CAST(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                         AS DOUBLE)
                    - CAST(m.s AS DOUBLE) / m.n)
                   / sqrt((CAST(m.ss AS DOUBLE)
                           - CAST(m.s AS DOUBLE) * CAST(m.s AS DOUBLE) / m.n)
                          / (m.n - 1)),
                   6) AS z_score
        FROM orders o JOIN m ON o.o_orderpriority = m.o_orderpriority
    """,
    doc=(
        "STANDARD (z-score) SCALING of order totals within each order "
        "priority — the per-group variant of the classic preprocessing "
        "step. Group moments (n, Σx, Σx²) accumulate EXACTLY (integer "
        "cents; squares in DECIMAL(38,0) so a 100 TB group cannot "
        "overflow), then z = (x−Σx/n)/√((Σx²−(Σx)²/n)/(n−1)) is one "
        "IEEE double expression over exact integers — deterministic "
        "cross-engine because every input to the float math is exact. "
        "Plan: hash-agg to 5 moment rows, BROADCAST join back to the "
        "facts (a window partitioned by priority would collapse "
        "parallelism to 5 tasks at any scale — the scaler family rule). "
        "The cents trick is plans/determinism.py's fast path; z is "
        "scale-invariant so cents need no /100 correction."
    ),
)
def feat_standard_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", cents("o_totalprice").alias("_xc")
    )
    m = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_xc").alias("_s"),
        F.sum((F.col("_xc") * F.col("_xc")).cast("decimal(38,0)")).alias("_ss"),
    )
    s_d = F.col("_s").cast("double")
    var = (F.col("_ss").cast("double") - s_d * s_d / F.col("_n")) / (
        F.col("_n") - 1
    )
    return (
        o.join(F.broadcast(m), "o_orderpriority")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(
                (F.col("_xc").cast("double") - s_d / F.col("_n"))
                / F.sqrt(var),
                6,
            ).alias("z_score"),
        )
    )


@register(
    "feat_minmax_scale",
    "L",
    oracle="""
        WITH m AS (
            SELECT l_returnflag,
                   MIN(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS lo,
                   MAX(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS hi
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
               ROUND(
                   CAST(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                        - m.lo AS DOUBLE)
                   / (m.hi - m.lo), 6) AS mm_scaled
        FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
    """,
    doc=(
        "MIN-MAX SCALING of extended price to [0,1] within each return "
        "flag. Group extrema in exact integer cents (min/max are "
        "order-independent and exact), one broadcast join back, one "
        "double division — the entire float surface is a single IEEE "
        "divide over exact integers, so ROUND(...,6) is decorative "
        "rather than load-bearing. Same broadcast-not-window plan rule "
        "as feat_standard_scale (3 flags ≪ cluster width)."
    ),
)
def feat_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        cents("l_extendedprice").alias("_xc"),
    )
    m = l.groupBy("l_returnflag").agg(
        F.min("_xc").alias("_lo"), F.max("_xc").alias("_hi")
    )
    return (
        l.join(F.broadcast(m), "l_returnflag")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.round(
                (F.col("_xc") - F.col("_lo")).cast("double")
                / (F.col("_hi") - F.col("_lo")),
                6,
            ).alias("mm_scaled"),
        )
    )


@register(
    "feat_robust_scale",
    "L",
    oracle="""
        WITH c AS (
            SELECT l_orderkey, l_linenumber, l_linestatus,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc
            FROM lineitem
        ),
        m AS (
            SELECT l_linestatus,
                   PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY xc) AS med,
                   PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY xc) AS q1,
                   PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY xc) AS q3
            FROM c GROUP BY l_linestatus
        )
        SELECT c.l_orderkey, c.l_linenumber, c.l_linestatus,
               ROUND((c.xc - m.med) / (m.q3 - m.q1), 6) + 0.0 AS robust_z
        FROM c JOIN m ON c.l_linestatus = m.l_linestatus
    """,
    doc=(
        "ROBUST SCALING (median/IQR — the outlier-resistant scaler, "
        "Hastie et al. ch.3 preprocessing) of extended price within each "
        "line status, completing the scaler family (standard/minmax/"
        "target/robust). Quartiles interpolate over exact integer cents "
        "with dyadic fractions ((n−1)·q has fractional part in "
        "{0, .25, .5, .75}), so every interpolated quartile is an EXACT "
        "double and (x − med)/(q3 − q1) is one IEEE expression over "
        "exact values — the agg_percentile_exact determinism argument. "
        "Plan: one hash aggregate to ≤|statuses| quartile rows, "
        "BROADCAST join back to the facts — same broadcast-not-window "
        "rule as the other scalers (asserted in test_plans): a window "
        "partitioned by 3 statuses would cap parallelism at 3 tasks "
        "at ANY cluster width."
    ),
)
def feat_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_linestatus",
        cents("l_extendedprice").alias("_xc"),
    )
    m = l.groupBy("l_linestatus").agg(
        F.percentile("_xc", F.lit(0.5)).alias("_med"),
        F.percentile("_xc", F.lit(0.25)).alias("_q1"),
        F.percentile("_xc", F.lit(0.75)).alias("_q3"),
    )
    return (
        l.join(F.broadcast(m), "l_linestatus")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_linestatus",
            (
                F.round(
                    (F.col("_xc") - F.col("_med"))
                    / (F.col("_q3") - F.col("_q1")),
                    6,
                )
                # -0.0 normalization (determinism rule: +0.0 both engines)
                + F.lit(0.0)
            ).alias("robust_z"),
        )
    )


@register(
    "feat_target_encode",
    "L",
    oracle="""
        WITH seg AS (
            SELECT c.c_mktsegment,
                   COUNT(*) AS n_orders,
                   SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS s
            FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        ),
        g AS (SELECT SUM(n_orders) AS gn, SUM(s) AS gs FROM seg)
        SELECT seg.c_mktsegment,
               CAST(seg.n_orders AS BIGINT) AS n_orders,
               ROUND(
                   CAST(CAST(seg.s AS DECIMAL(38,0)) * g.gn
                        + 10 * CAST(g.gs AS DECIMAL(38,0)) AS DOUBLE)
                   / CAST(CAST(g.gn AS DECIMAL(38,0))
                          * (seg.n_orders + 10) AS DOUBLE)
                   / 100.0, 6) AS encoding
        FROM seg CROSS JOIN g
    """,
    doc=(
        "SMOOTHED TARGET ENCODING (Micci-Barreca 2001) of market segment "
        "by mean order total: enc = (Σy + m·ȳ_global)/(n + m), m=10 — "
        "the additive-smoothing mean that shrinks rare categories toward "
        "the global prior. Algebra is cleared to one division: "
        "(s·gn + m·gs)/(gn·(n+m)) with every product exact in "
        "DECIMAL(38,0), so both engines divide the same two integers. "
        "Plan: one hash-agg over the fact join (segment key), one 1-row "
        "global fold broadcast back — output is the 5-row encoder "
        "mapping table a pipeline would broadcast-join onto any fact "
        "table downstream; the encoder FIT is the distributed part."
    ),
)
def feat_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", cents("o_totalprice").alias("_yc")
    )
    seg = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("_yc").alias("_s"))
    )
    g = seg.agg(
        F.sum("n_orders").alias("_gn"), F.sum("_s").alias("_gs")
    )
    num = (
        F.col("_s").cast("decimal(38,0)") * F.col("_gn")
        + 10 * F.col("_gs").cast("decimal(38,0)")
    )
    den = F.col("_gn").cast("decimal(38,0)") * (F.col("n_orders") + 10)
    return (
        seg.crossJoin(F.broadcast(g))
        .select(
            "c_mktsegment",
            F.col("n_orders").cast("bigint").alias("n_orders"),
            F.round(
                num.cast("double") / den.cast("double") / 100.0, 6
            ).alias("encoding"),
        )
    )


@register(
    "feat_onehot",
    "L",
    oracle="""
        SELECT o_orderkey,
               CAST(CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
                    WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
                    WHEN '5-LOW' THEN 5 ELSE 0 END AS INT) AS pri_idx,
               CAST(o_orderpriority = '1-URGENT' AS INT) AS pri_urgent,
               CAST(o_orderpriority = '2-HIGH' AS INT) AS pri_high,
               CAST(o_orderpriority = '3-MEDIUM' AS INT) AS pri_medium,
               CAST(o_orderpriority = '4-NOT SPECIFIED' AS INT) AS pri_notspec,
               CAST(o_orderpriority = '5-LOW' AS INT) AS pri_low
        FROM orders
    """,
    doc=(
        "ONE-HOT ENCODING of the order-priority categorical into five "
        "indicator columns plus the dense ordinal index (the two "
        "encodings every ML featurizer emits; StringIndexer + "
        "OneHotEncoder's table form). Pure per-row projection — "
        "map-only, codegen, zero shuffle; the category vocabulary is "
        "the fixed TPC-H priority domain so no fit pass is needed "
        "(for open vocabularies feat_hashing_trick is the scale path — "
        "no vocabulary collect at 100 TB)."
    ),
)
def feat_onehot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    cats = [
        ("1-URGENT", "pri_urgent"),
        ("2-HIGH", "pri_high"),
        ("3-MEDIUM", "pri_medium"),
        ("4-NOT SPECIFIED", "pri_notspec"),
        ("5-LOW", "pri_low"),
    ]
    idx = F.lit(0)
    for i, (val, _) in reversed(list(enumerate(cats, start=1))):
        idx = F.when(F.col("o_orderpriority") == val, i).otherwise(idx)
    return o.select(
        "o_orderkey",
        idx.cast("int").alias("pri_idx"),
        *[
            (F.col("o_orderpriority") == val).cast("int").alias(name)
            for val, name in cats
        ],
    )


@register(
    "feat_hashing_trick",
    "L",
    oracle="""
        WITH toks AS (
            SELECT p_partkey,
                   UNNEST(string_split_regex(lower(p_type), '\\s+')) AS tok
            FROM part
        ),
        hashed AS (
            SELECT p_partkey,
                   CAST(('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS INT)
                       AS bucket,
                   CASE WHEN ('0x' || substr(md5(tok), 17, 15))::BIGINT % 2 = 0
                        THEN 1 ELSE -1 END AS sgn
            FROM toks
        )
        SELECT p_partkey, bucket,
               CAST(SUM(sgn) AS BIGINT) AS feat_val
        FROM hashed GROUP BY p_partkey, bucket
    """,
    doc=(
        "FEATURE HASHING (the hashing trick — Weinberger et al., ICML "
        "2009): part-type tokens land in 64 hash buckets with a second "
        "hash choosing ±1 signs, so collisions cancel in expectation. "
        "The output is the sparse (row, bucket, value) feature triple — "
        "the representation that needs NO vocabulary fit, no dictionary "
        "broadcast, and no global state at 100 TB (the open-vocabulary "
        "counterpart to feat_onehot). Hashes are the portable md5 family "
        "(functions/portable_hash.py) so bucket assignment is "
        "bit-identical cross-engine; plan is explode + one hash "
        "aggregate on (row, bucket) — linear, map-side combinable."
    ),
)
def feat_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_management_and_analytics_spark.functions.portable_hash import (
        ph0_hex,
        ph1_hex,
    )
    from big_data_management_and_analytics_spark.functions.strings import tokens

    p = load(spark, sf_dir, "part").select(
        "p_partkey", F.explode(tokens(F.col("p_type"))).alias("tok")
    )
    hx = p.withColumn("_hx", F.md5(F.col("tok")))
    return (
        hx.select(
            "p_partkey",
            (ph0_hex(F.col("_hx")) % 64).cast("int").alias("bucket"),
            F.when(ph1_hex(F.col("_hx")) % 2 == 0, 1)
            .otherwise(-1)
            .alias("sgn"),
        )
        .groupBy("p_partkey", "bucket")
        .agg(F.sum("sgn").cast("bigint").alias("feat_val"))
    )


@register(
    "feat_quantile_bin",
    "L",
    oracle="""
        SELECT c_custkey,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS acctbal_cents,
               CAST(NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS INT) AS decile
        FROM customer
    """,
    doc=(
        "QUANTILE (equi-depth) BINNING: every customer is assigned its "
        "global account-balance decile — the row-level form of "
        "agg_equidepth (which outputs the 10-row histogram; this keeps "
        "the per-row feature a model consumes). The global NTILE runs "
        "through the range-partitioned two-pass rank "
        "(operators/global_rank.py) + closed-form ntile expression: no "
        "single-partition window, parallelism = range partitions at any "
        "scale. Total order includes the c_custkey tiebreak (§2.0 "
        "rule 4)."
    ),
)
def feat_quantile_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", cents("c_acctbal").alias("acctbal_cents")
    )
    ranked = with_global_row_number(
        c,
        [F.col("acctbal_cents").asc(), F.col("c_custkey").asc()],
        rn="_rn",
        total="_total",
    )
    return ranked.select(
        "c_custkey",
        "acctbal_cents",
        ntile_expr(F.col("_rn"), F.col("_total"), 10).alias("decile"),
    )


@register(
    "agg_bootstrap_ci",
    "D",
    oracle=f"""
        WITH reps AS (
            SELECT o_orderkey,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc,
                   UNNEST(generate_series(0, 31)) AS rep
            FROM orders
        ),
        weighted AS (
            SELECT rep, xc,
                   CASE
                     WHEN u < {_POIS_CDF[0]} THEN 0
                     WHEN u < {_POIS_CDF[1]} THEN 1
                     WHEN u < {_POIS_CDF[2]} THEN 2
                     WHEN u < {_POIS_CDF[3]} THEN 3
                     WHEN u < {_POIS_CDF[4]} THEN 4
                     ELSE 5
                   END AS w
            FROM (
                SELECT rep, xc,
                       ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
                                           || CAST(rep AS VARCHAR)), 1, 15))::BIGINT
                       / {_TWO60!r} AS u
                FROM reps
            )
        ),
        means AS (
            SELECT rep,
                   CAST(SUM(w * xc) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) / 100.0
                       AS m
            FROM weighted GROUP BY rep
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_replicas,
               ROUND(quantile_cont(m, 0.025), 6) AS ci_lo,
               ROUND(quantile_cont(m, 0.5), 6) AS ci_med,
               ROUND(quantile_cont(m, 0.975), 6) AS ci_hi
        FROM means
    """,
    doc=(
        "POISSON BOOTSTRAP confidence interval for the mean order total "
        "(Chamandy et al. 2012 — the streaming-friendly bootstrap): each "
        "of 32 replicas weights every row by an independent Poisson(1) "
        "draw, realized as a DETERMINISTIC inverse-CDF walk over a "
        "hash-uniform u = H(orderkey:rep)/2^60 (portable md5, so both "
        "engines draw identical weights — a seeded-RNG bootstrap could "
        "never hash-verify cross-engine). Replica means are exact-cents "
        "ratios; the 2.5/50/97.5 percentiles interpolate over 32 exact "
        "doubles (R-7 rule in both engines). Plan: explode ×32 + one "
        "map-side-combinable aggregate to 32 rows — no per-replica "
        "passes, no driver-side sampling; the explode factor is the "
        "replica count, independent of data size, so the shape holds at "
        "100 TB (weights could also fold into one pass via 32 "
        "conditional sums if the ×32 row inflation ever mattered)."
    ),
)
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", cents("o_totalprice").alias("xc")
    )
    reps = o.select(
        "o_orderkey", "xc", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("rep")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("o_orderkey").cast("string"),
                        F.col("rep").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(_TWO60)
    )
    w = (
        F.when(u < _POIS_CDF[0], 0)
        .when(u < _POIS_CDF[1], 1)
        .when(u < _POIS_CDF[2], 2)
        .when(u < _POIS_CDF[3], 3)
        .when(u < _POIS_CDF[4], 4)
        .otherwise(5)
    )
    means = (
        reps.withColumn("w", w)
        .groupBy("rep")
        .agg(
            (
                F.sum(F.col("w") * F.col("xc")).cast("double")
                / F.sum("w").cast("double")
                / 100.0
            ).alias("m")
        )
    )
    return means.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_replicas"),
        F.round(F.percentile("m", F.lit(0.025)), 6).alias("ci_lo"),
        F.round(F.percentile("m", F.lit(0.5)), 6).alias("ci_med"),
        F.round(F.percentile("m", F.lit(0.975)), 6).alias("ci_hi"),
    )


@register(
    "llm_nb_langid",
    "K",
    oracle="""
        WITH tok AS (
            SELECT doc_id, lang,
                   UNNEST(string_split_regex(lower(text), '\\s+')) AS tok
            FROM documents
        ),
        cnt AS (
            SELECT lang, tok, COUNT(*) AS c
            FROM tok WHERE doc_id % 5 != 0 GROUP BY lang, tok
        ),
        vocab AS (SELECT DISTINCT tok FROM cnt),
        vs AS (SELECT COUNT(*) AS v FROM vocab),
        nl AS (
            SELECT lang, COUNT(*) AS n_l
            FROM documents WHERE doc_id % 5 != 0 GROUP BY lang
        ),
        nt AS (SELECT COUNT(*) AS n FROM documents WHERE doc_id % 5 != 0),
        ls AS (
            SELECT nl.lang, t.tot, vs.v,
                   CAST(ROUND(ln(1.0 / (t.tot + vs.v)) * 1000000) AS BIGINT)
                       AS w0,
                   CAST(ROUND(ln(CAST(nl.n_l AS DOUBLE) / nt.n) * 1000000)
                        AS BIGINT) AS prior
            FROM nl
            JOIN (SELECT lang, SUM(c) AS tot FROM cnt GROUP BY lang) t
              USING (lang)
            CROSS JOIN vs CROSS JOIN nt
        ),
        dw AS (
            SELECT cnt.lang, cnt.tok,
                   CAST(ROUND(ln((cnt.c + 1.0) / (ls.tot + ls.v)) * 1000000)
                        AS BIGINT) - ls.w0 AS dw
            FROM cnt JOIN ls USING (lang)
        ),
        tt AS (
            SELECT doc_id, lang AS true_lang, tok, COUNT(*) AS c
            FROM tok
            WHERE doc_id % 5 = 0 AND tok IN (SELECT tok FROM vocab)
            GROUP BY 1, 2, 3
        ),
        td AS (
            SELECT doc_id, true_lang, SUM(c) AS ntok FROM tt GROUP BY 1, 2
        ),
        contrib AS (
            SELECT tt.doc_id, dw.lang, SUM(tt.c * dw.dw) AS sdw
            FROM tt JOIN dw ON tt.tok = dw.tok GROUP BY 1, 2
        ),
        scored AS (
            SELECT td.doc_id, td.true_lang, ls.lang,
                   ls.prior + td.ntok * ls.w0 + COALESCE(c.sdw, 0) AS score
            FROM td CROSS JOIN ls
            LEFT JOIN contrib c
              ON c.doc_id = td.doc_id AND c.lang = ls.lang
        )
        SELECT doc_id, true_lang, lang AS pred_lang,
               CAST(score AS BIGINT) AS score_micro,
               lang = true_lang AS correct
        FROM scored
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY score DESC, lang ASC) = 1
    """,
    doc=(
        "MULTINOMIAL NAIVE BAYES language classifier (add-one smoothing "
        "over the train vocabulary) with held-out evaluation: docs with "
        "doc_id %% 5 = 0 are scored by the model fit on the rest — the "
        "count-based classifier whose training IS a groupBy (token "
        "counts per class), the canonical fully-SQL-expressible ML fit. "
        "Log-likelihoods are quantized to INTEGER micro-nats per "
        "(token, class) — ROUND(ln(p)·1e6) — so the per-doc score sum "
        "and the argmax are EXACT integer arithmetic cross-engine (a "
        "raw double log-sum would be summation-order-sensitive, §2.0 "
        "rule 2). The zero-count baseline w0 folds into ntok·w0 so the "
        "weight table is |observed (token,class)| rows, never "
        "vocab×classes; unknown test tokens are dropped (vocab "
        "semi-join), docs with no known token are absent — both "
        "mirrored in the oracle. Plan: two token aggregates (train fit, "
        "test counts), one equi-join on token, one 5-class broadcast "
        "grid, one 5-row-per-doc window pick — everything keyed, "
        "map-side combinable, linear in corpus size."
    ),
)
def llm_nb_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from big_data_management_and_analytics_spark.functions.strings import tokens
    from big_data_management_and_analytics_spark.sources.io import spread

    d = load(spark, sf_dir, "documents")
    tok = spread(d, "doc_id").select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok")
    )
    tr = tok.filter(F.col("doc_id") % 5 != 0)
    cnt = tr.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    vocab = cnt.select("tok").distinct()
    vs = vocab.agg(F.count(F.lit(1)).alias("v"))
    nl = (
        d.filter(F.col("doc_id") % 5 != 0)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_l"))
    )
    nt = d.filter(F.col("doc_id") % 5 != 0).agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("lang").agg(F.sum("c").alias("tot"))
    micro = lambda c: F.round(c * 1000000).cast("long")  # noqa: E731
    ls = (
        nl.join(tot, "lang")
        .crossJoin(F.broadcast(vs))
        .crossJoin(F.broadcast(nt))
        .select(
            "lang",
            "tot",
            "v",
            micro(F.log(1.0 / (F.col("tot") + F.col("v")))).alias("w0"),
            micro(F.log(F.col("n_l").cast("double") / F.col("n"))).alias(
                "prior"
            ),
        )
    )
    dw = cnt.join(ls, "lang").select(
        "lang",
        "tok",
        (
            micro(F.log((F.col("c") + 1.0) / (F.col("tot") + F.col("v"))))
            - F.col("w0")
        ).alias("dw"),
    )
    tt = (
        tok.filter(F.col("doc_id") % 5 == 0)
        .join(vocab, "tok", "left_semi")
        .groupBy(
            "doc_id", F.col("lang").alias("true_lang"), "tok"
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    td = tt.groupBy("doc_id", "true_lang").agg(F.sum("c").alias("ntok"))
    contrib = (
        tt.join(dw.withColumnRenamed("lang", "cand_lang"), "tok")
        .groupBy("doc_id", "cand_lang")
        .agg(F.sum(F.col("c") * F.col("dw")).alias("sdw"))
    )
    scored = (
        td.crossJoin(F.broadcast(ls.select(F.col("lang").alias("cand_lang"), "w0", "prior")))
        .join(contrib, ["doc_id", "cand_lang"], "left")
        .select(
            "doc_id",
            "true_lang",
            "cand_lang",
            (
                F.col("prior")
                + F.col("ntok") * F.col("w0")
                + F.coalesce(F.col("sdw"), F.lit(0))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cand_lang").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "true_lang",
            F.col("cand_lang").alias("pred_lang"),
            F.col("score").cast("bigint").alias("score_micro"),
            (F.col("cand_lang") == F.col("true_lang")).alias("correct"),
        )
    )


# FROZEN trig literal tables (the ts_periodogram rule: sin/cos are not
# IEEE-correctly-rounded, so libm may differ per engine by an ulp —
# tables are generated once and injected as identical decimal literals
# into both plans). sin/cos(2π·h/24) for h ∈ 0..23, 2π·d/7 for d ∈ 0..6.
_HOUR_SIN = [
    0.0, 0.25881904510252074, 0.49999999999999994,
    0.7071067811865475, 0.8660254037844386, 0.9659258262890683,
    1.0, 0.9659258262890683, 0.8660254037844387,
    0.7071067811865476, 0.49999999999999994, 0.258819045102521,
    1.2246467991473532e-16, -0.2588190451025208, -0.4999999999999997,
    -0.7071067811865471, -0.8660254037844384, -0.9659258262890683,
    -1.0, -0.9659258262890684, -0.8660254037844386,
    -0.7071067811865477, -0.5000000000000004, -0.25881904510252157,
]
_HOUR_COS = [
    1.0, 0.9659258262890683, 0.8660254037844387,
    0.7071067811865476, 0.5000000000000001, 0.25881904510252074,
    6.123233995736766e-17, -0.25881904510252063, -0.4999999999999998,
    -0.7071067811865475, -0.8660254037844387, -0.9659258262890682,
    -1.0, -0.9659258262890683, -0.8660254037844388,
    -0.7071067811865479, -0.5000000000000004, -0.25881904510252063,
    -1.8369701987210297e-16, 0.2588190451025203, 0.5000000000000001,
    0.7071067811865474, 0.8660254037844384, 0.9659258262890681,
]
_DOW_SIN = [
    0.0, 0.7818314824680298, 0.9749279121818236,
    0.43388373911755823, -0.433883739117558, -0.9749279121818236,
    -0.7818314824680299,
]
_DOW_COS = [
    1.0, 0.6234898018587336, -0.22252093395631434,
    -0.900968867902419, -0.9009688679024191, -0.2225209339563146,
    0.6234898018587334,
]


def _sql_list(vals: list[float]) -> str:
    return "[" + ", ".join(repr(v) for v in vals) + "]"


@register(
    "feat_cyclic_encode",
    "L",
    oracle=f"""
        WITH enc AS (
            SELECT event_type,
                   CAST(hour(ts) AS INT) AS hr,
                   CAST((epoch_us(ts) // 86400000000 + 3) % 7 AS INT) AS dw
            FROM events
        )
        SELECT event_type, hr, dw,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(({_sql_list(_HOUR_SIN)})[hr + 1], 6) + 0.0 AS hour_sin,
               ROUND(({_sql_list(_HOUR_COS)})[hr + 1], 6) + 0.0 AS hour_cos,
               ROUND(({_sql_list(_DOW_SIN)})[dw + 1], 6) + 0.0 AS dow_sin,
               ROUND(({_sql_list(_DOW_COS)})[dw + 1], 6) + 0.0 AS dow_cos
        FROM enc GROUP BY 1, 2, 3
    """,
    doc=(
        "CYCLIC FEATURE ENCODING (sin/cos of hour-of-day and "
        "day-of-week): the standard fix for feeding periodic time "
        "features to models — hour 23 and hour 0 become neighbors on "
        "the unit circle instead of distance-23 integers; every "
        "tabular-ML pipeline over event data carries these columns. "
        "Determinism: the 24+7 sin/cos values are FROZEN literal "
        "tables (the ts_periodogram rule — sin/cos are not IEEE-"
        "correctly-rounded, so runtime libm may differ by an ulp "
        "between engines; identical decimal literals cannot), indexed "
        "by integer hour and by the engine-agnostic Monday-0 weekday "
        "(epoch_days + 3) mod 7 — neither engine's dayofweek "
        "convention (Spark Sunday=1, DuckDB Sunday=0) touches the "
        "plan. Grouped to the (type, hour, dow) grid (≤ 5·24·7 rows) "
        "so the feature table is broadcast-sized; ungrouped, the same "
        "two projections bolt onto any per-event plan map-only."
    ),
)
def feat_cyclic_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("int").alias("hr"),
        # Integer `div`, not floor(double /): double rounding near
        # midnight could disagree with the oracle's exact // division.
        ((F.expr("unix_micros(ts) div 86400000000") + 3) % 7)
        .cast("int")
        .alias("dw"),
    )
    hs = F.array(*[F.lit(v) for v in _HOUR_SIN])
    hc = F.array(*[F.lit(v) for v in _HOUR_COS])
    ds = F.array(*[F.lit(v) for v in _DOW_SIN])
    dc = F.array(*[F.lit(v) for v in _DOW_COS])
    return (
        e.groupBy("event_type", "hr", "dw")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "event_type",
            "hr",
            "dw",
            "n_events",
            (F.round(F.element_at(hs, F.col("hr") + 1), 6) + F.lit(0.0))
            .alias("hour_sin"),
            (F.round(F.element_at(hc, F.col("hr") + 1), 6) + F.lit(0.0))
            .alias("hour_cos"),
            (F.round(F.element_at(ds, F.col("dw") + 1), 6) + F.lit(0.0))
            .alias("dow_sin"),
            (F.round(F.element_at(dc, F.col("dw") + 1), 6) + F.lit(0.0))
            .alias("dow_cos"),
        )
    )


@register(
    "feat_quantile_normalize",
    "L",
    oracle="""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS d,
                   CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS xc
            FROM events GROUP BY 1, 2
        ),
        ranked AS (
            SELECT event_type, d, xc,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY xc, d
                   ) AS BIGINT) AS rk
            FROM daily
        ),
        ref AS (
            SELECT rk,
                   CAST(SUM(xc) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM ranked GROUP BY rk
        )
        SELECT r.event_type, strftime(r.d, '%Y-%m-%d') AS day,
               r.xc AS original_cents, r.rk AS rank,
               ROUND(CAST(ref.s AS DOUBLE) / ref.c, 6) AS normalized_cents
        FROM ranked r JOIN ref ON ref.rk = r.rk
    """,
    doc=(
        "QUANTILE NORMALIZATION (Bolstad et al., Bioinformatics 2003; "
        "the cross-sample distribution equalizer microarray pipelines "
        "made standard and feature-prep stacks borrowed): each "
        "event_type's daily cents series is rank-transformed, and "
        "every value is replaced by the MEAN of the same-rank values "
        "across all types — afterwards every series shares one "
        "reference distribution while keeping its own ordering, the "
        "fix when per-segment scale differences would swamp a "
        "downstream model (feat_standard_scale matches moments; this "
        "matches the whole distribution). Ranks beyond a shorter "
        "series average over the types that reach that rank (the "
        "unequal-length convention, declared). Determinism: ranks use "
        "the (value, day) total order; reference values are exact "
        "cents sums over exact counts, one round-6 division. Plan: "
        "one daily aggregate, one type-partitioned window, one "
        "rank-keyed aggregate + join back — all hash work, no global "
        "window, parallelism = series count then rank count."
    ),
)
def feat_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d"),
        cents("value").alias("_vc"),
    )
    daily = e.groupBy("event_type", "d").agg(
        F.sum("_vc").cast("bigint").alias("xc")
    )
    w = Window.partitionBy("event_type").orderBy(F.col("xc").asc(), F.col("d").asc())
    ranked = daily.withColumn(
        "rk", F.row_number().over(w).cast("bigint")
    )
    ref = ranked.groupBy("rk").agg(
        F.sum("xc").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    return ranked.join(F.broadcast(ref), "rk").select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("xc").alias("original_cents"),
        F.col("rk").alias("rank"),
        F.round(F.col("s").cast("double") / F.col("c"), 6).alias(
            "normalized_cents"
        ),
    )
