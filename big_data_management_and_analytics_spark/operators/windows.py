"""Category E — window functions (SURVEY.md §2.E).

Every window carries a total order (primary-key tiebreak appended) so rank /
frame contents are deterministic. Frame aggregates over money use the exact
decimal-sum discipline (§2.0 rule 1) instead of native double avg/sum.

Scale posture: one shuffle per distinct partitioning key; every query
partitions by either a real entity key (nation/customer/user) or the
range-partition id of the two-pass global rank (`operators/global_rank.py`)
— no single-partition window anywhere (asserted in tests/test_plans.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from big_data_management_and_analytics_spark.operators.global_rank import (
    cume_dist_expr,
    ntile_expr,
    percent_rank_expr,
    with_global_row_number,
)
from big_data_management_and_analytics_spark.plans.determinism import cents
from big_data_management_and_analytics_spark.plans.registry import register
from big_data_management_and_analytics_spark.sources.io import load


@register(
    "win_row_number",
    "E",
    oracle="""
        SELECT c_nationkey, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey ASC
               ) AS rn
        FROM customer
    """,
    doc="row_number per partition with total-order tiebreak.",
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_nationkey", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn")
    )


@register(
    "win_rank_dense",
    "E",
    oracle="""
        SELECT p_brand, p_partkey, p_size,
               RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS rnk,
               DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS drnk
        FROM part
    """,
    doc="rank/dense_rank over a tie-heavy key (p_size) — rank values are tie-stable.",
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_size").desc())
    return p.select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "win_ntile",
    "E",
    oracle="""
        SELECT c_custkey, c_acctbal,
               NTILE(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS quartile
        FROM customer
    """,
    doc="Quartiles of customers by account balance (total order → deterministic).",
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    # Global NTILE without the single-partition window: two-pass global
    # row_number (range partition + offsets) and the closed-form tile
    # expression over (rn, total) — SQL NTILE semantics exactly.
    ranked = with_global_row_number(
        c,
        [F.col("c_acctbal").asc(), F.col("c_custkey").asc()],
        rn="_rn",
        total="_n",
    )
    return ranked.select(
        "c_custkey",
        "c_acctbal",
        ntile_expr(F.col("_rn"), F.col("_n"), 4).alias("quartile"),
    )


@register(
    "win_lag_lead",
    "E",
    oracle="""
        SELECT event_id, user_id, ts, value,
               LAG(value, 1, 0.0) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
               LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
        FROM events
    """,
    doc="lag with default + lead (null at partition end) per user timeline.",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value", 1, 0.0).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
    )


@register(
    "win_running_sum",
    "E",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_spend
        FROM orders
    """,
    doc="Cumulative spend per customer — exact decimal prefix sums.",
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (F.sum(cents("o_totalprice")).over(w) / 100.0).alias("running_spend"),
    )


@register(
    "win_sliding_avg",
    "E",
    oracle="""
        SELECT o_custkey, o_orderkey,
               ROUND(
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
                   / COUNT(*) OVER w, 4) AS moving_avg_price
        FROM orders
        WINDOW w AS (
            PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
        )
    """,
    doc="3-row moving average as exact-frame-sum / frame-count.",
)
def win_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    avg = (F.sum(cents("o_totalprice")).over(w) / 100.0) / F.count(F.lit(1)).over(w)
    return o.select(
        "o_custkey", "o_orderkey", F.round(avg, 4).alias("moving_avg_price")
    )


@register(
    "win_range_frame",
    "E",
    oracle="""
        SELECT c_nationkey, c_custkey, c_acctbal,
               COUNT(*) OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal
                   RANGE BETWEEN 100 PRECEDING AND CURRENT ROW
               ) AS peers_within_100
        FROM customer
    """,
    doc="Value-range frame (RANGE BETWEEN 100 PRECEDING) over a numeric key.",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy("c_acctbal")
        .rangeBetween(-100, Window.currentRow)
    )
    return c.select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.count(F.lit(1)).over(w).alias("peers_within_100"),
    )


@register(
    "win_first_last",
    "E",
    oracle="""
        SELECT user_id, event_id, ts,
               FIRST_VALUE(event_type) OVER w AS first_type,
               LAST_VALUE(event_type) OVER w AS last_type
        FROM events
        WINDOW w AS (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    """,
    doc="first_value/last_value with an explicit full-partition frame.",
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
    )


@register(
    "win_pct_cume",
    "E",
    oracle="""
        SELECT s_suppkey, s_acctbal,
               ROUND(PERCENT_RANK() OVER (ORDER BY s_acctbal, s_suppkey), 6) AS pct_rank,
               ROUND(CUME_DIST() OVER (ORDER BY s_acctbal, s_suppkey), 6) AS cume,
               NTILE(10) OVER (ORDER BY s_acctbal, s_suppkey) AS decile
        FROM supplier
    """,
    doc="percent_rank / cume_dist / deciles over supplier balances.",
)
def win_pct_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    # percent_rank / cume_dist / ntile are all closed-form in the global
    # (row_number, total) pair — one two-pass ranked plan serves all three
    # with no single-partition window (the order is total, so no peers).
    ranked = with_global_row_number(
        s,
        [F.col("s_acctbal").asc(), F.col("s_suppkey").asc()],
        rn="_rn",
        total="_n",
    )
    rn, n = F.col("_rn"), F.col("_n")
    return ranked.select(
        "s_suppkey",
        "s_acctbal",
        F.round(percent_rank_expr(rn, n), 6).alias("pct_rank"),
        F.round(cume_dist_expr(rn, n), 6).alias("cume"),
        ntile_expr(rn, n, 10).alias("decile"),
    )


@register(
    "win_topk_per_group",
    "E",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
        ) <= 3
    """,
    doc="Top-3 orders per customer (row_number + filter ≡ QUALIFY).",
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "win_nth_value",
    "E",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice,
               nth_value(o_totalprice, 2) OVER (
                   PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS second_highest
        FROM orders
    """,
    doc=(
        "nth_value with an explicit full-partition frame (the default "
        "running frame would only see rows up to CURRENT ROW)."
    ),
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.nth_value("o_totalprice", 2).over(w).alias("second_highest"),
    )


@register(
    "win_dedup_latest",
    "E",
    oracle="""
        SELECT user_id, event_id, ts, event_type
        FROM events
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        ) = 1
    """,
    doc=(
        "Latest-record-per-key (SCD/upsert compaction): row_number over "
        "(ts DESC, event_id DESC) keeps exactly the newest event per user "
        "— the canonical changelog-compaction window."
    ),
)
def win_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


@register(
    "win_fill_forward",
    "E",
    oracle="""
        WITH sparse AS (
            SELECT event_id, user_id, ts,
                   CASE WHEN event_type = 'purchase' THEN value END AS pv
            FROM events
        )
        SELECT event_id, user_id,
               CAST(COALESCE(ROUND(last_value(pv IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 2), -1.0) AS DOUBLE) AS last_purchase_value
        FROM sparse
    """,
    doc=(
        "Forward fill (time-series gap filling): every event carries the "
        "most recent purchase value of its user via last_value IGNORE "
        "NULLS over a running frame — the standard sparse→dense propagation "
        "without self-joins; one shuffle on user_id. Sentinel -1 for "
        "users with no purchase yet (no NULL doubles in output)."
    ),
)
def win_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return ev.select(
        "event_id",
        "user_id",
        F.coalesce(
            F.round(F.last(pv, ignorenulls=True).over(w), 2), F.lit(-1.0)
        ).alias("last_purchase_value"),
    )


@register(
    "win_lag_ignore_nulls",
    "E",
    oracle="""
        WITH sparse AS (
            SELECT event_id, user_id, ts,
                   CASE WHEN event_type = 'purchase' THEN value END AS pv
            FROM events
        )
        SELECT event_id, user_id,
               CAST(COALESCE(ROUND(lag(pv IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ), 2), -1.0) AS DOUBLE) AS prev_purchase_value
        FROM sparse
    """,
    doc=(
        "lag ... IGNORE NULLS: the most recent STRICTLY-EARLIER purchase "
        "value per user (the forward-fill twin that excludes the current "
        "row - what you want for leakage-free feature engineering). "
        "Expressed through the SQL window expression surface "
        "(F.lag has no ignorenulls parameter); one shuffle on user_id."
    ),
)
def win_lag_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    sparse = e.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("pv"),
    )
    return sparse.selectExpr(
        "event_id",
        "user_id",
        """CAST(COALESCE(ROUND(lag(pv) IGNORE NULLS OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ), 2), -1.0) AS DOUBLE) AS prev_purchase_value""",
    )


@register(
    "win_range_interval",
    "E",
    oracle="""
        SELECT event_id, user_id,
               COUNT(*) OVER w AS n_1h,
               CAST((SUM(vc) OVER w) / 100.0 AS DOUBLE) AS sum_1h
        FROM (SELECT event_id, user_id, ts,
                     CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc
              FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    doc=(
        "Time-interval RANGE frame: per-user trailing 1-hour event count "
        "and exact-cents value sum - the classic sliding feature-window "
        "(fraud/abuse features) without a self-join. RANGE peers at equal "
        "timestamps are included identically in both engines; the cents "
        "sum keeps the frame aggregation order-independent. One shuffle "
        "on user_id; state is a bounded time window at stream scale."
    ),
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    base = e.select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).alias("vc"),
    )
    over = (
        "OVER (PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
    )
    return base.selectExpr(
        "event_id",
        "user_id",
        f"COUNT(*) {over} AS n_1h",
        f"CAST(SUM(vc) {over} / 100.0 AS DOUBLE) AS sum_1h",
    )


@register(
    "win_gaps_islands",
    "E",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTES
                        THEN 1 ELSE 0 END AS new_island
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        islands AS (
            SELECT user_id, ts,
                   SUM(new_island) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS island_id
            FROM flagged
        )
        SELECT user_id, CAST(island_id AS BIGINT) AS island_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(ts) AS island_start, MAX(ts) AS island_end
        FROM islands
        GROUP BY user_id, island_id
    """,
    doc=(
        "Gaps-and-islands sessionization via window functions: a lag-"
        "detected strict 30-minute gap starts a new island; the running "
        "sum of gap flags numbers islands per user; one groupBy summarizes "
        "each island. The window-function formulation of what "
        "session_window computes natively (whose merge boundary is "
        "INCLUSIVE — this one is strict >, matching the SQL convention). "
        "Scale: both windows and the final agg share ONE hash shuffle on "
        "user_id — the exchange is reused; integer flags/counts only, so "
        "partition-order exact."
    ),
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    prev = F.lag("ts").over(w)
    new_island = F.when(
        prev.isNull()
        | (F.unix_micros("ts") - F.unix_micros(prev) > gap_us),
        1,
    ).otherwise(0)
    flagged = ev.select("user_id", "ts", "event_id", new_island.alias("new_island"))
    island = F.sum("new_island").over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.select(
        "user_id", "ts", island.alias("island_id")
    )
    return islands.groupBy("user_id", "island_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("island_start"),
        F.max("ts").alias("island_end"),
    )


@register(
    "win_funnel_steps",
    "E",
    oracle="""
        WITH f AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'click' THEN ts END)
                       AS first_click
            FROM events GROUP BY user_id
        ),
        conv AS (
            SELECT e.user_id, MIN(e.ts) AS first_purchase
            FROM events e JOIN f ON e.user_id = f.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= f.first_click
            GROUP BY e.user_id
        )
        SELECT f.user_id, f.first_click, c.first_purchase,
               CAST(date_diff('microsecond', f.first_click, c.first_purchase)
                    AS BIGINT) AS conv_us
        FROM f LEFT JOIN conv c ON f.user_id = c.user_id
        WHERE f.first_click IS NOT NULL
    """,
    doc=(
        "Funnel analysis: per user, the first click and the first purchase "
        "AT OR AFTER it, with conversion latency — the standard two-step "
        "conversion query. One user_id shuffle total: a running min-click "
        "window marks each row's earliest prior click (clicks sort before "
        "other types at equal ts, matching the oracle's inclusive >=), so "
        "the conditional purchase-min in the same-keyed groupBy needs no "
        "self-join; window and aggregate reuse one partitioning. The "
        "oracle's formulation re-joins events against first clicks."
    ),
)
def win_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_type", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_click = F.col("event_type") == "click"
    is_purchase = F.col("event_type") == "purchase"
    flagged = ev.withColumn(
        "click_so_far", F.min(F.when(is_click, F.col("ts"))).over(w)
    )
    per_user = flagged.groupBy("user_id").agg(
        F.min(F.when(is_click, F.col("ts"))).alias("first_click"),
        F.min(
            F.when(is_purchase & F.col("click_so_far").isNotNull(), F.col("ts"))
        ).alias("first_purchase"),
    )
    return per_user.filter(F.col("first_click").isNotNull()).select(
        "user_id",
        "first_click",
        "first_purchase",
        (F.unix_micros("first_purchase") - F.unix_micros("first_click")).alias(
            "conv_us"
        ),
    )


@register(
    "win_interpolate",
    "E",
    oracle="""
        WITH s AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
            FROM events WHERE event_type = 'view'
        ),
        f AS (
            SELECT user_id, ts, event_id, v,
                   last_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS)
                       OVER w_prev AS pt,
                   last_value(v IGNORE NULLS) OVER w_prev AS pv,
                   first_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS)
                       OVER w_next AS nt,
                   first_value(v IGNORE NULLS) OVER w_next AS nv
            FROM s
            WINDOW w_prev AS (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   w_next AS (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT user_id, ts, event_id,
               ROUND(CASE WHEN v IS NOT NULL THEN v
                          WHEN pv IS NULL THEN nv
                          WHEN nv IS NULL THEN pv
                          WHEN pt = nt THEN pv
                          ELSE pv + (nv - pv)
                               * (CAST(date_diff('microsecond', pt, ts) AS DOUBLE)
                                  / CAST(date_diff('microsecond', pt, nt) AS DOUBLE))
                     END, 6) AS v_filled
        FROM f
    """,
    doc=(
        "Time-weighted linear interpolation of missing samples (every "
        "5th view's value nulled): two directional windows over one "
        "user_id shuffle carry the flanking (ts, value) anchors, then a "
        "closed-form lerp weighted by microsecond offsets fills the gap "
        "(edges forward/back-fill; identical expression order on both "
        "engines keeps the doubles bit-equal, rounded 6 as the spec). "
        "The standard sensor-series gap-fill — beyond win_fill_forward's "
        "step function."
    ),
)
def win_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    s = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_id") % 5 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    not_null_ts = F.when(F.col("v").isNotNull(), F.col("ts"))
    f = (
        s.withColumn("pt", F.last(not_null_ts, ignorenulls=True).over(w_prev))
        .withColumn("pv", F.last("v", ignorenulls=True).over(w_prev))
        .withColumn("nt", F.first(not_null_ts, ignorenulls=True).over(w_next))
        .withColumn("nv", F.first("v", ignorenulls=True).over(w_next))
    )
    frac = (F.unix_micros("ts") - F.unix_micros("pt")).cast("double") / (
        F.unix_micros("nt") - F.unix_micros("pt")
    ).cast("double")
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .when(F.col("pt") == F.col("nt"), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return f.select(
        "user_id", "ts", "event_id", F.round(filled, 6).alias("v_filled")
    )


@register(
    "win_ohlc_resample",
    "E",
    oracle="""
        WITH v AS (
            SELECT user_id, date_trunc('minute', ts) AS minute, ts, event_id,
                   value
            FROM events WHERE event_type = 'purchase'
        ),
        r AS (
            SELECT *,
                   row_number() OVER (PARTITION BY user_id, minute
                                      ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY user_id, minute
                                      ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM v
        )
        SELECT user_id, minute,
               MIN(CASE WHEN rn_a = 1 THEN value END) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               MIN(CASE WHEN rn_d = 1 THEN value END) AS close,
               COUNT(*) AS n_ticks
        FROM r
        GROUP BY user_id, minute
    """,
    doc=(
        "Time-series resampling to 1-minute OHLC bars per user: open and "
        "close via min_by/max_by on a (ts, event_id) struct key (total "
        "order — ties cannot flip the answer), high/low/count in the same "
        "single-shuffle aggregate over the tumbling window. The oracle "
        "pays two ranking windows + an aggregate for the same bars; "
        "min_by/max_by keep it one hash aggregate, partial-aggregated "
        "map-side — the shape that survives a billion ticks per key."
    ),
)
def win_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    key = F.struct("ts", "event_id")
    return (
        ev.groupBy("user_id", F.window("ts", "1 minute").alias("win"))
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("minute"),
            "open",
            "high",
            "low",
            "close",
            "n_ticks",
        )
    )


@register(
    "win_anomaly_mad",
    "E",
    oracle="""
        WITH med AS (
            SELECT user_id, quantile_cont(value, 0.5) AS med
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id
        ),
        dev AS (
            SELECT e.user_id,
                   quantile_cont(abs(e.value - m.med), 0.5) AS mad,
                   ANY_VALUE(m.med) AS med
            FROM events e JOIN med m ON e.user_id = m.user_id
            WHERE e.event_type = 'purchase'
            GROUP BY e.user_id
        )
        SELECT e.user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(ANY_VALUE(d.med), 6) AS median_value,
               ROUND(ANY_VALUE(d.mad), 6) AS mad,
               CAST(SUM(CASE WHEN abs(e.value - d.med) > 3 * d.mad
                             AND d.mad > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_outliers
        FROM events e JOIN dev d ON e.user_id = d.user_id
        WHERE e.event_type = 'purchase'
        GROUP BY e.user_id
        ORDER BY e.user_id
    """,
    doc=(
        "Robust anomaly detection: per-user median and median-absolute-"
        "deviation (the outlier-resistant z-score), flagging values more "
        "than 3 MADs from the median. Two exact interpolated percentiles "
        "per user (Spark percentile ≡ DuckDB quantile_cont, the parity "
        "agg_percentile_exact establishes) + one re-join of the small "
        "per-user stats — grouped medians shuffle once on user_id and "
        "the stats table broadcasts back."
    ),
)
def win_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "value")
    med = ev.groupBy("user_id").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    # Deviation projected first, then aggregated — percentile over a
    # plain column keeps the aggregate codegen-friendly.
    dev = (
        ev.join(F.broadcast(med), "user_id")
        .select("user_id", "med", F.abs(F.col("value") - F.col("med")).alias("adev"))
        .groupBy("user_id")
        .agg(
            F.expr("percentile(adev, 0.5)").alias("mad"),
            F.first("med").alias("med"),
        )
    )
    flagged = (
        ev.join(F.broadcast(dev), "user_id")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.first("med"), 6).alias("median_value"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum(
                F.when(
                    (F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad"))
                    & (F.col("mad") > 0),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )
    return flagged.orderBy("user_id")


@register(
    "win_retention_cohorts",
    "E",
    oracle="""
        WITH first_week AS (
            SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week
            FROM events
        ),
        cohort_size AS (
            SELECT cohort_week, COUNT(*) AS n_users
            FROM first_week GROUP BY cohort_week
        )
        SELECT f.cohort_week,
               CAST((epoch(a.act_week) - epoch(f.cohort_week)) / 604800
                    AS BIGINT) AS week_offset,
               CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active,
               ROUND(CAST(COUNT(DISTINCT a.user_id) AS DOUBLE)
                     / ANY_VALUE(s.n_users), 6) AS retention
        FROM activity a
        JOIN first_week f ON a.user_id = f.user_id
        JOIN cohort_size s ON f.cohort_week = s.cohort_week
        GROUP BY f.cohort_week, week_offset
        ORDER BY f.cohort_week, week_offset
    """,
    doc=(
        "Cohort retention: users cohorted by first-activity week, "
        "retention = share of the cohort active k weeks later. Both "
        "engines truncate to ISO Monday weeks, so the week offset is an "
        "exact integer division of epoch seconds. One user_id shuffle "
        "builds first-activity and distinct-week activity together; the "
        "O(weeks²) result joins the tiny cohort-size table broadcast. "
        "The product-analytics staple on the engine's exact-arithmetic "
        "terms."
    ),
)
def win_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    first_week = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).distinct()
    cohort_size = first_week.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    offset = (
        (F.unix_timestamp("act_week") - F.unix_timestamp("cohort_week")) / 604800
    ).cast("long")
    return (
        activity.join(first_week, "user_id")
        .join(F.broadcast(cohort_size), "cohort_week")
        .groupBy("cohort_week", offset.alias("week_offset"))
        .agg(
            F.countDistinct("user_id").alias("n_active"),
            F.round(
                F.countDistinct("user_id").cast("double") / F.first("n_users"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "win_count_distinct_rolling",
    "E",
    oracle="""
        WITH hourly AS (
            SELECT event_type,
                   date_trunc('hour', ts) AS hb,
                   CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS x,
                   list(DISTINCT user_id) AS ul,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2, 3
        )
        SELECT event_type, hb, n_events,
               CAST(len(list_distinct(flatten(list(ul) OVER (
                   PARTITION BY event_type ORDER BY x
                   RANGE BETWEEN 2 PRECEDING AND CURRENT ROW)))) AS BIGINT)
                   AS uniques_3h
        FROM hourly
    """,
    doc=(
        "Rolling 3-hour distinct-user count per event type — the sliding "
        "MAU/DAU-style uniques metric COUNT(DISTINCT) OVER cannot express "
        "in Spark (unsupported) and that naive per-row set-union makes "
        "quadratic. Two-level design: ONE hash aggregate to the hour "
        "grain carrying collect_set(user_id) (distinct within the hour "
        "— bounded state), then a per-entity RANGE-frame window over the "
        "integer hour index (missing hours shrink the frame, the rows-"
        "frame bug win_sliding_avg documents) flattening at most 3 hourly "
        "sets per row. Work is O(hours * hourly_uniques), never "
        "O(rows^2); set sizes are the only growth term and a 100 TB "
        "deployment swaps collect_set for an HLL sketch merge with the "
        "identical plan shape (agg_hll_sketch shows the sketch path). "
        "Exact integer output — no float anywhere."
    ),
)
def win_count_distinct_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("hb"), "user_id"
    )
    hourly = e.groupBy(
        "event_type",
        "hb",
        (F.unix_timestamp("hb") / 3600).cast("bigint").alias("x"),
    ).agg(
        F.collect_set("user_id").alias("ul"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rangeBetween(-2, Window.currentRow)
    )
    return hourly.select(
        "event_type",
        "hb",
        "n_events",
        F.size(F.array_distinct(F.flatten(F.collect_list("ul").over(w))))
        .cast("bigint")
        .alias("uniques_3h"),
    )


@register(
    "win_drawdown",
    "E",
    oracle="""
        WITH series AS (
            SELECT user_id, ts, event_id,
                   SUM(CASE WHEN event_type = 'purchase'
                            THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                            ELSE -CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                       END) OVER w AS bal
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        peaks AS (
            SELECT user_id, bal,
                   MAX(bal) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS peak
            FROM series
        )
        SELECT user_id,
               CAST(MAX(peak - bal) AS BIGINT) AS max_drawdown_cents,
               CAST(MAX(peak) AS BIGINT) AS peak_cents,
               ROUND(CAST(MAX(peak - bal) AS DOUBLE) / 100.0, 2)
                   AS max_drawdown
        FROM peaks
        GROUP BY user_id
    """,
    doc=(
        "Maximum drawdown of each user's running balance (purchases "
        "credit, everything else debits — a signed cash-flow proxy): "
        "running sum -> running peak -> max(peak - balance), the "
        "peak-to-trough risk metric every portfolio/limits system "
        "computes. Three stacked per-entity windows over ONE user-keyed "
        "shuffle (Spark chains same-partitioning windows without "
        "re-exchanging); all arithmetic is exact cents so no float "
        "enters until the final /100 report. Parallelism = users; "
        "linear."
    ),
)
def win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    signed = F.when(
        F.col("event_type") == "purchase", cents("value")
    ).otherwise(-cents("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    series = e.select(
        "user_id", "ts", "event_id", F.sum(signed).over(w).alias("bal")
    )
    peaks = series.withColumn("peak", F.max("bal").over(w))
    return peaks.groupBy("user_id").agg(
        F.max(F.col("peak") - F.col("bal"))
        .cast("bigint")
        .alias("max_drawdown_cents"),
        F.max("peak").cast("bigint").alias("peak_cents"),
        F.round(
            F.max(F.col("peak") - F.col("bal")).cast("double") / 100.0, 2
        ).alias("max_drawdown"),
    )
