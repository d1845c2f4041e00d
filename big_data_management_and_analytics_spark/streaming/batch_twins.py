"""Category I (batch twins) — streaming semantics verified as batch
queries (SURVEY.md §2.I strategy: every streaming operator has a
batch-equivalent oracle; the true-streaming twins in live.py share the
same aggregation specs so they cannot drift).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from big_data_management_and_analytics_spark.plans.determinism import money_sum_fast
from big_data_management_and_analytics_spark.plans.registry import register
from big_data_management_and_analytics_spark.sources.io import load


# Oracle SQL shared between each batch twin and its live twin in live.py:
# the live twins emit exactly the batch results on a bounded replay
# (complete/append mode, asserted equal in tests), so one oracle serves
# both registrations and the two tiers cannot drift.
TUMBLING_ORACLE = """
        SELECT event_type,
               time_bucket(INTERVAL '1 hour', ts) AS window_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY event_type, time_bucket(INTERVAL '1 hour', ts)
"""

SLIDING_ORACLE = """
        SELECT event_type,
               time_bucket(INTERVAL '5 minutes', ts) - k.k * INTERVAL '5 minutes' AS window_start,
               COUNT(*) AS n_events
        FROM events
        CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS k) AS k
        GROUP BY event_type, time_bucket(INTERVAL '5 minutes', ts) - k.k * INTERVAL '5 minutes'
"""

SESSION_ORACLE = """
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL '30 minutes'
                        OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        ),
        numbered AS (
            SELECT user_id, ts,
                   SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_id
            FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL '30 minutes' AS session_end,
               COUNT(*) AS n_events
        FROM numbered
        GROUP BY user_id, session_id
"""

DEDUP_ORACLE = "SELECT DISTINCT user_id, event_type FROM events"


def tumbling_agg(events: DataFrame) -> DataFrame:
    """Shared spec: 1-hour tumbling count+sum per event_type.

    Used identically by stream_tumbling_batch and stream_tumbling_live
    (SURVEY.md §7 hard-item 7: one spec, two execution modes).
    """
    return (
        events.groupBy("event_type", F.window("ts", "1 hour").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum_fast("value", "sum_value"),
        )
        .select(
            "event_type",
            F.col("win.start").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_tumbling_batch",
    "I",
    oracle=TUMBLING_ORACLE,
    doc="1-hour tumbling window count+sum per event_type (batch twin).",
)
def stream_tumbling_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_agg(load(spark, sf_dir, "events"))


@register(
    "stream_sliding_batch",
    "I",
    oracle=SLIDING_ORACLE,
    doc=(
        "10-min windows sliding by 5 min; oracle expands each event into "
        "its 2 covering windows via generate_series (P4 sliding_via_series)."
    ),
)
def stream_sliding_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_agg(load(spark, sf_dir, "events"))


def sliding_agg(events: DataFrame) -> DataFrame:
    """Shared spec: 10-min windows sliding 5 min, count per event_type."""
    return (
        events.groupBy(
            "event_type", F.window("ts", "10 minutes", "5 minutes").alias("win")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "event_type", F.col("win.start").alias("window_start"), "n_events"
        )
    )


@register(
    "stream_session_batch",
    "I",
    oracle=SESSION_ORACLE,
    doc=(
        "Session windows (30-min gap) per user; oracle is the classic "
        "gaps-and-islands rewrite (P4). session_end = last event + gap, and "
        "the merge boundary is INCLUSIVE: a gap of exactly 30min still "
        "merges (hence strict > in the oracle; verified on literal rows)."
    ),
)
def stream_session_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_agg(load(spark, sf_dir, "events"))


def session_agg(events: DataFrame) -> DataFrame:
    """Shared spec: 30-min-gap session windows per user."""
    return (
        events.groupBy("user_id", F.session_window("ts", "30 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "stream_dedup_batch",
    "I",
    oracle=DEDUP_ORACLE,
    doc=(
        "Keyed dedup (dropDuplicates ≡ streaming dedup state); keys-only "
        "output — which duplicate survives is nondeterministic, the key set "
        "is not (§2.I note)."
    ),
)
def stream_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.dropDuplicates(["user_id", "event_type"]).select("user_id", "event_type")


@register(
    "stream_static_join_batch",
    "I",
    oracle="""
        SELECT c_mktsegment, event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment, event_type
    """,
    doc=(
        "Stream-static enrichment: events joined to the customer dim "
        "(broadcast — identical plan under readStream)."
    ),
)
def stream_static_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum_fast("value", "sum_value"),
        )
    )


@register(
    "stream_rollup_multires",
    "I",
    oracle="""
        SELECT event_type,
               time_bucket(INTERVAL '1 day', ts) AS day_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY event_type, time_bucket(INTERVAL '1 day', ts)
    """,
    doc=(
        "Hypertable-style continuous aggregate: raw events roll up to an "
        "HOURLY materialization (count + exact integer-cents sum), and the "
        "daily resolution re-aggregates the hourly table — never the raw "
        "events. Counts and cents compose exactly across levels, so "
        "daily-from-hourly is bit-identical to daily-from-raw (the oracle "
        "computes from raw, proving it). At 100 TB the hourly rollup is the "
        "stored continuous aggregate (24× smaller per day) and every "
        "coarser resolution reads it instead of rescanning the raw stream."
    ),
)
def stream_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_management_and_analytics_spark.plans.determinism import cents

    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("event_type", F.window("ts", "1 hour").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents("value")).alias("sum_cents"),  # exact; composes upward
        )
        .select(
            "event_type",
            F.col("win.start").alias("hour_start"),
            "n_events",
            "sum_cents",
        )
    )
    return (
        hourly.groupBy(
            "event_type", F.date_trunc("day", "hour_start").alias("day_start")
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            (F.sum("sum_cents") / 100.0).alias("sum_value"),
        )
    )
