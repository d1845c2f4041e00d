"""Per-round driver-verification history.

The driver's correctness pass (CORRECTNESS_r{N}.json) verifies the FIRST
~50 ids yielded by ``__spark_entry__.queries()`` each round — registration
order is the queue. To get every SURVEY §2 operator a driver-green row,
``__spark_entry__`` re-orders the queue each round so ids that have never
reached a CORRECTNESS file enqueue first (SURVEY §2 oracle-tier ids ahead
of extras, rows-tier last within the unverified block).

Append each new round's CORRECTNESS keys below after the driver runs.
"""

from __future__ import annotations

# Keys of CORRECTNESS_r01.json (driver round 1): 41 hash-verified +
# 9 rows-only. All were enqueued first by original registration order.
VERIFIED_R01: frozenset[str] = frozenset(
    {
        "src_custom_datasource",
        "src_stream_datasource",
        "scan_parquet_full",
        "scan_projection",
        "scan_pushdown_filter",
        "scan_events_ns",
        "sink_view_sql",
        "src_csv_roundtrip",
        "src_json_roundtrip",
        "src_orc_roundtrip",
        "sink_bucketed_join",
        "sink_parquet_partitioned",
        "src_text_roundtrip",
        "scan_metadata_cols",
        "sql_scalar_subquery",
        "sql_exists_correlated",
        "sql_recursive_cte",
        "sql_lateral_topk",
        "meta_table_stats",
        "proj_compute",
        "filter_compound",
        "filter_null_semantics",
        "proj_case_when",
        "proj_distinct",
        "proj_cast_matrix",
        "proj_fillna_dropna",
        "proj_try_arith",
        "join_inner_equi",
        "join_left_outer",
        "join_right_outer",
        "join_full_outer",
        "join_left_semi",
        "join_left_anti",
        "join_broadcast_star",
        "join_star_5way",
        "join_theta_band",
        "join_cross",
        "join_self_succ",
        "join_salted_skew",
        "join_asof_event",
        "join_interval_pairs",
        "join_range_bucket",
        "join_hint_smj",
        "join_existence_flag",
        "join_asof_forward",
        "agg_pricing_summary",
        "agg_global",
        "agg_count_distinct",
        "agg_multi_distinct",
        "agg_having",
    }
)

DRIVER_VERIFIED: frozenset[str] = VERIFIED_R01


def queue_order(registry, survey_ids: set[str]) -> list[str]:
    """Order query ids for the driver queue: never-verified SURVEY §2
    oracle ids first, then never-verified extra oracle ids, then
    never-verified rows-tier ids, then everything already verified
    (original registration order within each block)."""

    def prio(name: str) -> int:
        q = registry[name]
        if name in DRIVER_VERIFIED:
            return 3
        if q.oracle and name in survey_ids:
            return 0
        if q.oracle:
            return 1
        return 2

    reg_pos = {n: i for i, n in enumerate(registry)}
    return sorted(registry, key=lambda n: (prio(n), reg_pos[n]))
