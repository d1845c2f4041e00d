"""Shared scaffold for the two-pass associative-scan family.

One range shuffle (the shuffle a distributed sort of the output needs
anyway), a per-partition aggregate of ≤ #partitions counter rows, a
lower-triangle broadcast join turning those counters into per-partition
prefix state, and a partitioned window for the in-partition scan. The
three public members in ``global_rank.py`` (row number, prefix max,
prefix sum) differ only in the aggregate, the cross-partition combine,
and the finishing expression — everything else lives here once.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def two_pass_scan(
    df: DataFrame,
    order: Sequence[Column],
    part_agg: Callable[[], Column],
    lower_combine: Callable[[Column], Column],
    finish: Callable[[DataFrame], DataFrame],
    num_partitions: Optional[int] = None,
    total: Optional[str] = None,
) -> DataFrame:
    """Run the shared two-pass plan.

    ``part_agg()`` aggregates each range partition to one ``_pagg`` row;
    ``lower_combine(col)`` folds the lower partitions' ``_pagg`` values
    into the ``_prefix`` column (it sees the left-join's possibly-null
    lower rows); ``finish(df)`` receives the ranged rows joined with
    ``_prefix`` (columns ``_pid`` and ``_prefix`` still present — the
    scaffold drops them afterwards) and must add the output column(s).
    ``total`` attaches the grand fold of ``_pagg`` via a 1-row broadcast.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = df.repartitionByRange(num_partitions, *order).withColumn(
        "_pid", F.spark_partition_id()
    )
    parts = ranged.groupBy("_pid").agg(part_agg().alias("_pagg"))
    lower = parts.select(F.col("_pid").alias("_lpid"), F.col("_pagg").alias("_lagg"))
    # The triangle self-join is O(partitions²) pairs of counter rows —
    # trivial at any data scale, and it avoids a single-partition
    # running-fold window over the counters.
    prefix = (
        parts.join(F.broadcast(lower), F.col("_lpid") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(lower_combine(F.col("_lagg")).alias("_prefix"))
    )
    out_df = finish(ranged.join(F.broadcast(prefix), "_pid")).drop(
        "_pid", "_prefix"
    )
    if total is not None:
        grand = parts.agg(F.sum("_pagg").alias(total))
        out_df = out_df.crossJoin(F.broadcast(grand))
    return out_df
