"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``big_data_management_and_analytics_spark``;
query ids follow SURVEY.md §2's declared inventory.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Self-locating: the driver may import this file by path with any cwd;
# the engine package lives next to it.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import big_data_management_and_analytics_spark as engine  # noqa: E402
from big_data_management_and_analytics_spark.plans.driver_history import (  # noqa: E402
    queue_order,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    engine.load_all()
    return engine.get_query("agg_pricing_summary").fn(spark, SF0001)


def _survey_ids() -> set[str]:
    """Query ids declared in SURVEY.md §2 tables (the judged contract)."""
    import re

    ids: set[str] = set()
    survey = os.path.join(_REPO_ROOT, "SURVEY.md")
    try:
        for line in open(survey, encoding="utf-8"):
            m = re.match(r"^\| `([a-z0-9_]+)` \|", line)
            if m and line.strip().strip("|").rsplit("|", 1)[-1].strip().rstrip(
                "*"
            ) in ("oracle", "rows", "smoke"):
                ids.add(m.group(1))
    except OSError:
        pass
    return ids


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so ids without a driver-green CORRECTNESS row yet come first
    (never-verified SURVEY §2 ids, then the mandated llm_*/mm_* family,
    then other extras — see plans/driver_history.queue_order): the driver
    verifies a bounded prefix of this dict per round, so the queue
    rotates until every operator has been driver-verified.
    """
    engine.load_all()
    registry = engine.all_queries()
    return {n: registry[n].fn for n in queue_order(registry, _survey_ids())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-tier query id."""
    engine.load_all()
    registry = engine.all_queries()
    return {
        n: registry[n].oracle
        for n in queue_order(registry, _survey_ids())
        if registry[n].oracle
    }
