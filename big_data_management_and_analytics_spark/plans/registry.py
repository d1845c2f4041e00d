"""Query registry — the single source of truth binding SURVEY.md §2's
declared inventory to (Spark callable, DuckDB oracle SQL) pairs.

The driver contract (`/root/repo/__spark_entry__.py:22-38`) requires
``queries()`` to expose one callable per implemented operator and
``oracle_sql()`` to expose the DuckDB-equivalent ANSI SQL for oracle-tier
entries. Rows-tier entries (approximate ops, true streaming, sinks) register
with ``oracle=None``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    category: str  # SURVEY §2 category letter: A..K
    fn: QueryFn
    oracle: Optional[str] = None  # DuckDB SQL over pre-registered views; None → rows-tier
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, category: str, oracle: Optional[str] = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame query callable."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query id: {name}")
        _REGISTRY[name] = Query(name=name, category=category, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    return dict(_REGISTRY)


def get_query(name: str) -> Query:
    return _REGISTRY[name]
