"""Determinism helpers for oracle-tier queries (SURVEY.md §2.0 rules).

The driver compares Spark vs DuckDB by order-insensitive value-hash, so
float aggregates must be bit-identical. Conventions:

- Money sums: aggregate in DECIMAL(18,2)/(18,4) (exact, order-independent),
  cast the final value to DOUBLE (deterministic conversion both engines).
- Averages: exact decimal sum cast to double, divided by the count — never
  the engines' native double `avg` (summation order differs).
- Statistics / similarities: computed in double then rounded (4 or 6 digits)
  as the final projection on both sides.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

DEC = "decimal(18,2)"
DEC4 = "decimal(18,4)"


def dec2(c) -> Column:
    """Cast a money column to exact DECIMAL(18,2)."""
    return F.col(c).cast(DEC) if isinstance(c, str) else c.cast(DEC)


def money_sum(c, alias: str) -> Column:
    """Exact, order-independent sum of a 2-decimal money column → DOUBLE."""
    return F.sum(dec2(c)).cast("double").alias(alias)


def money_avg(c, alias: str) -> Column:
    """Exact-sum / count average of a money column → DOUBLE."""
    return (F.sum(dec2(c)).cast("double") / F.count(F.lit(1))).alias(alias)


# DuckDB-side SQL fragments mirroring the helpers above.
def sql_money_sum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) AS {alias}"


def sql_money_avg(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS {alias}"
