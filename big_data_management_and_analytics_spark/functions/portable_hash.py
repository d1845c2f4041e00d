"""Engine-portable 60-bit hashing + a universal hash family (mod 2³¹−1).

The near-dup / sketch operators need a per-token hash that (a) runs as
whole-stage-codegen JVM expressions in Spark and (b) can be reproduced
bit-for-bit by the DuckDB oracle, so LSH bucket assignments — and hence
the operators' OUTPUT — are hash-verifiable cross-engine instead of
rows-tier-only.  xxhash64 is faster per call but DuckDB cannot express
it; md5 is bit-identical in both engines (same UTF-8 bytes in, same hex
out), so we take one md5 per distinct token and derive two independent
60-bit integers from hex chars [1,15] and [17,31]:

    H0(s) = int(md5(s)[ 0:15], 16)        # 60 bits, fits a signed long
    H1(s) = int(md5(s)[16:31], 16)

and expand them into K independent hashes with a classic universal
family (Carter–Wegman; the same construction minwise-hashing papers
assume) over the Mersenne prime p = 2³¹−1:

    h_i(s) = (a_i·g0 + b_i·g1 + c_i) mod p,   g = H mod p

Every product keeps below 2⁶² (a_i, g < 2³¹), and each term is reduced
mod p before the sum, so no intermediate exceeds 3p — no bigint overflow
in either engine (both raise on long overflow: Spark under ANSI, DuckDB
always).  The (a, b, c) triples are fixed literals (seeded once,
hardcoded) so signatures are deterministic across sessions, engines and
clusters.  One md5 per token + K integer mixes also beats K full string
hashes per token CPU-wise.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

P = 2147483647  # 2³¹ − 1, Mersenne prime

# Fixed universal-hash coefficients (a_i, b_i, c_i), seeded once from
# random.Random(20260814) and frozen as literals.
MIX: list[tuple[int, int, int]] = [
    (1571058545, 730493952, 1660058739),
    (1293707556, 1122761735, 1579482913),
    (72772567, 776319283, 1809802579),
    (1088400266, 1716185262, 1854787490),
    (1376580201, 1232262117, 126093126),
    (1718349005, 1255154079, 929465993),
    (1495162255, 1110399377, 253380336),
    (223979957, 331484110, 2008330132),
    (554108161, 2135836561, 84440657),
    (430566607, 287728255, 1463639562),
    (1926419603, 34250604, 492340082),
    (377114939, 1370280527, 1486839300),
    (1398888244, 2122241594, 1078376801),
    (462006863, 988049140, 2126155473),
    (827766902, 1307509405, 1105680808),
    (1314894101, 2032715449, 109028814),
]


def ph0_hex(hx) -> Column:
    """60-bit integer from an already-computed md5 hex column."""
    return F.conv(F.substring(hx, 1, 15), 16, 10).cast("long")


def ph1_hex(hx) -> Column:
    """60-bit integer from an already-computed md5 hex column."""
    return F.conv(F.substring(hx, 17, 15), 16, 10).cast("long")


def ph0(col) -> Column:
    """60-bit integer from md5 hex chars 1–15 (Spark side).

    When BOTH ph0 and ph1 of the same column are needed, materialize
    the md5 once in its own projection and use ph0_hex/ph1_hex —
    CollapseProject keeps the shared non-cheap md5 in a separate
    project (one digest per row instead of two)."""
    return ph0_hex(F.md5(col))


def ph1(col) -> Column:
    """60-bit integer from md5 hex chars 17–31 (Spark side)."""
    return ph1_hex(F.md5(col))


def mix_col(g0: Column, g1: Column, i: int) -> Column:
    """Universal hash i over pre-reduced g0, g1 ∈ [0, p) (Spark side)."""
    a, b, c = MIX[i]
    return ((F.lit(a) * g0) % P + (F.lit(b) * g1) % P + F.lit(c)) % P


# ---- DuckDB oracle SQL builders (same math, same constants) ----------

SQL_G0 = "('0x' || substr(md5({col}), 1, 15))::BIGINT % 2147483647"
SQL_G1 = "('0x' || substr(md5({col}), 17, 15))::BIGINT % 2147483647"


def sql_mix(i: int, g0: str = "g0", g1: str = "g1") -> str:
    a, b, c = MIX[i]
    return f"(({a} * {g0}) % {P} + ({b} * {g1}) % {P} + {c}) % {P}"
