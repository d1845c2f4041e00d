"""Engine-portable trig: sin/cos/asin as SHARED SQL expression text.

Why this exists (measured, round 5): the sf0.1 differential sweep caught
`join_geo_haversine` hash-mismatching on exactly one row of ~900K pairs
— DuckDB's libm `asin` returned 0.9534419779077067 where the JVM's
returned ...68 (1 ulp apart), and the resulting raw distance
12148.7576825 sits EXACTLY on a ROUND(...,6) half boundary, so the two
engines rounded to different 6th decimals. "round-6 absorbs sub-ulp
libm drift" is therefore only probabilistic: a 1-ulp libm disagreement
flips the rounded value whenever the true result lands within an ulp of
a rounding boundary (p ≈ 2·ulp/10^-k per row — negligible for O(1)
magnitudes, but ~4e-6/row for 1e4-km distances, i.e. an expected hit
every ~250K rows).

The deterministic alternative: evaluate trig as explicit polynomials
whose expression TEXT is shared verbatim between the Spark plan
(`selectExpr`) and the DuckDB oracle SQL. Both engines then execute the
identical tree of IEEE-754 double operations — `+ - *` and `SQRT` are
correctly rounded in both, and scientific-notation literals parse
correctly rounded in both (always emitted with an exponent so DuckDB
types them DOUBLE, not DECIMAL) — so the results are BIT-IDENTICAL, not
merely close. No libm call remains on the distributed path (the
ts_periodogram frozen-table precedent, generalized to arbitrary
arguments).

Accuracy (vs true function, not vs libm): Taylor in Horner form —
sin/cos to 14 terms are exact to <1e-16 over |x| ≤ π; asin uses the
Maclaurin series on [0, 0.5] (17 terms, error <2e-13 rad) and the
reflection asin(y) = π/2 − 2·asin(√((1−y)/2)) above 0.5, whose argument
is again ≤ 0.5. Horner evaluation adds a few ulps of rounding — the
same few ulps in both engines.
"""

from __future__ import annotations

import math
from fractions import Fraction

SIN_TERMS = 14  # odd powers x^1 .. x^27
COS_TERMS = 14  # even powers x^0 .. x^26
ASIN_TERMS = 17  # odd powers z^1 .. z^33

PI_HALF = 1.5707963267948966


def lit(v: float) -> str:
    """Scientific-notation literal (18 significant digits — exact
    round-trip) that BOTH engines parse as a correctly-rounded DOUBLE.
    A bare '0.1666...' would be DECIMAL in DuckDB; the exponent forces
    DOUBLE in both."""
    return f"{float(v):.17e}"


def _sin_coeffs() -> list[float]:
    return [
        float(Fraction((-1) ** k, math.factorial(2 * k + 1)))
        for k in range(SIN_TERMS)
    ]


def _cos_coeffs() -> list[float]:
    return [
        float(Fraction((-1) ** k, math.factorial(2 * k)))
        for k in range(COS_TERMS)
    ]


def _asin_coeffs() -> list[float]:
    return [
        float(
            Fraction(math.comb(2 * k, k), (4**k) * (2 * k + 1))
        )
        for k in range(ASIN_TERMS)
    ]


def _horner(x2: str, coeffs: list[float]) -> str:
    """c0 + x2*(c1 + x2*(c2 + ...)) — ``x2`` should be a SHORT column
    name: it is repeated len(coeffs)-1 times in the text."""
    t = lit(coeffs[-1])
    for c in reversed(coeffs[:-1]):
        t = f"{lit(c)} + {x2} * ({t})"
    return t


def sin_text(x: str, x2: str) -> str:
    """sin(x) for |x| <= pi; ``x2`` must name a column holding x*x."""
    return f"{x} * ({_horner(x2, _sin_coeffs())})"


def cos_text(x2: str) -> str:
    """cos(x) for |x| <= pi given a column holding x*x."""
    return f"({_horner(x2, _cos_coeffs())})"


def _asin_core(v: str, v2: str) -> str:
    return f"{v} * ({_horner(v2, _asin_coeffs())})"


def asin_text(y: str, y2: str, z: str, z2: str) -> str:
    """asin(y) for y in [0, 1]. Callers pre-compute (as short-named
    columns) y2 = y*y, z = SQRT((1-y)*0.5) and z2 = z*z; the reflection
    branch keeps the series argument <= 0.5 where it converges fast."""
    return (
        f"CASE WHEN {y} <= 5.0e-1 THEN {_asin_core(y, y2)} "
        f"ELSE {lit(PI_HALF)} - 2.0e0 * ({_asin_core(z, z2)}) END"
    )
