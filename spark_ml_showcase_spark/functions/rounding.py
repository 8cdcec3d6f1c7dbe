"""Cross-engine ROUND for doubles (r14).

``round_like_duckdb(col, d)`` reproduces DuckDB's
``ROUND(double, d)`` — ``std::round(x * 10^d) / 10^d``, round-half-away
evaluated on the BINARY double — bit-for-bit on the Spark side, so an
oracle can keep its native ROUND while the engine side is guaranteed to
agree even exactly ON a rounding midpoint.

Why ``F.round`` is not enough: it applies HALF_UP to
``BigDecimal.valueOf(x)``'s SHORTEST DECIMAL REPR, so on a value whose
shortest repr is exactly ``…5`` (e.g. the double nearest 1.5e-6 prints
"1.5e-6" but is binarily 1.4999999999999998e-6) Spark rounds UP while
DuckDB rounds DOWN. This is a STRUCTURAL class, not a 2⁻⁵³ fluke: any
quantized EXACT RATIONAL — a decimal sum divided by a row count, a
share n/total, an OLS intercept of decimal-exact sums — lands exactly
on a ``.5·10⁻ᵈ`` midpoint whenever the reduced denominator divides
2·10ᵈ with an odd quotient (even group counts do it constantly). Every
fixture regeneration is a fresh dice roll on every such output value.
Found by the X114 gate oracle (r14); verified equivalent on 40k
midpoint-rich cases per engine at d=6 and d=12.

Equality argument: ``F.round(y, 0)`` == ``std::round(y)`` for all
``|y| < 2⁵²`` because integer midpoints are exactly representable, so
the shortest repr and the binary value cannot straddle one; ``10^d`` is
exact, and the final division is correctly rounded identically in both
engines.

Usage rules:
- USE for any double-typed ROUND in an oracle-checked output whose
  input can be an exact rational (ratios of counts/decimal sums).
  Harmless-and-aligning on transcendental inputs too.
- DO NOT use on DECIMAL-typed columns (the money recipe ROUNDs in the
  decimal domain, where both engines are exact and always agree; the
  ``col * 10^d`` here would force a double conversion and LOSE
  exactness).
- Sign of zero: yields +0.0 where DuckDB yields −0.0 (BigDecimal has
  no −0). Don't let a rounded NEGATIVE-tiny value reach a hashed
  output column unless the oracle adds ``+ 0`` — magnitudes, shares,
  and on-grid differences are safe. (Pinned against a live DuckDB in
  tests/test_properties.py.)
- Overflow: when ``col * 10^d`` overflows to ±inf, DuckDB's ROUND
  returns the INPUT unchanged (its ``isinf/isnan`` fallback on the
  scaled intermediate); the guard below mirrors that, so
  ``|x| > ~1.8e308/10^d`` round-trips as ``x`` instead of ±Infinity.
  NaN and ±inf inputs pass through unchanged on both engines (NaN
  multiplies to NaN and survives the otherwise-branch; ±inf hits the
  guard).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_like_duckdb(
    col: Column, digits: int, *, bounded: bool = False
) -> Column:
    """``bounded=True`` skips the overflow guard: the caller asserts
    ``|col| * 10^digits`` cannot overflow (ratios in [0, 1], shares,
    anything provably far below ~1.8e308/10^d) — on that domain the two
    forms are value-identical, so the DuckDB contract is unchanged.

    Why the flag exists (r15): the guard's CASE WHEN defeats Catalyst
    subexpression elimination, and a threshold filter on the rounded
    value gets SUBSTITUTED into join conditions by predicate pushdown —
    so when ``col`` embeds an expensive expression (an
    ``array_intersect`` similarity verify), the guarded form evaluated
    it up to 12× per candidate row (set_similarity_join_docs regressed
    3.8 → 6.8 s when the guard landed). Rounding a plain column ref can
    keep the guard; rounding a filtered complex expression on a bounded
    domain should pass ``bounded=True``."""
    p = F.lit(float(10**digits))
    y = col * p
    if bounded:
        return F.round(y, 0) / p
    return F.when(F.abs(y) == F.lit(float("inf")), col).otherwise(
        F.round(y, 0) / p
    )
