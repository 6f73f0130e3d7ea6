"""Shared exact-moment spellings for SUM/COUNT-driven (grower) outputs.

SURVEY §5.3.9 + the round-11 projected-magnitude lint
(scripts/magnitude_lint.py): a ROUND-ed float column whose magnitude is
SUM/COUNT-driven grows past the product-2^53 bound (|x| ≈ 9.0e11) at
the 100 TB target, where DuckDB's float-product ROUND(x, 4) flips on
the IDENTICAL double that Spark's BigDecimal ROUND renders exactly —
no spelling discipline survives a terminal ROUND there. Growers are
therefore derived from exact integer-quantized moments and emitted
UNROUNDED: both engines cast the same exact integer to DOUBLE (IEEE
nearest) and run the same single division, producing the identical
double at ANY magnitude. (Bounded statistics — ratios, means of
bounded values, percentiles of source columns — keep the conventional
terminal ROUND(x, 4).)

One spelling, both engines: the fragments below are spliced verbatim
into Spark expressions AND DuckDB oracle SQL, so the quantization
grain and the division can never drift apart. The ROUND(x·100, 0)
operand is made exactly integral BEFORE the BIGINT cast because
DuckDB's CAST(double AS BIGINT) rounds where Spark's truncates (the
flagship discipline, aggregates.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# exact sum of a 2-decimal money/value column, emitted UNROUNDED.
#
# Special-float faithful (r11 special-float sweep): a bare
# CAST(ROUND(x*100) AS BIGINT) hard-errors on NaN/±Inf in BOTH engines
# (ANSI overflow), where the float SUM these fragments replaced
# POISONED the group total instead (NaN dominates; +Inf/−Inf propagate;
# mixed signs → NaN). The guarded spelling reproduces exactly that IEEE
# poisoning at the group level — so swapping a float SUM for the exact
# cents sum never changes observable semantics, corrupt input included
# — while the finite path stays the order-free integer moment. The
# per-row CAST is reached only for finite values (CASE guards it), and
# the conditional counters are map-side-combinable ints.
_ISNAN = "isnan({col})"
_ISPINF = "{col} = CAST('Infinity' AS DOUBLE)"
_ISNINF = "{col} = CAST('-Infinity' AS DOUBLE)"

CENTS_SUM_SQL = (
    "CASE"
    " WHEN SUM(CASE WHEN " + _ISNAN + " THEN 1 ELSE 0 END) > 0"
    "   OR (SUM(CASE WHEN " + _ISPINF + " THEN 1 ELSE 0 END) > 0"
    "       AND SUM(CASE WHEN " + _ISNINF + " THEN 1 ELSE 0 END) > 0)"
    " THEN CAST('NaN' AS DOUBLE)"
    " WHEN SUM(CASE WHEN " + _ISPINF + " THEN 1 ELSE 0 END) > 0"
    " THEN CAST('Infinity' AS DOUBLE)"
    " WHEN SUM(CASE WHEN " + _ISNINF + " THEN 1 ELSE 0 END) > 0"
    " THEN CAST('-Infinity' AS DOUBLE)"
    " ELSE CAST(SUM(CASE WHEN " + _ISNAN + " OR " + _ISPINF
    + " OR " + _ISNINF + " THEN NULL"
    " ELSE CAST(ROUND({col} * 100, 0) AS BIGINT) END) AS DOUBLE)"
    " / 100.0 END"
)


def cents_sum(col: str) -> Column:
    """Spark twin of CENTS_SUM_SQL — exact integer-cents SUM of a
    2-decimal column, one terminal division, no terminal ROUND; IEEE
    poisoning semantics preserved on special-float input."""
    return F.expr(CENTS_SUM_SQL.format(col=col))


# TOTAL canonicalization token for a float value on the 1e-4 integer
# grid (r12 payload-extremes campaign): a bare
# CAST(ROUND(x*10000) AS BIGINT) hard-errors on NaN/±Inf in BOTH
# engines (ANSI overflow) and on any |x| ≥ ~9.2e14 (the grid exceeds
# int64), so every content-hash canonicalizer maps those classes to
# literal tokens instead. Values beyond the grid cap collapse to ONE
# 'OVF' token per sign-agnostic class — two conflicting copies that
# differ ONLY in two different over-cap magnitudes at the same position
# therefore hash equal; that blind spot is deliberate (the same shape
# as the money census's cents-unrepresentable class) and is what keeps
# the token total without engine-specific float formatting in the hash.
_Q4_ARMS = (
    " WHEN {x} IS NULL THEN 'N'"
    " WHEN isnan(CAST({x} AS DOUBLE)) THEN 'NaN'"
    " WHEN CAST({x} AS DOUBLE) = CAST('Infinity' AS DOUBLE) THEN 'Inf'"
    " WHEN CAST({x} AS DOUBLE) = CAST('-Infinity' AS DOUBLE) THEN '-Inf'"
    " WHEN abs(CAST({x} AS DOUBLE)) >= 9.0e14 THEN 'OVF'"
    " ELSE CAST(CAST(ROUND(CAST({x} AS DOUBLE) * 10000, 0) AS BIGINT)"
)
Q4_TOKEN = "CASE" + _Q4_ARMS + " AS STRING) END"
Q4_TOKEN_SQL = "CASE" + _Q4_ARMS + " AS VARCHAR) END"
