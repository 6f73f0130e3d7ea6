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

# exact sum of a 2-decimal money/value column, emitted UNROUNDED
CENTS_SUM_SQL = (
    "CAST(SUM(CAST(ROUND({col} * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0"
)


def cents_sum(col: str) -> Column:
    """Spark twin of CENTS_SUM_SQL — exact integer-cents SUM of a
    2-decimal column, one terminal division, no terminal ROUND."""
    return F.expr(CENTS_SUM_SQL.format(col=col))
