"""Wave 105 — text-encoding admission census (round 11).

The r11 Unicode campaign (tests/test_unicode_corruption.py) proved that
cross-engine text semantics are contract-bound: case folding beyond
ASCII, Unicode whitespace trimming, \\b word boundaries, locale
segmentation and URI parsing all diverge between engines (and between
library versions) on non-ASCII input. ``dq_text_encoding_census`` is
that campaign operationalized as the triage operator a 100 TB ingest
runs BEFORE trusting any text-keyed pipeline stage: per text column,
counts of rows carrying each risk class —

  * non-ASCII bytes at all (the broad gate),
  * zero-width/invisible characters (ZWSP/ZWNJ/ZWJ/BOM) that poison
    tokenization and dedup keys invisibly,
  * non-ASCII Unicode whitespace (NBSP, thin space, …) that ASCII trim
    preserves and Unicode trim strips,
  * case-fold divergence triggers (dotted İ/ı, sharp s, final sigma,
    the fi/fl ligatures) where engine lower()/upper() disagree,
  * U+FFFD replacement characters — the scar of a lossy upstream
    transcode (the closest a valid-UTF-8 parquet column gets to
    carrying invalid bytes).

Scale shape: ONE pruned scan per table, every counter a map-side
combinable conditional SUM over regexp_like predicates (compiled once
per task, whole-stage codegen) — the same census ladder as
dq_corruption_composite_census. All counts are exact integers (no
ROUND; magnitude-lint clean by construction).

The patterns are literal-character classes (no \\w, \\b, or POSIX
classes), the dialect where Java regex and RE2 agree byte-for-byte —
that agreement is itself pinned by the campaign's seam tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT = "2.L data-quality"

# literal-char classes only — the Java-regex ∩ RE2 safe dialect
_NON_ASCII = "[^\\x01-\\x7f]"
_ZERO_WIDTH = "[\\x{200b}\\x{200c}\\x{200d}\\x{feff}\\x{2060}]"
_UNI_WS = "[\\x{00a0}\\x{1680}\\x{2000}-\\x{200a}\\x{2028}\\x{2029}\\x{202f}\\x{205f}\\x{3000}]"
_CASE_TRIG = "[\\x{0130}\\x{0131}\\x{00df}\\x{1e9e}\\x{03a3}\\x{03c2}\\x{fb01}\\x{fb02}]"
_REPLACEMENT = "[\\x{fffd}]"

_CLASSES = [
    ("n_non_ascii", _NON_ASCII),
    ("n_zero_width", _ZERO_WIDTH),
    ("n_unicode_ws", _UNI_WS),
    ("n_case_trigger", _CASE_TRIG),
    ("n_replacement", _REPLACEMENT),
]

_COLS = [("documents", "text"), ("documents", "source"), ("events", "event_type")]


def _census_sql(tbl: str, col: str) -> str:
    arms = ",\n           ".join(
        f"SUM(CASE WHEN regexp_matches({col}, '{pat}') THEN 1 ELSE 0 END)"
        f"::BIGINT AS {name}"
        for name, pat in _CLASSES
    )
    return f"""
    SELECT '{tbl}.{col}' AS col,
           COUNT(*)::BIGINT AS n_rows,
           {arms}
    FROM {tbl}
    """


@register(
    "dq_text_encoding_census",
    CAT,
    " UNION ALL ".join(_census_sql(t, c) for t, c in _COLS),
)
def dq_text_encoding_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-text-column encoding-risk census (module docstring). Clean
    corpora read all-zeros in every risk class — the steady state the
    100 TB feed must stay in for text-keyed operators to be
    engine-portable; any nonzero routes the rows to quarantine or the
    explicitly-Unicode-aware (rows-only) consumers."""
    out = None
    for tbl, col in _COLS:
        df = load_table(spark, sf_dir, tbl)
        agg = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            *[
                F.sum(
                    F.when(F.col(col).rlike(pat), 1).otherwise(0)
                ).cast("bigint").alias(name)
                for name, pat in _CLASSES
            ],
        ).select(F.lit(f"{tbl}.{col}").alias("col"), "*")
        out = agg if out is None else out.unionByName(agg)
    return out
