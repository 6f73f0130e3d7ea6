"""Time-hierarchy rollups, weighted sampling, equi-depth histograms.

``ts_rollup_hierarchy`` is the hypertable-style continuous-aggregate shape:
day/month/year/grand-total grains of the event stream in one pass.
``sample_weighted`` is Efraimidis–Spirakis A-Res weighted sampling with a
hash-derived uniform, so the "random" sample is reproducible on any engine
and any cluster layout. ``hist_equidepth`` is the equi-depth complement to
the fixed-width ``hist_doclen``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from .exact import CENTS_SUM_SQL, cents_sum
from ..tables import load_table

CAT = "2.M workloads"


@register(
    "ts_rollup_hierarchy",
    CAT,
    f"""
    SELECT year(ts) AS y, month(ts) AS m, dayofmonth(ts) AS d,
           COUNT(*) AS n_events,
           {CENTS_SUM_SQL.format(col='value')}
             AS total_value
    FROM events
    GROUP BY ROLLUP (year(ts), month(ts), dayofmonth(ts))
    -- empty-input parity (r9 empty-table sweep): standard SQL emits
    -- the () grouping-set grand row even over ZERO input rows, but
    -- Spark's rollup yields no rows; groups of a non-empty input
    -- always have COUNT > 0, so this filter only bites on empty
    HAVING COUNT(*) > 0
    """,
)
def ts_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-hierarchy rollup: day, month, year, and grand
    totals in ONE aggregation pass (Expand + a single shuffle), not four
    separate scans — the batch equivalent of a continuous aggregate
    maintaining multiple time grains.

    At 100 TB the Expand multiplies rows 4× before the partial aggregate,
    but map-side combine collapses them to one state per (grain, group):
    shuffle volume is output cardinality, not 4× input. Subtotal rows carry
    NULL in the rolled-up grain columns on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.year("ts").alias("y"),
            F.month("ts").alias("m"),
            F.dayofmonth("ts").alias("d"),
            "value",
        )
        .rollup("y", "m", "d")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact-cents sum, unrounded (r11 magnitude lint, 5.3.9a):
            # the grand-total row is the corpus revenue grower
            cents_sum("value").alias("total_value"),
        )
    )


# Exact hex-fraction uniform in [0,1) from the first 13 md5 hex digits:
# Σ digit_i · 16^-i. Every term is a dyadic rational with ≤4 significand
# bits at a distinct scale, so the fold is EXACT in IEEE double — both
# engines produce bit-identical u from the same md5 hex string (no RNG, no
# engine-specific hash). 13 digits = 52 bits = full double precision.
_U_SPARK = (
    "aggregate(transform(sequence(1, 13), "
    "i -> (locate(substr(md5(cast(doc_id AS string)), i, 1), '0123456789abcdef') - 1) "
    "* power(16.0D, -cast(i AS double))), 0.0D, (a, b) -> a + b)"
)
_U_SQL = (
    "list_sum(list_transform(range(1, 14), "
    "i -> (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), i, 1)) - 1) "
    "* power(16.0, -i)))"
)


@register(
    "sample_weighted",
    CAT,
    f"""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             -ln({_U_SQL} + 1e-300) / n_chars AS wkey
      FROM documents
      WHERE n_chars > 0 AND doc_id IS NOT NULL
        -- hash priority needs identity (NULL-PK r9)
    )
    SELECT doc_id, lang, n_chars
    FROM keyed
    ORDER BY wkey ASC, doc_id ASC
    LIMIT 100
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample (Efraimidis–Spirakis A-Res): each doc
    draws u from an md5-derived exact hex fraction (not an RNG), takes key
    = -ln(u)/weight, and the global top-k by smallest key is a weighted
    sample without replacement — reproducible across engines,
    partitionings, and reruns. weight = n_chars: long docs proportionally
    likelier, the standard token-budget-aware corpus subsample.

    The top-k is TakeOrderedAndProject (per-partition heaps, no global
    sort); at 100 TB this is a single scan + O(k) per partition. The
    +1e-300 guards ln(0) for the one-in-2^52 all-zero hash identically on
    both engines.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        (F.col("n_chars") > 0) & F.col("doc_id").isNotNull()
    )
    wkey = (-F.log(F.expr(_U_SPARK) + F.lit(1e-300)) / F.col("n_chars")).alias(
        "wkey"
    )
    return (
        d.select("doc_id", "lang", "n_chars", wkey)
        .orderBy(F.col("wkey").asc(), F.col("doc_id").asc())
        .limit(100)
        .select("doc_id", "lang", "n_chars")
    )


@register(
    "hist_equidepth",
    CAT,
    """
    WITH ranked AS (
      SELECT n_chars,
             ntile(10) OVER (ORDER BY n_chars, doc_id) AS bucket
      FROM documents WHERE n_chars IS NOT NULL)
    SELECT bucket, COUNT(*) AS n_docs,
           MIN(n_chars) AS lo, MAX(n_chars) AS hi
    FROM ranked
    GROUP BY bucket
    """,
)
def hist_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-count) histogram of document lengths via ntile —
    the quantile-bucket complement of the fixed-width ``hist_doclen``.
    Deterministic under the doc_id tiebreak.

    Scale note: a global ntile is a single-partition window — fine for a
    10-bucket SUMMARY, but at 100 TB the boundaries would come from
    approx_percentile and bucket assignment becomes a map-side comparison
    against 10 broadcast edges (no global sort). This exact spelling
    doubles as the oracle for that approximate path.
    """
    # complete-case: a doc with unknown length has no histogram position
    # (and NTILE's NULL placement is NULLS FIRST on Spark, NULLS LAST on
    # DuckDB — the doc-corruption replay caught the drift)
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    )
    w = Window.orderBy("n_chars", "doc_id")
    return (
        d.select("n_chars", "doc_id")
        .withColumn("bucket", F.ntile(10).over(w))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("lo"),
            F.max("n_chars").alias("hi"),
        )
    )
