"""Wave 88: SQL-defined functions, the missing Q1 registry key,
behavioral-entropy drift.

  * ``sql_udf_scalar`` / ``sql_udf_table``: Spark 4 SQL-language
    functions (CREATE FUNCTION … RETURN expr / RETURNS TABLE … RETURN
    SELECT) — reusable logic that stays INSIDE Catalyst (inlined at
    plan time, full codegen), the right replacement for most Python
    UDFs; oracles inline the definitions.
  * ``q1_pricing_summary``: TPC-H Q1 as a first-class registry key —
    it has been the entry() flagship since round 1 but was never
    individually sampled by the driver's correctness gate.
  * ``events_entropy_over_time``: weekly Shannon entropy of the
    event-type mix + the behavioral-drift trend — collapsing entropy
    means the feed is homogenizing (bot flood, feature removal), the
    distribution-shape companion of dq_drift_psi.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from .aggregates import FLAGSHIP_ORACLE, flagship

CAT_SQL = "2.L modern SQL surface"
CAT_WORK = "2.L workloads"
CAT_EV = "2.L event analytics"

# Week bucket anchored at 2024-01-01, spelled ONCE for both engines and
# shared with ops_wave91 (events_hill_diversity runs the identical census).
# floor, not integer division: BOTH engines' // and DIV truncate toward
# zero, which would split the epoch-straddling week into two half-width
# buckets; floor keeps every bucket exactly 7 days even for pre-epoch
# (negative-index) events — differentially proven by
# tests/test_null_injection.py's pre-epoch replay. The double division is
# exact (|days| << 2**53).
WEEK_BUCKET_SQL = (
    "CAST(floor((CAST(date_trunc('day', ts) AS DATE)"
    " - DATE '2024-01-01') / 7.0) AS BIGINT)"
)
WEEK_BUCKET_SPARK = (
    "CAST(FLOOR(datediff(date_trunc('day', ts), DATE '2024-01-01')"
    " / 7.0) AS BIGINT)"
)


@register(
    "sql_udf_scalar",
    CAT_SQL,
    """
    SELECT l_returnflag,
           COUNT(*)::BIGINT AS n,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))
                    * (100 + CAST(ROUND(l_tax * 100, 0) AS BIGINT)))
                AS DOUBLE) / 1000000.0 AS charged
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def sql_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language scalar function (Spark 4 CREATE FUNCTION … RETURN):
    the charge formula is defined ONCE as a named SQL UDF and reused in
    the aggregate. Unlike a Python UDF, the body is inlined into the
    logical plan at resolution time — whole-stage codegen, predicate
    transparency, and zero serialization boundary — which is why a SQL
    UDF is the first refactoring target for any Python UDF that is
    just arithmetic (§2.K's udf_python documents the slow path; this
    is the fast one). The oracle inlines the same expression.

    Scale shape: identical plan to writing the expression inline.
    Overflow headroom (code review r6): the scale-1e6 term averages
    ~4e10/row, so a single SUM(BIGINT) per returnflag group holds to
    ~2e8 rows/group (sf≈140 lineitem) — Spark ANSI then errors loudly
    (never wraps) while DuckDB widens to HUGEINT. Past that, use the
    flagship's component decomposition (s0/sd/st/sdt BIGINT sums +
    DECIMAL(38,0) recombination), which this demo key keeps simple on
    purpose."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_udf"
    )
    # the UDF returns the exact scale-1e6 integer charge term (§5.3.6b)
    # so the SUM is reduction-order independent on both engines
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION tfk_charge_s("
        "p DOUBLE, d DOUBLE, t DOUBLE) RETURNS BIGINT"
        " RETURN CAST(ROUND(p * 100, 0) AS BIGINT)"
        " * (100 - CAST(ROUND(d * 100, 0) AS BIGINT))"
        " * (100 + CAST(ROUND(t * 100, 0) AS BIGINT))"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(tfk_charge_s(l_extendedprice, l_discount, l_tax))
                    AS DOUBLE) / 1000000.0 AS charged
        FROM lineitem_udf
        GROUP BY l_returnflag
        """
    )


@register(
    "sql_udf_table",
    CAT_SQL,
    """
    SELECT c_mktsegment, c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > 9000.0
    """,
)
def sql_udf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language TABLE function (CREATE FUNCTION … RETURNS TABLE):
    a parameterized relational view — here the high-balance customer
    slice above a caller-supplied threshold — invoked in the FROM
    clause like any table. The body is a full SELECT that Catalyst
    inlines and optimizes with the outer query (filter pushdown works
    THROUGH the function boundary), making it the engine-native
    building block for reusable subqueries; the Python UDTF
    (udtf_split) remains for logic SQL cannot express.

    Scale shape: identical plan to the inlined SELECT."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_udf"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION tfk_rich_customers("
        "min_bal DOUBLE) RETURNS TABLE("
        "c_mktsegment STRING, c_custkey BIGINT, c_acctbal DOUBLE)"
        " RETURN SELECT c_mktsegment, c_custkey, c_acctbal"
        " FROM customer_udf WHERE c_acctbal > min_bal"
    )
    return spark.sql("SELECT * FROM tfk_rich_customers(9000.0D)")


@register(
    "q1_pricing_summary",
    CAT_WORK,
    FLAGSHIP_ORACLE,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) as a registry key: delegates to
    the flagship implementation (aggregates.flagship) so the registry
    key and the entry() smoke flagship can never drift apart — in
    particular both carry the §5.3.6b exact-integer-cents component
    sums, where this key's original double-sum spelling remained
    reduction-order dependent.

    Scale shape: scan → sargable filter → partial/final hash aggregate
    over a 6-group key space — the canonical one-pass report."""
    return flagship(spark, sf_dir)


@register(
    "events_entropy_over_time",
    CAT_EV,
    f"""
    WITH weekly AS (
      SELECT {WEEK_BUCKET_SQL} AS week,
             event_type, COUNT(*)::BIGINT AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT week, SUM(n)::BIGINT AS wn FROM weekly GROUP BY week)
    SELECT w.week, t.wn AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           ROUND(-SUM((CAST(w.n AS DOUBLE) / t.wn)
                      * ln(CAST(w.n AS DOUBLE) / t.wn)), 4) AS entropy_nats,
           ROUND(-SUM((CAST(w.n AS DOUBLE) / t.wn)
                      * ln(CAST(w.n AS DOUBLE) / t.wn))
                 / ln(CAST(COUNT(*) AS DOUBLE)), 4) AS evenness
    FROM weekly w JOIN tot t USING (week)
    GROUP BY w.week, t.wn
    """,
)
def events_entropy_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly Shannon entropy of the event-type mix, plus Pielou
    evenness (entropy / ln of types present): a collapsing entropy
    series means the feed is homogenizing — a bot flood hammering one
    action, a dropped feature, a routing bug — before any single
    count alarm fires. Exact integer censuses; the only doubles are
    ≤5 p·ln p terms per week.

    Scale shape: one (week, type) census + a week-grain rollup."""
    ev = load_table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        F.expr(WEEK_BUCKET_SPARK).alias("week"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = weekly.groupBy("week").agg(F.sum("n").alias("wn"))
    p = F.col("n").cast("double") / F.col("wn")
    return (
        weekly.join(F.broadcast(tot), "week")
        .groupBy("week", "wn")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.round(-F.sum(p * F.log(p)), 4).alias("entropy_nats"),
            F.round(
                -F.sum(p * F.log(p))
                / F.log(F.count(F.lit(1)).cast("double")),
                4,
            ).alias("evenness"),
        )
        .select(
            "week",
            F.col("wn").alias("n_events"),
            "n_types",
            "entropy_nats",
            "evenness",
        )
    )
