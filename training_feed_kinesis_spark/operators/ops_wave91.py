"""Wave 91: diversity profiles and segment migration.

  * ``events_hill_diversity``: Hill numbers of order q = 0, 1, 2 for
    the weekly event mix — richness, exp(Shannon), inverse Simpson —
    the unified diversity profile (ecology's standard) where each q
    weights abundant types differently; reading all three together
    separates "fewer types" from "same types, more skewed".
  * ``orders_customer_migration_matrix``: spend-tercile migration
    between the first and second half of the order history — the 3×3
    matrix (plus churn-in/out rows) CRM teams read before believing
    any loyalty metric; terciles are cut on exact integer cents under
    a total order.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from .ops_wave88 import WEEK_BUCKET_SPARK, WEEK_BUCKET_SQL

CAT_EV = "2.L event analytics"
CAT_REP = "2.L reporting"


@register(
    "events_hill_diversity",
    CAT_EV,
    f"""
    WITH weekly AS (
      SELECT {WEEK_BUCKET_SQL} AS week,
             event_type, COUNT(*)::BIGINT AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT week, SUM(n)::BIGINT AS wn FROM weekly GROUP BY week)
    SELECT w.week,
           CAST(COUNT(*) AS BIGINT) AS hill_q0,
           ROUND(exp(-SUM((CAST(w.n AS DOUBLE) / t.wn)
                          * ln(CAST(w.n AS DOUBLE) / t.wn))), 4) AS hill_q1,
           ROUND(CAST(t.wn AS DOUBLE) * t.wn
                 / SUM(CAST(w.n AS DOUBLE) * w.n), 4) AS hill_q2
    FROM weekly w JOIN tot t USING (week)
    GROUP BY w.week, t.wn
    """,
)
def events_hill_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill diversity profile of the weekly event mix: q=0 is the
    raw type count (richness — every type counts equally), q=1 is
    exp(Shannon entropy) (types weighted by abundance), q=2 is the
    inverse Simpson index N²/Σn² (dominance-sensitive — effectively
    "how many types share the bulk of traffic"). The three orders
    diverging is itself the signal: q0 flat with q2 collapsing means
    nothing disappeared but one type is swallowing the feed. Σn² and
    N² are exact integers; only the q1 entropy terms are per-type
    doubles.

    Scale shape: one (week, type) census and a week-grain rollup —
    identical plan to events_entropy_over_time, different readout."""
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
            F.count(F.lit(1)).cast("long").alias("hill_q0"),
            F.round(F.exp(-F.sum(p * F.log(p))), 4).alias("hill_q1"),
            F.round(
                F.col("wn").cast("double")
                * F.col("wn")
                / F.sum(F.col("n").cast("double") * F.col("n")),
                4,
            ).alias("hill_q2"),
        )
        .select("week", "hill_q0", "hill_q1", "hill_q2")
    )


@register(
    "orders_customer_migration_matrix",
    CAT_REP,
    """
    WITH bounds AS (
      SELECT (MIN(CAST(o_orderdate AS DATE) - DATE '1992-01-01')
              + MAX(CAST(o_orderdate AS DATE) - DATE '1992-01-01')) // 2
               AS mid_d
      FROM orders
    ),
    halves AS (
      SELECT o_custkey,
             CASE WHEN CAST(o_orderdate AS DATE) - DATE '1992-01-01' < b.mid_d
                  THEN 'h1' ELSE 'h2' END AS half,
             CAST(ROUND(SUM(o_totalprice) * 100, 0) AS BIGINT) AS cents
      FROM orders CROSS JOIN bounds b
      GROUP BY o_custkey,
               CASE WHEN CAST(o_orderdate AS DATE) - DATE '1992-01-01'
                         < b.mid_d THEN 'h1' ELSE 'h2' END
    ),
    ranked AS (
      SELECT o_custkey, half, cents,
             NTILE(3) OVER (PARTITION BY half
                            ORDER BY cents, o_custkey) AS tercile
      FROM halves
    ),
    pivoted AS (
      SELECT COALESCE(a.o_custkey, b.o_custkey) AS ck,
             COALESCE(CAST(a.tercile AS VARCHAR), 'none') AS t1,
             COALESCE(CAST(b.tercile AS VARCHAR), 'none') AS t2
      FROM (SELECT * FROM ranked WHERE half = 'h1') a
      FULL OUTER JOIN (SELECT * FROM ranked WHERE half = 'h2') b
        ON a.o_custkey = b.o_custkey
    )
    SELECT t1 AS tercile_h1, t2 AS tercile_h2,
           COUNT(*)::BIGINT AS n_customers
    FROM pivoted GROUP BY t1, t2
    """,
)
def orders_customer_migration_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Customer spend-tercile migration between the first and second
    half of the order history: each half ranks its active customers
    into terciles on exact integer cents (NTILE under a (cents,
    custkey) total order), then a FULL OUTER join builds the migration
    matrix — including the 'none' row/column for customers active in
    only one half (acquisition and churn, which a plain inner-join
    loyalty matrix silently drops). Diagonal mass = stability; above-
    diagonal = upgrades.

    Scale shape: one (customer, half) aggregate, two half-partitioned
    ranking windows, one customer-grain outer join — all keyed by
    customer after the first aggregate."""
    o = load_table(spark, sf_dir, "orders")
    d_idx = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
    bounds = o.agg(
        ((F.min(d_idx) + F.max(d_idx)) / 2).cast("long").alias("mid_d")
    )
    halves = (
        o.crossJoin(F.broadcast(bounds))
        .select(
            "o_custkey",
            F.when(d_idx < F.col("mid_d"), "h1").otherwise("h2").alias(
                "half"
            ),
            "o_totalprice",
        )
        .groupBy("o_custkey", "half")
        .agg(
            F.round(F.sum("o_totalprice") * 100, 0)
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.partitionBy("half").orderBy("cents", "o_custkey")
    ranked = halves.select(
        "o_custkey", "half", F.ntile(3).over(w).alias("tercile")
    )
    h1 = ranked.filter(F.col("half") == "h1").select(
        F.col("o_custkey").alias("ck1"), F.col("tercile").alias("t1i")
    )
    h2 = ranked.filter(F.col("half") == "h2").select(
        F.col("o_custkey").alias("ck2"), F.col("tercile").alias("t2i")
    )
    pivoted = h1.join(h2, F.col("ck1") == F.col("ck2"), "full").select(
        F.coalesce(F.col("t1i").cast("string"), F.lit("none")).alias(
            "tercile_h1"
        ),
        F.coalesce(F.col("t2i").cast("string"), F.lit("none")).alias(
            "tercile_h2"
        ),
    )
    return pivoted.groupBy("tercile_h1", "tercile_h2").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
