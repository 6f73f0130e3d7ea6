"""Reporting round 2: YoY comparisons, decayed CLV, deterministic sharding,
collation-aware grouping.

  * ``ts_yoy_same_quarter``: year-over-year comparison at the same fiscal
    quarter — lag over the YEAR axis partitioned by quarter-of-year, the
    seasonally-honest growth report (vs naive period-over-period). Window
    runs over the quarter grain, not the fact table.
  * ``customer_clv_decay``: recency-decayed customer lifetime value — each
    order's contribution decays exp(-age/365) against the corpus's latest
    order date (a broadcast scalar, never a driver collect). One scan, one
    hash-agg.
  * ``shard_assignment``: engine/cluster-independent shard routing by md5
    prefix — the SAME rows land in the SAME shard on any engine, any
    partition count, any day (contrast Spark's ``hash()``, which is not
    portable). This is how a 100 TB corpus gets stable export shards.
  * ``fn_collation_ci``: Spark 4 collation — grouping under UNICODE_CI
    compares case-insensitively in the JVM (no lower() rewrite needed at
    query sites); the oracle normalizes explicitly. Output labels are
    case-normalized because a CI group's representative is unspecified.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md §0.1);
capability surface reconstructed per SURVEY.md §2 and BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table

CAT_WORK = "2.L workloads"
CAT_FN = "2.H scalar functions"


@register(
    "ts_yoy_same_quarter",
    CAT_WORK,
    """
    WITH q AS (
      SELECT EXTRACT(year FROM l_shipdate)::INT AS yr,
             EXTRACT(quarter FROM l_shipdate)::INT AS qtr,
             SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS rev_s
      FROM lineitem GROUP BY 1, 2
    )
    SELECT yr, qtr, CAST(rev_s AS DOUBLE) / 10000.0 AS revenue,
           ROUND(100.0 * CAST(rev_s - lag(rev_s)
                              OVER (PARTITION BY qtr ORDER BY yr) AS DOUBLE)
                 / CAST(lag(rev_s) OVER (PARTITION BY qtr ORDER BY yr)
                        AS DOUBLE), 4) AS yoy_pct
    FROM q
    """,
)
def ts_yoy_same_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth at matching quarters: Q3-1996 vs
    Q3-1995, not vs Q2-1996 — the seasonality-honest comparison. One
    fact-scale aggregation to the (year, quarter) grain, then a lag
    window PARTITIONED BY quarter ORDER BY year over ~24 rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # exact scale-1e4 integer revenue (§5.3.6b): the YoY ratio divides
    # bit-identical integer lags on both engines
    q = li.groupBy(
        F.year("l_shipdate").alias("yr"), F.quarter("l_shipdate").alias("qtr")
    ).agg(
        F.sum(
            F.expr(
                "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
                " * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))"
            )
        ).alias("rev_s")
    )
    w = Window.partitionBy("qtr").orderBy("yr")
    prev = F.lag("rev_s").over(w)
    return q.select(
        "yr",
        "qtr",
        (F.col("rev_s").cast("double") / 10000.0).alias("revenue"),
        F.round(
            F.lit(100.0)
            * (F.col("rev_s") - prev).cast("double")
            / prev.cast("double"),
            4,
        ).alias("yoy_pct"),
    )


@register(
    "customer_clv_decay",
    CAT_WORK,
    """
    WITH mx AS (SELECT MAX(o_orderdate) AS md FROM orders)
    SELECT o_custkey AS custkey,
           COUNT(*)::BIGINT AS n_orders,
           ROUND(SUM(o_totalprice
                     * exp(-date_diff('day', o_orderdate,
                                      (SELECT md FROM mx)) / 365.0)), 4)
             AS clv
    FROM orders
    GROUP BY o_custkey
    """,
)
def customer_clv_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed customer lifetime value: order value × exp(-age
    in years), aged against the corpus's latest order date. The anchor
    date is an aggregate joined back as a broadcast scalar (no driver
    round-trip), then CLV is one hash-agg over the fact table.

    Residual float class (documented, not fixable by §5.3.6b): the exp
    decay factor is inherently non-integerizable, so the SUM stays a
    double and is reduction-order dependent in the last ulps. Exposure
    is per-CUSTOMER sums (tens of addends), far below the 4dp rounding
    grain — unlike the fact-wide sums the exact-cents campaign removed.
    """
    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("md"))
    return (
        o.crossJoin(F.broadcast(mx))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(
                    F.col("o_totalprice")
                    * F.exp(-F.datediff(F.col("md"), F.col("o_orderdate")) / 365.0)
                ),
                4,
            ).alias("clv"),
        )
    )


@register(
    "shard_assignment",
    CAT_WORK,
    """
    SELECT substr(md5(c_custkey::VARCHAR), 1, 1) AS shard,
           COUNT(*)::BIGINT AS n_customers,
           MIN(c_custkey)::BIGINT AS min_key,
           MAX(c_custkey)::BIGINT AS max_key,
           CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS DOUBLE)
             / 100.0 AS shard_balance
    FROM customer
    GROUP BY 1
    """,
)
def shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 16-way shard routing by md5 prefix: the same customer
    routes to the same shard on ANY engine, partition count, or rerun —
    the portable alternative to engine-specific ``hash()`` for stable
    export/bucketing layouts. The census (count, key range, balance per
    shard) doubles as a uniformity check on the routing.
    """
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1).alias(
                "shard"
            ),
            "c_custkey",
            "c_acctbal",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_custkey").alias("min_key"),
            F.max("c_custkey").alias("max_key"),
            (
                F.sum(F.expr("CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)"))
                .cast("double")
                / 100.0
            ).alias("shard_balance"),
        )
    )


@register(
    "fn_collation_ci",
    CAT_FN,
    """
    WITH mixed AS (
      SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_type)
                  ELSE lower(p_type) END AS t
      FROM part
    )
    SELECT lower(t) AS ptype, COUNT(*)::BIGINT AS n
    FROM mixed
    GROUP BY lower(t)
    """,
)
def fn_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via Spark 4 collations: the column is
    collated UNICODE_CI and grouped directly — comparison semantics live
    in the type, not in lower() rewrites sprinkled over the query. Output
    labels are explicitly case-normalized (a CI group's representative is
    unspecified); the oracle groups on lower() classically.
    """
    p = load_table(spark, sf_dir, "part")
    mixed = p.select(
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_type"))
        .otherwise(F.lower("p_type"))
        .alias("t")
    )
    ci = mixed.select(F.expr("collate(t, 'UNICODE_CI')").alias("tc"))
    return ci.groupBy("tc").agg(F.count(F.lit(1)).alias("n")).select(
        F.lower(F.col("tc").cast("string")).alias("ptype"), "n"
    )


@register(
    "orders_backlog_aging",
    CAT_WORK,
    """
    WITH anchor AS (SELECT MAX(o_orderdate) AS mx FROM orders),
    open_o AS (
      SELECT date_diff('day', o_orderdate, mx) AS age_d, o_totalprice
      FROM orders CROSS JOIN anchor WHERE o_orderstatus = 'O'
    ),
    b AS (
      SELECT CASE WHEN age_d < 30 THEN '0-29'
                  WHEN age_d < 90 THEN '30-89'
                  WHEN age_d < 180 THEN '90-179'
                  WHEN age_d < 365 THEN '180-364'
                  ELSE '365+' END AS age_bucket,
             o_totalprice
      FROM open_o
    ),
    g AS (
      SELECT age_bucket, COUNT(*)::BIGINT AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                  AS DOUBLE) / 100.0 AS total_value
      FROM b GROUP BY age_bucket
    ),
    t AS (SELECT SUM(n_orders) AS nt FROM g)
    SELECT age_bucket, n_orders, total_value,
           (n_orders * 20000 + nt) // (2 * nt) / 10000.0 AS pct_orders
    FROM g CROSS JOIN t
    """,
)
def orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog aging: age every still-open order against the
    newest order date (broadcast scalar anchor — no wall clock, so the
    report is reproducible on any engine/day), bucket into standard aging
    bands, report count / value / share per band. One scan + dust-sized
    rollup; the share uses exact-integer 4dp rounding.
    """
    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("mx"))
    open_o = (
        o.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(anchor))
        .select(F.datediff("mx", "o_orderdate").alias("age_d"), "o_totalprice")
    )
    b = open_o.select(
        F.expr(
            "CASE WHEN age_d < 30 THEN '0-29'"
            " WHEN age_d < 90 THEN '30-89'"
            " WHEN age_d < 180 THEN '90-179'"
            " WHEN age_d < 365 THEN '180-364'"
            " ELSE '365+' END"
        ).alias("age_bucket"),
        "o_totalprice",
    )
    g = b.groupBy("age_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        (
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("double")
            / 100.0
        ).alias("total_value"),
    )
    t = g.agg(F.sum("n_orders").alias("nt"))
    return g.crossJoin(F.broadcast(t)).select(
        "age_bucket",
        "n_orders",
        "total_value",
        F.expr(
            "cast((n_orders * 20000 + nt) div (2 * nt) as double) / 10000.0"
        ).alias("pct_orders"),
    )
