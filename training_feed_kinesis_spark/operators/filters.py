"""§2.B Projection / filter / predicates.

Everything here stays sargable: plain column comparisons that Catalyst
pushes into the parquet scan (PushedFilters) — never wrapped in UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT = "2.B projection/filter"


@register(
    "project_compute",
    CAT,
    # raw (non-aggregated) arithmetic on doubles is bit-identical across
    # engines — same IEEE ops, no reduction order involved; no rounding needed
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount)           AS revenue,
           l_extendedprice * (1 - l_discount) * l_tax   AS tax_amount
    FROM lineitem WHERE l_linenumber = 1
    """,
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        "l_linenumber",
        rev.alias("revenue"),
        (rev * F.col("l_tax")).alias("tax_amount"),
    )


@register(
    "filter_compare",
    CAT,
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_quantity < 24 AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_returnflag != 'A'
    """,
)
def filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") < 24)
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_returnflag") != "A")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@register(
    "filter_between_in",
    CAT,
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE ts BETWEEN TIMESTAMP '2024-01-10' AND TIMESTAMP '2024-01-12'
      AND event_type IN ('purchase', 'signup')
    """,
)
def filter_between_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        F.col("ts").between("2024-01-10", "2024-01-12")
        & F.col("event_type").isin("purchase", "signup")
    ).select("event_id", "user_id", "event_type", "value")


@register(
    "filter_like",
    CAT,
    """
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_name LIKE '%bolt%' OR p_brand LIKE 'Brand#1_'
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%bolt%") | F.col("p_brand").like("Brand#1_")
    ).select("p_partkey", "p_name", "p_brand")


@register(
    "filter_null",
    CAT,
    # fixture data is NULL-free; NULLIF manufactures NULLs so IS [NOT] NULL
    # is genuinely exercised (three-valued logic through a CASE projection)
    """
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'O') AS status_or_null
    FROM orders
    WHERE NULLIF(o_orderstatus, 'O') IS NULL
       OR (NULLIF(o_orderstatus, 'O') IS NOT NULL AND o_totalprice > 400000)
    """,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    son = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select("o_orderkey", son.alias("status_or_null")).filter(
        F.col("status_or_null").isNull()
        | (F.col("status_or_null").isNotNull() & (o.o_totalprice > 400000))
    )


@register(
    "filter_boolean",
    CAT,
    """
    SELECT event_id, event_type, value
    FROM events
    WHERE (event_type = 'purchase' AND value > 150)
       OR (event_type = 'error' AND NOT (value < 100))
    """,
)
def filter_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        ((F.col("event_type") == "purchase") & (F.col("value") > 150))
        | ((F.col("event_type") == "error") & ~(F.col("value") < 100))
    ).select("event_id", "event_type", "value")


@register(
    "case_when",
    CAT,
    """
    SELECT event_id,
           CASE WHEN value >= 150 THEN 'high'
                WHEN value >= 50  THEN 'mid'
                ELSE 'low' END AS value_band,
           CASE event_type WHEN 'purchase' THEN 1 ELSE 0 END AS is_purchase
    FROM events
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("value") >= 150, "high")
        .when(F.col("value") >= 50, "mid")
        .otherwise("low")
        .alias("value_band"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_purchase"),
    )


@register(
    "distinct_rows",
    CAT,
    "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = hash-agg on all columns; partial agg collapses duplicates
    map-side, so the shuffle carries ≤ |domain| rows per partition at any scale."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()
