"""§2.F Sorts / limits / top-k and §2.G set operations.

Determinism discipline (SURVEY §5.3.5): the driver's value-hash is
order-insensitive, but LIMIT changes WHICH rows survive — so every limit
here sits under a total order (unique tiebreak column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table

CAT_SORT = "2.F sorts/limits"
CAT_SET = "2.G set operations"


@register(
    "sort_multikey",
    CAT_SORT,
    """
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           ROW_NUMBER() OVER (ORDER BY o_orderpriority DESC, o_totalprice ASC,
                              o_orderkey ASC NULLS LAST) AS rank_pos
    FROM orders WHERE o_orderstatus = 'P'
    """,
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort, asc+desc mixed. The global row_number makes the sort
    order itself observable under an order-insensitive hash. Note: an
    unpartitioned window is a single-task operation — fine here because the
    'P' filter bounds the input; at 100 TB a global rank would instead be
    computed per-partition + offset (zipWithIndex pattern) or avoided.
    o_orderkey tiebreak pinned ASC NULLS LAST both engines (r10 max-tie
    sweep: a NULL-key order tying its redelivered twin sat on opposite
    sides across engines; two tied NULL-key rows are verbatim-identical,
    so their mutual order is unobservable)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    w = Window.orderBy(
        F.col("o_orderpriority").desc(), F.col("o_totalprice").asc(),
        F.col("o_orderkey").asc_nulls_last()
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rank_pos"),
    )


@register(
    "limit_topk",
    CAT_SORT,
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 100
    """,
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy().limit(k) — Catalyst plans TakeOrderedAndProject: each task
    keeps a k-element heap, the driver merges heaps. No global sort, no
    shuffle of the full table; this is THE scalable top-k at any data size.
    Total order via (price desc, orderkey, linenumber) makes the row set
    deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(100)
    )


def _rich(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_acctbal") > 5000).select("c_custkey")


def _building(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")


_RICH_SQL = "SELECT c_custkey FROM customer WHERE c_acctbal > 5000"
_BUILDING_SQL = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"


@register(
    "set_union_all",
    CAT_SET,
    f"{_RICH_SQL} UNION ALL {_BUILDING_SQL}",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — pure concatenation, zero shuffle (inputs overlap, so
    duplicates are genuinely present and preserved)."""
    return _rich(spark, sf_dir).unionByName(_building(spark, sf_dir))


@register(
    "set_union_distinct",
    CAT_SET,
    f"{_RICH_SQL} UNION {_BUILDING_SQL}",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rich(spark, sf_dir).union(_building(spark, sf_dir)).distinct()


@register(
    "set_intersect",
    CAT_SET,
    f"{_RICH_SQL} INTERSECT {_BUILDING_SQL}",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rich(spark, sf_dir).intersect(_building(spark, sf_dir))


@register(
    "set_except",
    CAT_SET,
    f"{_RICH_SQL} EXCEPT {_BUILDING_SQL}",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """subtract() IS set-EXCEPT. The old exceptAll().distinct() spelling
    was equivalent only on a duplicate-free left side: a key appearing
    twice on the left and once on the right survived the multiset
    difference and then the distinct — the r8 customer re-ingest
    campaign caught it (EXCEPT must drop any key present on the right,
    regardless of left multiplicity)."""
    return _rich(spark, sf_dir).subtract(_building(spark, sf_dir))


@register(
    "set_intersect_all",
    CAT_SET,
    # nationkey projections are duplicate-heavy → ALL semantics observable
    """
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT ALL
    SELECT c_nationkey FROM customer WHERE c_acctbal > 0
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = c.filter(F.col("c_acctbal") > 0).select("c_nationkey")
    return a.intersectAll(b)


@register(
    "set_except_all",
    CAT_SET,
    """
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT ALL
    SELECT c_nationkey FROM customer WHERE c_acctbal > 5000
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_nationkey")
    return a.exceptAll(b)


@register(
    "sort_nulls_ordering",
    CAT_SORT,
    """
    WITH v AS (
      SELECT event_id,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS val
      FROM events WHERE user_id = 3
    )
    SELECT event_id, ROUND(val, 4) AS val,
           ROW_NUMBER() OVER (ORDER BY val ASC NULLS FIRST,
                                       event_id ASC NULLS LAST)
             AS rn_nulls_first,
           ROW_NUMBER() OVER (ORDER BY val DESC NULLS LAST,
                                       event_id ASC NULLS LAST)
             AS rn_nulls_last
    FROM v
    """,
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST / NULLS LAST ordering — a real cross-engine
    trap: Spark's default is NULLS FIRST on ASC, DuckDB's is NULLS LAST,
    so any sort over a nullable key that does NOT pin null placement is
    silently engine-dependent. Both rank columns pin it explicitly
    (asc_nulls_first / desc_nulls_last), making the placement observable
    under the order-insensitive hash. NULLs are synthesized
    deterministically (error events) since the fixture column is
    non-null.

    Scale note: same single-task global-window caveat as sort_multikey —
    bounded here by the user filter."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") == 3)
    v = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", None)
        .otherwise(F.col("value"))
        .alias("val"),
    )
    # the event_id TIEBREAK is pinned too: under a NULL-PK sliver the
    # unpinned tiebreak put the NULL-id rows at opposite ends (r9)
    w_first = Window.orderBy(
        F.col("val").asc_nulls_first(), F.col("event_id").asc_nulls_last()
    )
    w_last = Window.orderBy(
        F.col("val").desc_nulls_last(), F.col("event_id").asc_nulls_last()
    )
    return v.select(
        "event_id",
        F.round("val", 4).alias("val"),
        F.row_number().over(w_first).alias("rn_nulls_first"),
        F.row_number().over(w_last).alias("rn_nulls_last"),
    )


@register(
    "limit_offset_paging",
    CAT_SORT,
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC NULLS LAST
    LIMIT 20 OFFSET 40
    """,
)
def limit_offset_paging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET pagination (page 3 of 20) under a total order — the
    API-pagination shape. Spark 3.4+ has a native offset(); under the
    unique (o_totalprice, o_orderkey) order both engines select the
    identical window of rows.

    Scale note: OFFSET is inherently top-(offset+limit) work — Catalyst
    still plans a bounded TakeOrdered of 60 rows, but deep pagination
    (OFFSET 10^6) degrades linearly; production paging at scale keys the
    page by the last-seen sort key (seek method) instead, which is the
    WHERE-clause spelling of this same total order."""
    # o_orderkey tiebreak pinned NULLS LAST both engines (r10 max-tie
    # sweep: the page boundary sliced NULL-key/real-key price ties
    # differently across engines)
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc_nulls_last())
        .offset(40)
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )
