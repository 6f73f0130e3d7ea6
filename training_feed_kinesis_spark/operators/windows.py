"""§2.E Window functions.

Every window here is PARTITIONED (user_id / custkey) — partitions parallelize
across executors, so these scale linearly; only sort_multikey (§2.F)
deliberately demonstrates the unpartitioned case.

Determinism: rank-producing windows order on a unique tiebreak (event_id /
o_orderkey) so results are stable across engines; fractional rank outputs
(percent_rank, cume_dist) are rounded like any computed double would be if
reduction order mattered — here they're exact rationals, rounded anyway for
uniform discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table, sane_ts

CAT = "2.E window functions"


@register(
    "win_ranking",
    CAT,
    """
    SELECT event_id, user_id, value,
           ROW_NUMBER()   OVER w AS rn,
           RANK()         OVER w AS rk,
           DENSE_RANK()   OVER w AS drk,
           NTILE(4)       OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
           ROUND(CUME_DIST()    OVER w, 4) AS cume
    FROM events
    -- every ORDER BY column pins NULL placement: Spark defaults NULLS
    -- FIRST on ASC, DuckDB NULLS LAST — a NULL in EITHER the value or
    -- the event_id tiebreak shifts every rank (NULL-PK r9)
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY value DESC NULLS LAST, event_id ASC NULLS LAST)
    """,
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc_nulls_last(), F.col("event_id").asc_nulls_last()
    )
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    )


@register(
    "win_lag_lead",
    CAT,
    """
    SELECT event_id, user_id, ts,
           LAG(value, 1)  OVER w AS prev_value,
           LEAD(value, 1) OVER w AS next_value,
           LAG(value, 2, -1.0) OVER w AS prev2_or_default
    FROM events WHERE (ts IS NULL OR (ts >= TIMESTAMP '1970-01-01' AND ts < TIMESTAMP '2200-01-01'))
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    # temporal admission (r12): ts is emitted raw, and out-of-window
    # sentinels are uncollectable (NULL ts rows still flow — the NULLS
    # LAST discipline below is their seam, not the gate's)
    ev = load_table(spark, sf_dir, "events").filter(sane_ts("ts"))
    # ts ASC NULLS LAST both engines: Spark defaults NULLS FIRST, DuckDB
    # NULLS LAST — a NULL-ts sliver would otherwise sit at opposite ends
    # of every partition (the r8 NULL-time sweep caught this family).
    # The event_id TIEBREAK is pinned NULLS LAST too (r10 joint sweep):
    # a NULL-id row tying a redelivered real-id twin on (user_id, ts)
    # otherwise sits on opposite sides of the tie across engines.
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), F.col("event_id").asc_nulls_last()
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_or_default"),
    )


@register(
    "win_frame_rows",
    CAT,
    # running total is order-dependent per row (not a reduction across an
    # arbitrary partition order) — same prefix order both engines → round 4
    """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id
                 ORDER BY ts NULLS LAST, event_id NULLS LAST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total,
           ROUND(AVG(value) OVER (PARTITION BY user_id
                 ORDER BY ts NULLS LAST, event_id NULLS LAST
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)         AS moving_avg3
    FROM events
    """,
)
def win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # ts NULLS LAST both engines (r8 NULL-time seam); event_id tiebreak
    # NULLS LAST too (r10 joint sweep: NULL-id row tying its redelivered
    # real-id twin on ts sat on opposite sides of the tie across engines)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), F.col("event_id").asc_nulls_last()
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4
        ).alias("running_total"),
        F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg3"),
    )


@register(
    "win_frame_range",
    CAT,
    """
    SELECT event_id, user_id, value,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY value
                 RANGE BETWEEN 10.0 PRECEDING AND CURRENT ROW) AS n_within_10,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY value
                 RANGE BETWEEN 10.0 PRECEDING AND 10.0 FOLLOWING), 4) AS sum_pm10
    FROM events
    """,
)
def win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: peers by VALUE distance, not row position — frame contents
    are order-independent for a given row, so ties don't hurt determinism."""
    ev = load_table(spark, sf_dir, "events")
    # fractional RANGE bounds are SQL-only (the Python rangeBetween API
    # accepts integer offsets) — same plan either way
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.expr(
            "COUNT(*) OVER (PARTITION BY user_id ORDER BY value "
            "RANGE BETWEEN 10.0 PRECEDING AND CURRENT ROW)"
        ).alias("n_within_10"),
        F.round(
            F.expr(
                "SUM(value) OVER (PARTITION BY user_id ORDER BY value "
                "RANGE BETWEEN 10.0 PRECEDING AND 10.0 FOLLOWING)"
            ),
            4,
        ).alias("sum_pm10"),
    )


@register(
    "win_value",
    CAT,
    """
    SELECT event_id, user_id,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type)  OVER w AS last_type,
           NTH_VALUE(event_type, 2) OVER w AS second_type
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value with an explicit full-partition frame — the
    default frame ends at CURRENT ROW, which silently makes LAST_VALUE ≡
    current row in both engines; the explicit frame is the correct spelling."""
    ev = load_table(spark, sf_dir, "events")
    # ts ASC NULLS LAST both engines (r8 NULL-time seam); event_id
    # tiebreak NULLS LAST too (r10 joint sweep, latent here)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc_nulls_last(), F.col("event_id").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
    )


@register(
    "topk_per_group",
    CAT,
    """
    SELECT c_custkey, o_orderkey, o_totalprice, rn AS order_rank
    FROM (
      SELECT c_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY o_totalprice DESC,
                                         o_orderkey ASC NULLS LAST) AS rn
      FROM customer JOIN orders ON c_custkey = o_custkey
    ) t WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. row_number-filter is the scalable per-group
    top-k: one shuffle on the partition key, per-key heap in the sort, no
    global sort. (At extreme k×groups, pre-aggregate with a partial top-k
    per map task first — not needed at these cardinalities.)
    o_orderkey tiebreak pinned ASC NULLS LAST both engines (r10 joint
    sweep: a NULL-key order tying its duplicated real-key twin on
    o_totalprice ranked on opposite sides of the tie across engines)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = c.join(o, c.c_custkey == o.o_custkey)
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc_nulls_last()
    )
    return (
        joined.withColumn("order_rank", F.row_number().over(w))
        .filter(F.col("order_rank") <= 3)
        .select("c_custkey", "o_orderkey", "o_totalprice", "order_rank")
    )
