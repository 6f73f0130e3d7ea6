"""Time-series round 2: EWMA smoothing, WoW growth, interval overlap, OHLC.

Sequential-looking analytics, spelled as windows/joins so they distribute:

  * EWMA is "inherently sequential" only in its recurrence form. The adjusted
    EWMA rewrites to a ratio of two running weighted sums:
        ewma_t = Σ_{i<=t} x_i·2^i / Σ_{i<=t} 2^i          (α = 0.5)
    (the 0.5^t factor cancels), so it becomes two window SUMs — fully
    parallel per key, and bitwise reproducible across engines because both
    accumulate the same running frame in the same row order. Exponents are
    bounded by the per-key row count (days in a month), so no overflow.
  * WoW growth: aggregate to the week grain first, THEN lag — the window
    runs over ~#weeks rows, not the fact table.
  * Interval overlap is the bounded self-join shape (equi key + range
    residual): per-customer order windows, fan-out capped by orders/customer.
  * OHLC candles use one-pass arg-extremes (max_by/min_by with composite
    tiebreak) — no join-back, no second shuffle.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md §0.1);
capability surface reconstructed per SURVEY.md §2 and BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table

CAT = "2.L time-series analytics"


@register(
    "ts_ewma",
    CAT,
    """
    WITH daily AS (
      -- exact-cents daily mean (r10 max-tie sweep): AVG(double) is
      -- accumulation-order-dependent, and a redelivered duplicate in
      -- the day group pushed the quotient onto a 4dp knife edge; the
      -- integer-cents sum + ONE division is bit-identical per group
      SELECT user_id, date_trunc('day', ts) AS day,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE)
               / (100.0 * COUNT(value)) AS x
      FROM events WHERE ts IS NOT NULL
      GROUP BY user_id, date_trunc('day', ts)
    ),
    rn AS (
      SELECT user_id, day, x,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS i
      FROM daily
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           ROUND(
             SUM(x * power(2.0, i)) OVER (PARTITION BY user_id ORDER BY i
                                          ROWS UNBOUNDED PRECEDING)
             / SUM(power(2.0, i)) OVER (PARTITION BY user_id ORDER BY i
                                        ROWS UNBOUNDED PRECEDING), 4) AS ewma
    FROM rn
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α=0.5) of each user's daily
    mean value. The recurrence is algebraically unrolled into a ratio of
    two running weighted sums (see module docstring) — two window SUMs
    over the daily grain, zero sequential state. Weights 2^i are exact
    doubles and both engines sum the frame in identical row order, so the
    quotient hash-matches at 4dp. NULL ts dropped on both engines: a
    NULL day group would sort to opposite ends of the i-order across
    engines and shift every weight (the ADVICE r7 ordering seam).
    The daily mean is an exact integer-cents sum with ONE division
    (r10 max-tie sweep: AVG(double) accumulation order pushed a
    duplicate-inflated day group onto a 4dp knife edge).
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    )
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        (
            F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)"))
            .cast("double")
            # COUNT(value), not COUNT(*): the cents SUM already skips NULL
            # values, so dividing by the row count would silently redefine
            # the statistic from AVG to sum/rows under NULL values
            # (ADVICE r10) — keep AVG's NULL semantics on both engines
            / (100.0 * F.count("value"))
        ).alias("x")
    )
    rn = daily.select(
        "user_id",
        "day",
        "x",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("day"))
        .alias("i"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = F.pow(F.lit(2.0), F.col("i"))
    return rn.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(
            F.sum(F.col("x") * wt).over(w) / F.sum(wt).over(w), 4
        ).alias("ewma"),
    )


@register(
    "ts_wow_growth",
    CAT,
    """
    WITH weekly AS (
      SELECT date_trunc('week', l_shipdate) AS wk,
             SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS wr_s
      FROM lineitem GROUP BY date_trunc('week', l_shipdate)
    )
    SELECT strftime(wk, '%Y-%m-%d') AS week_start,
           CAST(wr_s AS DOUBLE) / 10000.0 AS revenue,
           ROUND(100.0 * CAST(wr_s - lag(wr_s) OVER (ORDER BY wk) AS DOUBLE)
                 / CAST(lag(wr_s) OVER (ORDER BY wk) AS DOUBLE), 4) AS wow_pct
    FROM weekly
    """,
)
def ts_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue growth. Aggregate to the week grain first
    (fact-scale shuffle happens once, map-side combined), then a single
    unpartitioned lag over ~#weeks rows — the tiny-window-over-aggregate
    pattern that keeps the global window harmless at any SF. Both
    date_trunc('week') dialects are ISO-Monday, verified.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # exact scale-1e4 integer revenue (§5.3.6b): the WoW ratio divides
    # bit-identical integer lags on both engines
    weekly = li.groupBy(F.date_trunc("week", "l_shipdate").alias("wk")).agg(
        F.sum(
            F.expr(
                "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
                " * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))"
            )
        ).alias("wr_s")
    )
    w = Window.orderBy("wk")
    prev = F.lag("wr_s").over(w)
    return weekly.select(
        F.date_format("wk", "yyyy-MM-dd").alias("week_start"),
        (F.col("wr_s").cast("double") / 10000.0).alias("revenue"),
        F.round(
            F.lit(100.0)
            * (F.col("wr_s") - prev).cast("double")
            / prev.cast("double"),
            4,
        ).alias("wow_pct"),
    )


@register(
    "join_interval_overlap",
    CAT,
    """
    SELECT o1.o_custkey AS custkey,
           COUNT(*)::BIGINT AS n_overlaps,
           SUM(date_diff('day',
                 greatest(o1.o_orderdate, o2.o_orderdate),
                 least(o1.o_orderdate + INTERVAL 30 DAY,
                       o2.o_orderdate + INTERVAL 30 DAY)))::BIGINT
             AS total_overlap_days
    FROM orders o1 JOIN orders o2
      ON o1.o_custkey = o2.o_custkey
     AND o1.o_orderkey < o2.o_orderkey
     AND o1.o_orderdate < o2.o_orderdate + INTERVAL 30 DAY
     AND o2.o_orderdate < o1.o_orderdate + INTERVAL 30 DAY
    GROUP BY o1.o_custkey
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: pairs of same-customer orders whose
    30-day fulfillment windows overlap, with total overlapping days. The
    equi key (custkey) carries the shuffle; the range residual is a
    post-join filter, and fan-out is bounded by orders-per-customer — the
    canonical way to keep a temporal theta join out of BNLJ territory.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    o1 = o.alias("o1")
    o2 = o.alias("o2")
    end1 = F.col("o1.o_orderdate") + F.expr("INTERVAL 30 DAY")
    end2 = F.col("o2.o_orderdate") + F.expr("INTERVAL 30 DAY")
    joined = o1.join(
        o2,
        (F.col("o1.o_custkey") == F.col("o2.o_custkey"))
        & (F.col("o1.o_orderkey") < F.col("o2.o_orderkey"))
        & (F.col("o1.o_orderdate") < end2)
        & (F.col("o2.o_orderdate") < end1),
    )
    overlap_days = F.datediff(
        F.least(end1, end2),
        F.greatest(F.col("o1.o_orderdate"), F.col("o2.o_orderdate")),
    )
    return joined.groupBy(F.col("o1.o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        F.sum(overlap_days).cast("long").alias("total_overlap_days"),
    )


@register(
    "ts_ohlc",
    CAT,
    """
    WITH ranked AS (
      SELECT event_type, date_trunc('day', ts) AS day, value, ts, event_id,
             row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts, event_id, value) AS rn_open,
             row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC, value DESC)
               AS rn_close
      FROM events WHERE ts IS NOT NULL
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           ROUND(MAX(CASE WHEN rn_open = 1 THEN value END), 4) AS open,
           ROUND(MAX(value), 4) AS high,
           ROUND(MIN(value), 4) AS low,
           ROUND(MAX(CASE WHEN rn_close = 1 THEN value END), 4) AS close,
           COUNT(*)::BIGINT AS n_events
    FROM ranked
    GROUP BY event_type, day
    """,
)
def ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC candles per event type: open/close via one-pass
    arg-extremes on the composite (ts, event_id) time key — min_by/max_by
    resolve first/last deterministically under timestamp ties without a
    ranking join-back — plus plain min/max/count. One hash aggregation,
    one shuffle, at any scale. NULL ts dropped on both engines (the r8
    NULL-time seam: a NULL-ts event has no candle and its struct order
    diverges across engines).
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    # value joins the arg-extreme key: a redelivered duplicate event_id
    # at the same ts would otherwise make the open/close election
    # engine-arbitrary (events-redelivery corruption replay) — among
    # exact time ties the smaller value opens, the larger closes
    tkey_first = F.expr("min_by(value, struct(ts, event_id, value))")
    tkey_last = F.expr("max_by(value, struct(ts, event_id, value))")
    return ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        F.round(tkey_first, 4).alias("open"),
        F.round(F.max("value"), 4).alias("high"),
        F.round(F.min("value"), 4).alias("low"),
        F.round(tkey_last, 4).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    ).select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "open",
        "high",
        "low",
        "close",
        "n_events",
    )
