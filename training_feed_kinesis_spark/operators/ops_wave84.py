"""Wave 84: discrete percentiles, inventory segmentation, forecast
reconciliation, freshness monitoring.

  * ``agg_percentile_disc``: exact DISCRETE percentiles (an actual data
    value, not an interpolation) per group via the rank spelling
    rn = ceil(q·n) — defined identically in both engines rather than
    leaning on either engine's quantile_disc convention.
  * ``orders_abc_xyz``: the ABC (revenue concentration) × XYZ (demand
    variability) matrix — the inventory-management segmentation; both
    class axes derive from already-rounded/exact-integer columns so the
    9-cell census is engine-exact.
  * ``ts_hier_reconcile``: bottom-up vs top-down forecast
    reconciliation for the final week — per-type seasonal-naive
    forecasts summed up vs the total's forecast allocated down by
    trailing shares, with per-method absolute errors; integer cents
    throughout.
  * ``dq_freshness_lag``: per-stream-key staleness — minutes since the
    key's last event relative to the feed's watermark, with an SLA
    flag; the first chart on any ingest dashboard.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table, release_after, sane_ts, sane_ts_sql

CAT_AGG = "2.D aggregations"
CAT_REP = "2.L reporting"
CAT_TS = "2.L time-series analytics"
CAT_DQ = "2.L data quality / privacy"


@register(
    "agg_percentile_disc",
    CAT_AGG,
    """
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           MAX(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)
                    THEN value END) AS p25_disc,
           MAX(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT)
                    THEN value END) AS p50_disc,
           MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                    THEN value END) AS p95_disc,
           CAST(MAX(n) AS BIGINT) AS n
    FROM ranked
    GROUP BY event_type
    """,
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles per event type: the value AT rank ⌈q·n⌉
    under a total order (value, event_id) — always an actual data
    point, never an interpolation (the right definition for latencies
    and money, where an interpolated 'value' may be unobservable).
    Spelled with the same explicit rank formula in both engines —
    engines' built-in quantile_disc conventions differ on which side
    of the cut they take, so the definition lives in the query, not
    the engine. No ROUND needed anywhere: outputs are raw stored
    values.

    Scale shape: one window per group partition (shuffle by the group
    key); at extreme group sizes the rank spelling degrades to the
    approx_percentile sketch (agg_approx_percentile_bound measures
    exactly what that trade costs)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", F.col("event_id").asc_nulls_last())
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    def at(q: str):
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.expr(f"{q} * n")).cast("long"),
                F.col("value"),
            )
        )

    return ranked.groupBy("event_type").agg(
        at("0.25").alias("p25_disc"),
        at("0.50").alias("p50_disc"),
        at("0.95").alias("p95_disc"),
        F.max("n").cast("long").alias("n"),
    )


@register(
    "orders_abc_xyz",
    CAT_REP,
    """
    WITH per_part AS (
      -- per-ROW cent quantization (r8 float-sum convention): ROUND of
      -- a float SUM flips a cent with accumulation order (r9
      -- permutation sweep); cents keep whale rows inside BIGINT
      -- (wave-97 whale fixture)
      SELECT l_partkey,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                      AS BIGINT)) AS rev_s
      FROM lineitem GROUP BY 1
    ),
    abc AS (
      SELECT l_partkey, rev_s,
             CASE WHEN 10 * (SUM(rev_s) OVER (
                    ORDER BY rev_s DESC, l_partkey ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                  <= 7 * (SUM(rev_s) OVER ()) THEN 'A'
                  WHEN 10 * (SUM(rev_s) OVER (
                    ORDER BY rev_s DESC, l_partkey ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                  <= 9 * (SUM(rev_s) OVER ()) THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM per_part
    ),
    monthly AS (
      SELECT l_partkey, date_trunc('month', l_shipdate) AS m,
             CAST(SUM(l_quantity) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    xyz AS (
      SELECT l_partkey,
             CASE WHEN ROUND(stddev_samp(q) / AVG(q), 4) < 0.5 THEN 'X'
                  WHEN ROUND(stddev_samp(q) / AVG(q), 4) < 1.0 THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM monthly GROUP BY l_partkey HAVING COUNT(*) >= 2
    )
    SELECT a.abc_class, x.xyz_class,
           COUNT(*)::BIGINT AS n_parts,
           CAST(SUM(a.rev_s) AS BIGINT) AS rev_cents
    FROM abc a JOIN xyz x USING (l_partkey)
    GROUP BY a.abc_class, x.xyz_class
    """,
)
def orders_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC×XYZ segmentation of the part catalog: ABC classes by
    cumulative revenue share (A = top 70%, B = next 20%, C = tail —
    integer cross-multiplied thresholds on exact cents, the
    revenue_abc_class spelling), crossed with XYZ demand-variability
    classes from the coefficient of variation of monthly shipped
    quantity (X < 0.5, Y < 1.0, Z else — classes cut on the ROUNDED
    cv, so the boundary can only disagree if the rounded value itself
    does). The 9-cell matrix is how inventory planners decide
    forecast-vs-buffer strategy per segment; parts with a single
    demand month are excluded (cv undefined).

    Scale shape: two fact aggregates (part grain, part×month grain),
    one ordered window over the part table for the cumulative share,
    and a part-grain join — no fact-scale joins."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(
            F.expr(
                "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)"
                " AS BIGINT)"
            )
        ).alias("rev_s")
    )
    w_cum = Window.orderBy(
        F.col("rev_s").desc(), F.col("l_partkey").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    # corpus-scale cumulative/total accumulators + the ×10 threshold
    # cross-multiplications exceed int64 before the part-grain inputs
    # do — widen to DECIMAL(38,0) over the aggregated rows (§5.3.6c;
    # DuckDB widens to HUGEINT on its own)
    rev_d = F.col("rev_s").cast("decimal(38,0)")
    cum = F.sum(rev_d).over(w_cum)
    tot = F.sum(rev_d).over(w_all)
    abc = per_part.select(
        "l_partkey",
        "rev_s",
        F.when(10 * cum <= 7 * tot, "A")
        .when(10 * cum <= 9 * tot, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    monthly = li.groupBy(
        "l_partkey", F.date_trunc("month", "l_shipdate").alias("m")
    ).agg(F.sum("l_quantity").cast("long").alias("q"))
    cv = F.round(F.stddev_samp("q") / F.avg("q"), 4)
    xyz = (
        monthly.groupBy("l_partkey")
        .agg(cv.alias("cv"), F.count(F.lit(1)).alias("nm"))
        .filter(F.col("nm") >= 2)
        .select(
            "l_partkey",
            F.when(F.col("cv") < 0.5, "X")
            .when(F.col("cv") < 1.0, "Y")
            .otherwise("Z")
            .alias("xyz_class"),
        )
    )
    return (
        abc.join(xyz, "l_partkey")
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev_s").cast("long").alias("rev_cents"),
        )
    )


@register(
    "ts_hier_reconcile",
    CAT_TS,
    """
    WITH cells AS (
      SELECT date_trunc('day', ts) AS day, event_type,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    bounds AS (SELECT MAX(day) AS last_day FROM cells),
    final_week AS (
      SELECT c.* FROM cells c CROSS JOIN bounds b
      WHERE c.day > b.last_day - INTERVAL 7 DAY
    ),
    snaive AS (
      SELECT f.day, f.event_type, f.cents AS actual_cents,
             p.cents AS f_bu_cents
      FROM final_week f
      JOIN cells p ON p.event_type = f.event_type
        AND p.day = f.day - INTERVAL 7 DAY
    ),
    total_prev AS (
      SELECT day + INTERVAL 7 DAY AS day, SUM(cents)::BIGINT AS f_total
      FROM cells GROUP BY day
    ),
    shares AS (
      SELECT c.event_type, SUM(c.cents)::BIGINT AS type_cents
      FROM cells c CROSS JOIN bounds b
      WHERE c.day <= b.last_day - INTERVAL 7 DAY
      GROUP BY c.event_type
    ),
    share_tot AS (SELECT SUM(type_cents)::BIGINT AS all_cents FROM shares)
    SELECT s.day, s.event_type, s.actual_cents, s.f_bu_cents,
           CAST((2 * tp.f_total * sh.type_cents + st.all_cents)
                // (2 * st.all_cents) AS BIGINT) AS f_td_cents,
           ABS(s.f_bu_cents - s.actual_cents)::BIGINT AS abs_err_bu,
           ABS(CAST((2 * tp.f_total * sh.type_cents + st.all_cents)
                    // (2 * st.all_cents) AS BIGINT) - s.actual_cents)
             ::BIGINT AS abs_err_td
    FROM snaive s
    JOIN total_prev tp ON tp.day = s.day
    JOIN shares sh ON sh.event_type = s.event_type
    CROSS JOIN share_tot st
    """,
)
def ts_hier_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical forecast reconciliation over the final week:
    BOTTOM-UP — each event type forecast by seasonal-naive (its value 7
    days prior), totals implied by summing; TOP-DOWN — the total's
    seasonal-naive forecast allocated to types by their training-window
    revenue shares (integer half-up on exact cents). Emitting both
    methods' per-cell absolute errors answers the planner's question —
    forecast at the leaves or at the top? — with data instead of
    doctrine (Hyndman's coherence problem, the two classical poles).

    Scale shape: one (day, type) aggregate; everything downstream is
    domain-sized (7×5 cells) with broadcast share tables."""
    # NULL ts dropped on both engines (the r8 NULL-time seam)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    cells = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")).cast("long").alias("cents"))
    # cache + release_after: unpersisted when the returned frame dies
    # (r7 cache-residue class)
    cells = cells.cache()
    bounds = cells.agg(F.max("day").alias("last_day"))
    final_week = cells.crossJoin(F.broadcast(bounds)).filter(
        F.col("day") > F.col("last_day") - F.expr("INTERVAL 7 DAY")
    )
    prev = cells.select(
        F.col("day") + F.expr("INTERVAL 7 DAY"),
        "event_type",
        F.col("cents").alias("f_bu_cents"),
    ).toDF("day", "event_type", "f_bu_cents")
    snaive = final_week.select(
        "day", "event_type", F.col("cents").alias("actual_cents")
    ).join(prev, ["day", "event_type"])
    total_prev = (
        cells.groupBy("day")
        .agg(F.sum("cents").alias("f_total"))
        .select(
            (F.col("day") + F.expr("INTERVAL 7 DAY")).alias("day"), "f_total"
        )
    )
    shares = (
        cells.crossJoin(F.broadcast(bounds))
        .filter(F.col("day") <= F.col("last_day") - F.expr("INTERVAL 7 DAY"))
        .groupBy("event_type")
        .agg(F.sum("cents").alias("type_cents"))
    )
    share_tot = shares.agg(F.sum("type_cents").alias("all_cents"))
    td = F.expr(
        "CAST((2 * f_total * type_cents + all_cents)"
        " DIV (2 * all_cents) AS BIGINT)"
    )
    out = (
        snaive.join(F.broadcast(total_prev), "day")
        .join(F.broadcast(shares), "event_type")
        .crossJoin(F.broadcast(share_tot))
        .select(
            "day",
            "event_type",
            "actual_cents",
            "f_bu_cents",
            td.alias("f_td_cents"),
            F.abs(F.col("f_bu_cents") - F.col("actual_cents"))
            .cast("long")
            .alias("abs_err_bu"),
            F.abs(td - F.col("actual_cents")).cast("long").alias("abs_err_td"),
        )
    )
    return release_after(out, cells)


@register(
    "dq_freshness_lag",
    CAT_DQ,
    """
    WITH per_key AS (
      SELECT event_type, MAX(ts) AS last_seen, COUNT(*)::BIGINT AS n
      FROM events WHERE {sane} GROUP BY event_type
    ),
    wm AS (SELECT MAX(last_seen) AS feed_max FROM per_key)
    SELECT p.event_type, p.last_seen, p.n,
           (epoch_us(w.feed_max) - epoch_us(p.last_seen)) // 60000000
             AS lag_minutes,
           (epoch_us(w.feed_max) - epoch_us(p.last_seen)) // 60000000 > 1440
             AS stale_24h
    FROM per_key p CROSS JOIN wm w
    """.format(sane=sane_ts_sql("ts")),
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key ingest freshness: minutes between each event type's last
    arrival and the feed's high-water mark, with a 24-hour staleness
    flag — the gauge that distinguishes "the producer died" from "the
    feed is slow" before anyone debugs the consumer. Lag is exact
    integer microseconds floored to minutes in both engines.

    Scale shape: one map-combinable MAX census + a broadcast scalar;
    at 100 TB this runs on the partition-pruned tail, not the history."""
    # temporal admission (r12): ONE 9999-12-31 sentinel becomes the feed
    # high-water mark and marks every healthy key 4.2 million hours stale
    # — freshness is only meaningful over validated event times
    ev = load_table(spark, sf_dir, "events").filter(sane_ts("ts"))
    per_key = ev.groupBy("event_type").agg(
        F.max("ts").alias("last_seen"), F.count(F.lit(1)).alias("n")
    )
    wm = per_key.agg(F.max("last_seen").alias("feed_max"))
    lag_min = F.expr(
        "(unix_micros(feed_max) - unix_micros(last_seen)) DIV 60000000"
    )
    return per_key.crossJoin(F.broadcast(wm)).select(
        "event_type",
        "last_seen",
        "n",
        lag_min.alias("lag_minutes"),
        (lag_min > 1440).alias("stale_24h"),
    )
