"""Wave 49: RFM segmentation, cohort LTV accumulation.

  * ``events_rfm_segmentation``: the classic recency/frequency/monetary
    quintile segmentation — per user, NTILE(5) on each axis under a
    unique total order, concatenated into the 111–555 segment code, with
    a per-segment census. The warehouse workload behind every CRM
    targeting list.
  * ``events_cohort_ltv_curve``: cumulative value per signup cohort by
    day offset — the money twin of ``retention_cohorts`` (activity): how
    much cumulative value a cohort has produced k days in, the curve LTV
    payback models are fit to.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table, sane_ts, sane_ts_sql

CAT_WORK = "2.M workloads"

ASOF = "2024-02-01"   # recency anchor: just past the events horizon
LTV_MAX_DAY = 14


@register(
    "events_rfm_segmentation",
    CAT_WORK,
    f"""
    WITH rfm AS (
      SELECT user_id,
             date_diff('day', MAX(ts), TIMESTAMP '{ASOF}') AS recency_d,
             COUNT(*)::BIGINT AS frequency,
             ROUND(COALESCE(SUM(value), 0), 4) AS monetary
      FROM events GROUP BY user_id
    ),
    scored AS (
      SELECT user_id, recency_d, frequency, monetary,
             NTILE(5) OVER (ORDER BY recency_d ASC,
                            user_id ASC NULLS LAST) AS r5,
             NTILE(5) OVER (ORDER BY frequency DESC,
                            user_id ASC NULLS LAST) AS f5,
             NTILE(5) OVER (ORDER BY monetary DESC,
                            user_id ASC NULLS LAST) AS m5
      FROM rfm
    )
    SELECT r5 * 100 + f5 * 10 + m5 AS segment,
           COUNT(*)::BIGINT AS n_users,
           ROUND(AVG(recency_d), 4) AS avg_recency_d,
           ROUND(AVG(frequency), 4) AS avg_frequency,
           ROUND(AVG(monetary), 4) AS avg_monetary
    FROM scored GROUP BY segment
    """,
)
def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quintile each user on recency (days before the
    anchor, best = most recent), frequency, and monetary value —
    NTILE(5) under a unique (metric, user_id) total order so both
    engines deal identical quintiles (NTILE's remainder-to-first-groups
    rule is shared SQL semantics) — then census the 3-digit segments.
    Segment 111 is "champions", 555 is "lost"; the census sizes each
    audience before a campaign targets it.

    Scale shape: one user-grain aggregate; three unpartitioned NTILE
    windows over the USER table (not the fact table) — at 100 TB users
    still fit a single sort each, and the production spelling quantiles
    via approx percentile cutpoints broadcast back (sketch path) instead
    of a global sort."""
    ev = load_table(spark, sf_dir, "events")
    rfm = ev.groupBy("user_id").agg(
        F.datediff(F.lit(ASOF).cast("timestamp"), F.max("ts")).alias(
            "recency_d"
        ),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 4).alias("monetary"),
    )
    # user_id tiebreak pinned NULLS LAST on both engines (Spark ASC
    # defaults NULLS FIRST, DuckDB NULLS LAST — a NULL-keyed user row
    # would shift every quintile boundary by one; NULL-attribute replay)
    r5 = F.ntile(5).over(
        Window.orderBy(F.col("recency_d").asc(), F.col("user_id").asc_nulls_last())
    )
    f5 = F.ntile(5).over(
        Window.orderBy(F.col("frequency").desc(), F.col("user_id").asc_nulls_last())
    )
    m5 = F.ntile(5).over(
        Window.orderBy(F.col("monetary").desc(), F.col("user_id").asc_nulls_last())
    )
    scored = rfm.select(
        "recency_d",
        "frequency",
        "monetary",
        (r5 * 100 + f5 * 10 + m5).alias("segment"),
    )
    return scored.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(F.avg("recency_d"), 4).alias("avg_recency_d"),
        F.round(F.avg("frequency"), 4).alias("avg_frequency"),
        F.round(F.avg("monetary"), 4).alias("avg_monetary"),
    )


@register(
    "events_cohort_ltv_curve",
    CAT_WORK,
    f"""
    WITH firsts AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS d0 FROM events
      WHERE {sane_ts_sql("ts")}
      GROUP BY user_id
    ),
    daily_val AS (
      SELECT f.d0 AS cohort_day,
             date_diff('day', f.d0, date_trunc('day', e.ts)) AS day_offset,
             CAST(ROUND(SUM(COALESCE(e.value, 0)) * 10000) AS BIGINT)
               AS v_cents
      FROM events e JOIN firsts f ON f.user_id = e.user_id
      WHERE {sane_ts_sql("e.ts")}
        AND date_diff('day', f.d0, date_trunc('day', e.ts))
            BETWEEN 0 AND {LTV_MAX_DAY}
      GROUP BY 1, 2
    ),
    sizes AS (
      SELECT d0 AS cohort_day, COUNT(*)::BIGINT AS n_users FROM firsts
      GROUP BY d0
    ),
    cum AS (
      SELECT dv.cohort_day, dv.day_offset, s.n_users,
             SUM(dv.v_cents) OVER (PARTITION BY dv.cohort_day
               ORDER BY dv.day_offset
               ROWS UNBOUNDED PRECEDING) AS cumc
      FROM daily_val dv JOIN sizes s ON s.cohort_day = dv.cohort_day
    )
    SELECT cohort_day, day_offset, n_users AS cohort_users,
           CAST((2 * cumc + n_users) // (2 * n_users) AS BIGINT) / 10000.0
             AS cum_ltv_per_user
    FROM cum
    """,
)
def events_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV accumulation: per signup-day cohort, cumulative value
    per user at each day offset 0..14 — the curve whose asymptote is LTV
    and whose early slope feeds payback-period decisions. Cumulative sum
    runs per cohort over ≤15 offset rows (the window operates on the
    AGGREGATED cohort×offset grid, never raw events).

    Scale shape: first-touch aggregate + one (cohort, offset) aggregate
    over the fact table; the cumsum window partitions by cohort with
    15-row partitions — trivially parallel."""
    # temporal admission (r12): a year-0001 sentinel becomes its user's
    # first-touch cohort day and every real event lands past day 14
    ev = load_table(spark, sf_dir, "events").filter(sane_ts("ts"))
    firsts = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("d0")
    )
    joined = ev.join(firsts, "user_id").select(
        F.col("d0").alias("cohort_day"),
        F.datediff(F.date_trunc("day", F.col("ts")), F.col("d0")).alias(
            "day_offset"
        ),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("v"),
    )
    daily_val = (
        joined.filter(F.col("day_offset").between(0, LTV_MAX_DAY))
        .groupBy("cohort_day", "day_offset")
        # quantize the daily sums to INTEGER 1e-4 units before the running
        # sum: a double cumsum folds each engine's slightly-different
        # rounded doubles and flips 4dp boundaries (caught at sf0.01);
        # BIGINT accumulation is exact, one final division per row
        .agg(
            F.round(F.sum("v") * 10000)
            .cast("bigint")
            .alias("v_cents")
        )
    )
    sizes = firsts.groupBy(F.col("d0").alias("cohort_day")).agg(
        F.count(F.lit(1)).alias("n_users")
    )
    w_cum = (
        Window.partitionBy("cohort_day")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # per-user rounding via EXACT half-up integer division — dividing by
    # the cohort size lands systematically on 4th-decimal half-points
    # (n=16 → 1/16 steps) where Spark's and DuckDB's ROUND disagree; the
    # (2c+n) div (2n) spelling has no float anywhere until one final
    # exact-decimal division. PRECONDITION: cumc >= 0 (events.value is
    # nonnegative); for a negative numerator this spelling degrades to
    # round-toward-zero, not half-up — guard before reusing elsewhere.
    # the cumulative accumulator ranges over a full cohort's value —
    # unbounded in corpus size — so it widens to DECIMAL(38,0) over the
    # 15-row cohort×offset grid (§5.3.6c); `div` on decimal still
    # returns the exact integral quotient, and the per-user quotient is
    # small enough for the BIGINT output either way
    cum = daily_val.join(sizes, "cohort_day").select(
        "cohort_day",
        "day_offset",
        "n_users",
        F.sum(F.col("v_cents").cast("decimal(38,0)")).over(w_cum).alias(
            "cumc"
        ),
    )
    return cum.select(
        "cohort_day",
        "day_offset",
        F.col("n_users").alias("cohort_users"),
        (
            F.expr("(2 * cumc + n_users) div (2 * n_users)").cast("bigint")
            / 10000.0
        ).alias("cum_ltv_per_user"),
    )
