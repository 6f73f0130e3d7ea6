"""Wave 98 (round 7, second wave): post-detection analytics — four
oracled keys that CONSUME the round's detectors (net-new total this
round 12 of the allowed 20).

  * ``ts_changepoint_segfit``: the step after a CUSUM alarm — split the
    series at the CUSUM-argmax day and fit per-segment OLS trends (the
    binary-segmentation step of changepoint analysis); reuses the
    registered ``ts_cusum_changepoint`` as its detector.
  * ``stat_cohens_d``: effect size for the A/B testing family —
    Cohen's d with pooled SD plus Hedges' small-sample correction; the
    number reported NEXT TO stat_ttest_welch's p-value.
  * ``events_bounce_rate``: single-event-session share per session
    ENTRY event type — the engagement census sessionization exists to
    feed; entry type via the chr(1)-sentinel arg_min (the
    agg_first_last NULL discipline).
  * ``dq_date_sanity_census``: temporal admission gate — per date
    column: NULLs, out-of-plausible-range counts, observed min/max,
    weekend share — the ingest check in front of every time-bucketing
    consumer (the pre-epoch corruption class showed why).

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

CAT_TS = "2.L time-series analytics"
CAT_STAT = "2.L statistics"
CAT_EVENTS = "2.M workloads"
CAT_DQ = "2.L data quality"

# the CUSUM spelling, re-derived for the oracle (same text as
# ts_cusum_changepoint's CTE chain; tests pin the two keys' agreement)
_CUSUM_CTES = f"""
    daily AS (
      SELECT o_orderdate AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders WHERE o_orderdate IS NOT NULL
        AND {sane_ts_sql('o_orderdate')} GROUP BY o_orderdate
    ),
    centered AS (
      SELECT day, rev_c,
             rev_c - (SELECT CAST(SUM(rev_c) // COUNT(*) AS BIGINT)
                      FROM daily) AS y
      FROM daily
    ),
    prefix AS (
      SELECT day, rev_c,
             SUM(y) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS p
      FROM centered
    ),
    cusum AS (
      SELECT day, rev_c,
             p - MIN(p) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS s
      FROM prefix
    )
"""


@register(
    "ts_changepoint_segfit",
    CAT_TS,
    f"""
    WITH {_CUSUM_CTES},
    cp AS (
      SELECT day AS cp_day FROM prefix ORDER BY ABS(p) DESC, day ASC
      LIMIT 1
    ),
    indexed AS (
      SELECT c.day, CAST(c.rev_c AS DOUBLE) / 100.0 AS rev, c.rev_c,
             date_diff('day', (SELECT MIN(day) FROM daily), c.day) AS di,
             c.day > (SELECT cp_day FROM cp) AS post
      FROM prefix c
    )
    -- segment means from the exact cents sums, UNROUNDED (r11 magnitude
    -- lint, 5.3.9a): daily revenue is a grower and AVG(double) inherits
    -- accumulation order; the bounded slopes keep the 4dp round
    SELECT strftime((SELECT cp_day FROM cp), '%Y-%m-%d') AS cp_day,
           CAST(COUNT(*) FILTER (WHERE NOT post) AS BIGINT) AS n_pre,
           CAST(COUNT(*) FILTER (WHERE post) AS BIGINT) AS n_post,
           ROUND(regr_slope(rev, di) FILTER (WHERE NOT post), 4)
             AS slope_pre,
           ROUND(regr_slope(rev, di) FILTER (WHERE post), 4)
             AS slope_post,
           CAST(SUM(rev_c) FILTER (WHERE NOT post) AS DOUBLE)
             / (100.0 * NULLIF(COUNT(rev_c) FILTER (WHERE NOT post), 0))
             AS mean_pre,
           CAST(SUM(rev_c) FILTER (WHERE post) AS DOUBLE)
             / (100.0 * NULLIF(COUNT(rev_c) FILTER (WHERE post), 0))
             AS mean_post,
           CAST(SUM(rev_c) FILTER (WHERE post) AS DOUBLE)
             / (100.0 * NULLIF(COUNT(rev_c) FILTER (WHERE post), 0))
           - CAST(SUM(rev_c) FILTER (WHERE NOT post) AS DOUBLE)
             / (100.0 * NULLIF(COUNT(rev_c) FILTER (WHERE NOT post), 0))
             AS level_shift
    FROM indexed
    GROUP BY 1
    """,
)
def ts_changepoint_segfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-segmentation step after a CUSUM alarm: estimate the
    changepoint as argmax |P_t| of the centered prefix sum — the
    textbook CUSUM location estimator (for a sustained mean shift, P is
    V-shaped with its extremum at the LAST pre-shift day; the alarm
    statistic S_t = P − min P instead peaks at the series end, which a
    planted-shift test caught when this key briefly split there) — then
    fit per-segment OLS trends plus the level shift, the 'what actually
    changed' report that turns a detection into an estimate. Shares the
    exact-cents prefix substrate with ts_cusum_changepoint
    (_cusum_prefix; earliest day on |P| ties — a unique total order).

    Scale shape: inherits the detector's day-grain series; the argmax
    is a 1-row TakeOrderedAndProject broadcast back; the segment fit is
    one conditional-aggregate pass over day-grain rows (regr_* moments
    are map-side combinable sums).
    """
    from .ops_wave97 import _cusum_prefix

    pf = _cusum_prefix(spark, sf_dir).select(
        "day",
        (F.col("rev_c").cast("double") / 100.0).alias("revenue"),
        "rev_c",
        "p",
    )
    cp = (
        pf.orderBy(F.abs(F.col("p")).desc(), F.col("day").asc())
        .limit(1)
        .select(F.col("day").alias("cp_day"))
    )
    d0 = pf.agg(F.min("day").alias("d0"))
    indexed = (
        pf.crossJoin(F.broadcast(cp))
        .crossJoin(F.broadcast(d0))
        .select(
            "revenue",
            "rev_c",
            F.datediff("day", "d0").alias("di"),
            (F.col("day") > F.col("cp_day")).alias("post"),
            F.date_format("cp_day", "yyyy-MM-dd").alias("cp_day"),
        )
    )
    return indexed.groupBy("cp_day").agg(
        F.expr("COUNT(*) FILTER (WHERE NOT post)").alias("n_pre"),
        F.expr("COUNT(*) FILTER (WHERE post)").alias("n_post"),
        F.expr(
            "ROUND(regr_slope(revenue, di) FILTER (WHERE NOT post), 4)"
        ).alias("slope_pre"),
        F.expr(
            "ROUND(regr_slope(revenue, di) FILTER (WHERE post), 4)"
        ).alias("slope_post"),
        # exact-cents segment means, unrounded (see oracle comment)
        F.expr(
            "CAST(SUM(rev_c) FILTER (WHERE NOT post) AS DOUBLE)"
            " / (100.0 * NULLIF(COUNT(rev_c) FILTER (WHERE NOT post), 0))"
        ).alias("mean_pre"),
        F.expr(
            "CAST(SUM(rev_c) FILTER (WHERE post) AS DOUBLE)"
            " / (100.0 * NULLIF(COUNT(rev_c) FILTER (WHERE post), 0))"
        ).alias("mean_post"),
        F.expr(
            "CAST(SUM(rev_c) FILTER (WHERE post) AS DOUBLE)"
            " / (100.0 * NULLIF(COUNT(rev_c) FILTER (WHERE post), 0))"
            " - CAST(SUM(rev_c) FILTER (WHERE NOT post) AS DOUBLE)"
            " / (100.0 * NULLIF(COUNT(rev_c) FILTER (WHERE NOT post), 0))"
        ).alias("level_shift"),
    )


@register(
    "stat_cohens_d",
    CAT_STAT,
    """
    WITH g AS (
      SELECT COUNT(*) FILTER (WHERE event_type = 'purchase') AS n1,
             COUNT(*) FILTER (WHERE event_type = 'view') AS n2,
             AVG(value) FILTER (WHERE event_type = 'purchase') AS m1,
             AVG(value) FILTER (WHERE event_type = 'view') AS m2,
             (SUM(value * value) FILTER (WHERE event_type = 'purchase')
              - COUNT(*) FILTER (WHERE event_type = 'purchase')
                * AVG(value) FILTER (WHERE event_type = 'purchase')
                * AVG(value) FILTER (WHERE event_type = 'purchase'))
               AS ss1,
             (SUM(value * value) FILTER (WHERE event_type = 'view')
              - COUNT(*) FILTER (WHERE event_type = 'view')
                * AVG(value) FILTER (WHERE event_type = 'view')
                * AVG(value) FILTER (WHERE event_type = 'view')) AS ss2
      FROM events WHERE value IS NOT NULL
    )
    SELECT CAST(n1 AS BIGINT) AS n_treat,
           CAST(n2 AS BIGINT) AS n_control,
           ROUND(m1 - m2, 4) AS mean_diff,
           ROUND(sqrt((ss1 + ss2) / (n1 + n2 - 2)), 4) AS sd_pooled,
           ROUND((m1 - m2) / sqrt((ss1 + ss2) / (n1 + n2 - 2)), 4)
             AS cohens_d,
           ROUND((m1 - m2) / sqrt((ss1 + ss2) / (n1 + n2 - 2))
                 * (1 - 3.0 / (4 * (n1 + n2 - 2) - 1)), 4) AS hedges_g
    FROM g
    """,
)
def stat_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effect size for the two-group comparison family: Cohen's d on the
    pooled SD, plus Hedges' g (the small-sample bias correction
    1 − 3/(4·df − 1)) — the magnitude number reported next to
    stat_ttest_welch's significance. Same two groups as the t test
    (purchase vs view values), complete-case like stat_spearman;
    within-group SS via the Σx² − n·x̄² identity, so everything comes
    from ONE conditional-aggregate pass.

    Scale shape: a single map-side-combinable aggregate to one moments
    row, then constant arithmetic."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    g = ev.agg(
        F.expr(
            "COUNT(*) FILTER (WHERE event_type = 'purchase')"
        ).alias("n1"),
        F.expr("COUNT(*) FILTER (WHERE event_type = 'view')").alias("n2"),
        F.expr(
            "AVG(value) FILTER (WHERE event_type = 'purchase')"
        ).alias("m1"),
        F.expr("AVG(value) FILTER (WHERE event_type = 'view')").alias("m2"),
        F.expr(
            "SUM(value * value) FILTER (WHERE event_type = 'purchase')"
            " - COUNT(*) FILTER (WHERE event_type = 'purchase')"
            " * AVG(value) FILTER (WHERE event_type = 'purchase')"
            " * AVG(value) FILTER (WHERE event_type = 'purchase')"
        ).alias("ss1"),
        F.expr(
            "SUM(value * value) FILTER (WHERE event_type = 'view')"
            " - COUNT(*) FILTER (WHERE event_type = 'view')"
            " * AVG(value) FILTER (WHERE event_type = 'view')"
            " * AVG(value) FILTER (WHERE event_type = 'view')"
        ).alias("ss2"),
    )
    sd = F.sqrt((F.col("ss1") + F.col("ss2")) / (F.col("n1") + F.col("n2") - 2))
    d = (F.col("m1") - F.col("m2")) / sd
    return g.select(
        F.col("n1").cast("bigint").alias("n_treat"),
        F.col("n2").cast("bigint").alias("n_control"),
        F.round(F.col("m1") - F.col("m2"), 4).alias("mean_diff"),
        F.round(sd, 4).alias("sd_pooled"),
        F.round(d, 4).alias("cohens_d"),
        F.round(
            d
            * (
                1
                - 3.0 / (4 * (F.col("n1") + F.col("n2") - 2) - 1)
            ),
            4,
        ).alias("hedges_g"),
    )


@register(
    "events_bounce_rate",
    CAT_EVENTS,
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL '30 minutes' THEN 1 ELSE 0 END
               AS new_session
      FROM events WHERE ts IS NOT NULL
    ),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts,
                                    event_id ROWS UNBOUNDED PRECEDING)
               AS session_id
      FROM gaps
    ),
    per_session AS (
      SELECT user_id, session_id,
             NULLIF(first(COALESCE(event_type, chr(1))
                          ORDER BY ts, event_id), chr(1)) AS entry_type,
             COUNT(*) AS n_events
      FROM sess GROUP BY user_id, session_id
    )
    SELECT entry_type,
           COUNT(*) AS n_sessions,
           CAST(COALESCE(SUM(CASE WHEN n_events = 1 THEN 1 END), 0)
                AS BIGINT) AS n_bounce,
           CAST(COALESCE(SUM(CASE WHEN n_events = 1 THEN 1 END), 0)
                * 10000 // COUNT(*) AS BIGINT) / 10000.0 AS bounce_rate
    FROM per_session GROUP BY entry_type
    """,
)
def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce-rate census: share of single-event sessions per session
    ENTRY event type — the engagement number sessionization exists to
    feed (a bounce-heavy entry type is a landing-page problem). Session
    boundaries are the batch_sessionize 30-minute-gap spelling
    (microsecond-exact compare); the entry event is the arg-min over
    the (ts, event_id) unique order, riding the chr(1) COALESCE
    sentinel because DuckDB's arg_min skips NULL-valued arguments where
    Spark's min_by returns them (the agg_first_last discipline); the
    rate is exact integer basis points.

    Scale shape: ONE shuffle on user_id serves the gap flag, the
    running session id, and the per-session rollup; the entry-type
    census is a second small aggregate on the session grain.

    NULL ts rows are dropped on BOTH engines: a NULL-ts event would
    sort to opposite ends of the (ts, event_id) session order across
    engines (Spark NULLS FIRST vs DuckDB NULLS LAST) and silently shift
    session boundaries and entry election — the ADVICE r7 seam; same
    discipline as events_dwell_transition."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "ts", "event_id", "event_type")
    )
    w = Window.partitionBy("user_id").orderBy("ts", F.col("event_id").asc_nulls_last())
    us = F.unix_micros(F.col("ts"))
    flagged = ev.withColumn(
        "new_session",
        F.when(us - F.lag(us).over(w) > 1800 * 1_000_000, 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    et = F.coalesce(F.col("event_type"), F.lit("\x01"))
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.nullif(
            F.min_by(et, F.struct("ts", "event_id")), F.lit("\x01")
        ).alias("entry_type"),
        F.count(F.lit(1)).alias("n_events"),
    )
    zero = F.lit(0)
    return per_session.groupBy("entry_type").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.coalesce(
            F.sum(F.when(F.col("n_events") == 1, 1)), zero
        ).alias("n_bounce"),
    ).withColumn(
        "bounce_rate",
        F.expr("CAST(n_bounce * 10000 DIV n_sessions AS BIGINT)") / 10000.0,
    )


_DATE_COLS = [
    ("orders", "o_orderdate", "1992-01-01", "1999-01-01"),
    ("lineitem", "l_shipdate", "1992-01-01", "1999-07-01"),
    ("events", "ts", "2023-01-01", "2027-01-01"),
]


def _date_census_sql(table: str, col: str, lo: str, hi: str) -> str:
    return f"""
      SELECT '{table}.{col}' AS date_col,
             COUNT(*) AS n_rows,
             CAST(COALESCE(SUM(CASE WHEN {col} IS NULL THEN 1 END), 0)
                  AS BIGINT) AS n_null,
             CAST(COALESCE(SUM(CASE WHEN {col} < TIMESTAMP '{lo} 00:00:00'
                                    THEN 1 END), 0) AS BIGINT)
               AS n_before_range,
             CAST(COALESCE(SUM(CASE WHEN {col} >= TIMESTAMP '{hi} 00:00:00'
                                    THEN 1 END), 0) AS BIGINT)
               AS n_after_range,
             strftime(MIN({col}), '%Y-%m-%d') AS min_day,
             strftime(MAX({col}), '%Y-%m-%d') AS max_day,
             CAST(COALESCE(SUM(CASE WHEN isodow({col}) >= 6 THEN 1 END),
                           0) * 10000
                  // NULLIF(COUNT({col}), 0) AS BIGINT) / 10000.0
               AS weekend_share
      FROM {table}"""


@register(
    "dq_date_sanity_census",
    CAT_DQ,
    " UNION ALL ".join(
        _date_census_sql(t, c, lo, hi) for t, c, lo, hi in _DATE_COLS
    ),
)
def dq_date_sanity_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal admission gate: per date column, NULL and
    out-of-plausible-range counts (epoch-misparse and clock-skew rows
    land here — the pre-epoch corruption class showed bucketing
    consumers diverge on them), observed min/max day, and the weekend
    share in exact basis points (a weekday-only business table with
    weekend rows is an ingest bug signature). Plausible ranges are per
    column: the TPC-H date window for the star, the corpus's own era
    for events.

    Scale shape: one map-side-combinable aggregate per table, 3-row
    output; isodow spelled as Spark weekday()+1 (stats3.py parity)."""
    frames = []
    for table, col, lo, hi in _DATE_COLS:
        t = load_table(spark, sf_dir, table)
        c = F.col(col)
        zero = F.lit(0)
        frames.append(
            t.agg(
                F.lit(f"{table}.{col}").alias("date_col"),
                F.count(F.lit(1)).alias("n_rows"),
                F.coalesce(F.sum(F.when(c.isNull(), 1)), zero).alias(
                    "n_null"
                ),
                F.coalesce(
                    F.sum(
                        F.when(c < F.lit(f"{lo} 00:00:00").cast("timestamp"), 1)
                    ),
                    zero,
                ).alias("n_before_range"),
                F.coalesce(
                    F.sum(
                        F.when(
                            c >= F.lit(f"{hi} 00:00:00").cast("timestamp"), 1
                        )
                    ),
                    zero,
                ).alias("n_after_range"),
                F.date_format(F.min(c), "yyyy-MM-dd").alias("min_day"),
                F.date_format(F.max(c), "yyyy-MM-dd").alias("max_day"),
                (
                    F.expr(
                        f"CAST(COALESCE(SUM(CASE WHEN weekday({col}) + 1 >= 6"
                        f" THEN 1 END), 0) * 10000"
                        f" DIV NULLIF(COUNT({col}), 0) AS BIGINT)"
                    )
                    / 10000.0
                ).alias("weekend_share"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
