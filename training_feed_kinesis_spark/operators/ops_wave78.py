"""Wave 78: time-series monitoring — volatility bands, intermittent
demand, seasonality decomposition, randomness testing.

  * ``ts_bollinger_breakout``: 7-day rolling mean ± 2σ bands over
    daily revenue with breakout flags — the band test is a pure
    integer-cents comparison ((n·x−S₁)²·(n−1) > 4n(n·S₂−S₁²)), so the
    flag can never flip on a float midpoint.
  * ``ts_croston``: Croston's method for INTERMITTENT demand (a sparse
    part's shipment series): separate exponential smoothing of demand
    sizes and inter-demand intervals, forecast = ẑ/q̂ — the estimator
    plain SES gets wrong on mostly-zero series. Sequential fold ≡
    RECURSIVE-CTE oracle (the ts_holt_linear harness), α = 0.5 exact
    in binary.
  * ``ts_seasonal_strength``: Hyndman-style seasonal/trend strength
    (1 − var(remainder)/var(component)) from a centered-MA STL-lite
    decomposition of the daily series.
  * ``ts_turning_points``: turning-point randomness test — observed
    local extrema vs the E[T] = 2(n−2)/3, Var = (16n−29)/90 null; the
    cheapest "is this series actually random noise" gate.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table, sane_ts, sane_ts_sql

CAT_TS = "2.L time-series analytics"

ALPHA = 0.5  # Croston smoothing — exact binary fraction

# NULL ts dropped on both engines (the r8 NULL-time seam): a NULL day
# group would sort to opposite ends of every ORDER BY day window built
# on this substrate across engines
# day-grain revenue substrate: gated on the temporal admission contract
# (tables.sane_ts, r12) — its consumers run day-ordered rolling windows
# where a sentinel-dated phantom day corrupts every 7-day frame it enters
# (and its raw day stamp is uncollectable)
_DAILY_CENTS_SQL = f"""
    daily AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM events WHERE ts IS NOT NULL AND {sane_ts_sql('ts')} GROUP BY 1
    )
"""


def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & sane_ts("ts")
    )
    return ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")).cast("long").alias("rev_cents")
    )


@register(
    "ts_bollinger_breakout",
    CAT_TS,
    f"""
    WITH {_DAILY_CENTS_SQL},
    win AS (
      -- s2 accumulates squares in HUGEINT from the first multiply: at larger
      -- scale factors rev_cents² alone exceeds BIGINT (rev_cents > ~3e9)
      SELECT day, rev_cents,
             COUNT(*) OVER w AS n,
             SUM(rev_cents) OVER w AS s1,
             SUM(CAST(rev_cents AS HUGEINT) * rev_cents) OVER w AS s2
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT day, rev_cents,
           CAST((2 * s1 + n) // (2 * n) AS BIGINT) AS mean7_cents,
           (7 * rev_cents - s1) > 0
             AND CAST(7 * rev_cents - s1 AS HUGEINT) * (7 * rev_cents - s1)
                 * 6 > 4 * 7 * (7 * s2 - CAST(s1 AS HUGEINT) * s1) AS breakout_hi,
           (7 * rev_cents - s1) < 0
             AND CAST(7 * rev_cents - s1 AS HUGEINT) * (7 * rev_cents - s1)
                 * 6 > 4 * 7 * (7 * s2 - CAST(s1 AS HUGEINT) * s1) AS breakout_lo
    FROM win WHERE n = 7
    """,
)
def ts_bollinger_breakout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over daily revenue: 7-day trailing mean ± 2
    sample standard deviations, with breakout flags. The band test
    |x − S₁/n| > 2σ is cross-multiplied to (n·x − S₁)²(n−1) >
    4n(n·S₂ − S₁²) — every operand an exact integer in cents — so the
    breakout decision is engine-exact even when a day sits ON the
    band (the place a float sqrt would waver). Mean is emitted with
    integer half-up rounding; only full 7-day windows report.

    Scale shape: one day-grain aggregate, then a bounded trailing
    window — partitionable by series key when monitoring many streams.

    Overflow asymmetry (ADVICE r5): past the ~1e38 cap the engines fail
    DIFFERENTLY — Spark's DECIMAL(38,0) arithmetic silently returns NULL
    (allowPrecisionLoss default) making both breakout flags NULL/false,
    while DuckDB's HUGEINT multiply hard-errors. Within the documented
    bound (daily cents < ~1e18, i.e. daily revenue < ten quadrillion
    dollars) both are exact; a pipeline ingesting unvalidated magnitudes
    should put a dq bound on rev_cents upstream rather than widen here."""
    daily = _daily_cents(spark, sf_dir)
    w = Window.orderBy("day").rowsBetween(-6, 0)
    dec = "decimal(38,0)"
    win = daily.select(
        "day",
        "rev_cents",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("rev_cents").over(w).alias("s1"),
        # squares accumulate in DECIMAL(38,0) from the first multiply —
        # rev_cents² alone exceeds BIGINT once daily cents pass ~3e9, so
        # the widening must happen BEFORE the product, mirroring the
        # oracle's HUGEINT cast
        F.sum(F.col("rev_cents").cast(dec) * F.col("rev_cents")).over(w).alias("s2"),
    ).filter(F.col("n") == 7)
    dev = 7 * F.col("rev_cents") - F.col("s1")
    # the whole cross-multiplied band test runs in DECIMAL(38,0): exact to
    # 38 digits, so it holds at any scale factor where daily cents stay
    # under ~1e18 (the (7x−S₁)²·6 term caps near 1e38), not just the test
    # sfs — same-width exactness as the oracle's HUGEINT
    dev_d = dev.cast(dec)
    s1_d = F.col("s1").cast(dec)
    sq_gt = (dev_d * dev_d) * 6 > 4 * 7 * (7 * F.col("s2") - s1_d * s1_d)
    return win.select(
        "day",
        "rev_cents",
        F.expr("CAST((2 * s1 + n) DIV (2 * n) AS BIGINT)").alias("mean7_cents"),
        ((dev > 0) & sq_gt).alias("breakout_hi"),
        ((dev < 0) & sq_gt).alias("breakout_lo"),
    )


@register(
    "ts_croston",
    CAT_TS,
    f"""
    WITH RECURSIVE pk AS (
      SELECT MIN(l_partkey) AS k FROM lineitem
    ),
    demand AS (
      SELECT ROW_NUMBER() OVER (ORDER BY d) AS i,
             CAST(d - DATE '1995-01-01' AS DOUBLE) AS di, z
      FROM (
        SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS d,
               SUM(l_quantity) AS z
        FROM lineitem WHERE l_partkey = (SELECT k FROM pk)
        GROUP BY 1)
    ),
    gapped AS (
      SELECT i, z, di - LAG(di) OVER (ORDER BY i) AS q FROM demand
    ),
    cr(i, zhat, qhat) AS (
      SELECT 1::BIGINT, (SELECT z FROM gapped WHERE i = 1),
             CAST(1.0 AS DOUBLE)
      UNION ALL
      SELECT g.i,
             {ALPHA} * g.z + (1 - {ALPHA}) * c.zhat,
             {ALPHA} * g.q + (1 - {ALPHA}) * c.qhat
      FROM cr c JOIN gapped g ON g.i = c.i + 1
    )
    SELECT (SELECT MAX(i) FROM demand)::BIGINT AS n_demands,
           ROUND(zhat, 4) AS zhat,
           ROUND(qhat, 4) AS qhat,
           ROUND(zhat / qhat, 4) AS demand_per_day
    FROM cr WHERE i = (SELECT MAX(i) FROM demand)
    """,
)
def ts_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method on an intermittent series (the lowest-keyed
    part's daily shipped quantity — a handful of demand days across
    seven years): demand size ẑ and inter-demand interval q̂ are
    smoothed SEPARATELY (α = 0.5), forecast rate = ẑ/q̂ per day.
    Plain exponential smoothing decays toward zero between demands
    and spikes on each one; Croston's split estimator is the standard
    fix for spare-parts/long-tail forecasting. Sequential by nature:
    Spark folds the (z, q) sequence row-locally (ts_holt_linear's
    harness); the oracle unrolls the identical IEEE steps through a
    RECURSIVE CTE — bit-identical before the ROUND.

    Scale shape: the fact-sized work is one filtered day aggregate;
    the fold runs over the demand-day array on a single row — and
    parallelizes per part when run for the whole catalog."""
    li = load_table(spark, sf_dir, "lineitem")
    pk = li.agg(F.min("l_partkey").alias("k"))
    demand = (
        li.join(F.broadcast(pk), F.col("l_partkey") == F.col("k"))
        .groupBy(F.date_trunc("day", "l_shipdate").alias("d"))
        .agg(F.sum("l_quantity").alias("z"))
        .select(
            F.datediff(F.col("d"), F.lit("1995-01-01"))
            .cast("double")
            .alias("di"),
            "z",
        )
    )
    series = demand.agg(
        F.array_sort(F.collect_list(F.struct("di", "z"))).alias("pts")
    )
    fold = F.expr(
        f"""aggregate(
              transform(sequence(2, size(pts)),
                        j -> named_struct(
                          'z', pts[j - 1].z,
                          'q', pts[j - 1].di - pts[j - 2].di)),
              named_struct('zhat', pts[0].z, 'qhat', CAST(1.0 AS DOUBLE)),
              (acc, g) -> named_struct(
                'zhat', {ALPHA} * g.z + (1 - {ALPHA}) * acc.zhat,
                'qhat', {ALPHA} * g.q + (1 - {ALPHA}) * acc.qhat))"""
    )
    return series.select(
        F.size("pts").cast("long").alias("n_demands"), fold.alias("c")
    ).select(
        "n_demands",
        F.round(F.col("c.zhat"), 4).alias("zhat"),
        F.round(F.col("c.qhat"), 4).alias("qhat"),
        F.round(F.col("c.zhat") / F.col("c.qhat"), 4).alias("demand_per_day"),
    )


@register(
    "ts_seasonal_strength",
    CAT_TS,
    f"""
    WITH {_DAILY_CENTS_SQL},
    idx AS (
      SELECT ROW_NUMBER() OVER (ORDER BY day) AS i,
             CAST(rev_cents AS DOUBLE) / 100 AS x
      FROM daily
    ),
    trended AS (
      SELECT i, x,
             AVG(x) OVER (ORDER BY i ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS trend,
             COUNT(*) OVER (ORDER BY i ROWS BETWEEN 3 PRECEDING
                            AND 3 FOLLOWING) AS wn,
             CAST((i - 1) % 7 AS BIGINT) AS dow
      FROM idx
    ),
    center AS (
      SELECT i, x, trend, dow, x - trend AS detr
      FROM trended WHERE wn = 7
    ),
    seas AS (SELECT dow, AVG(detr) AS s FROM center GROUP BY dow),
    parts AS (
      SELECT c.x, c.trend, c.detr, s.s,
             c.detr - s.s AS resid, c.x - s.s AS deseas
      FROM center c JOIN seas s ON s.dow = c.dow
    )
    SELECT COUNT(*)::BIGINT AS n_center,
           ROUND(GREATEST(0, 1 - VAR_SAMP(resid) / VAR_SAMP(detr)), 4)
             AS seasonal_strength,
           ROUND(GREATEST(0, 1 - VAR_SAMP(resid) / VAR_SAMP(deseas)), 4)
             AS trend_strength
    FROM parts
    """,
)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyndman-style decomposition strengths over daily revenue: a
    7-day centered moving average estimates trend; day-of-week means of
    the detrended series estimate seasonality; the strengths
    1 − var(remainder)/var(detrended) and 1 − var(remainder)/var(x −
    seasonal) say how much structure each component explains (≈0 ⇒
    none; ≥0.6 ⇒ model it). The one-number answer to "does this series
    deserve a seasonal model" before fitting one (the diagnostic
    upstream of ts_holt_winters / ts_seasonal_dow).

    Scale shape: day-grain aggregate → bounded centered window → a
    7-row seasonal table joined back — all domain-sized after the
    first aggregate."""
    daily = _daily_cents(spark, sf_dir)
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("i"),
        (F.col("rev_cents").cast("double") / 100).alias("x"),
    )
    wc = Window.orderBy("i").rowsBetween(-3, 3)
    trended = idx.select(
        "i",
        "x",
        F.avg("x").over(wc).alias("trend"),
        F.count(F.lit(1)).over(wc).alias("wn"),
        ((F.col("i") - 1) % 7).cast("long").alias("dow"),
    )
    center = trended.filter(F.col("wn") == 7).withColumn(
        "detr", F.col("x") - F.col("trend")
    )
    seas = center.groupBy("dow").agg(F.avg("detr").alias("s"))
    parts = center.join(F.broadcast(seas), "dow").select(
        "x",
        "detr",
        (F.col("detr") - F.col("s")).alias("resid"),
        (F.col("x") - F.col("s")).alias("deseas"),
    )
    return parts.agg(
        F.count(F.lit(1)).alias("n_center"),
        F.round(
            F.greatest(
                F.lit(0.0),
                1 - F.var_samp("resid") / F.var_samp("detr"),
            ),
            4,
        ).alias("seasonal_strength"),
        F.round(
            F.greatest(
                F.lit(0.0),
                1 - F.var_samp("resid") / F.var_samp("deseas"),
            ),
            4,
        ).alias("trend_strength"),
    )


@register(
    "ts_turning_points",
    CAT_TS,
    f"""
    WITH {_DAILY_CENTS_SQL},
    lagged AS (
      SELECT rev_cents,
             LAG(rev_cents) OVER (ORDER BY day) AS prev,
             LEAD(rev_cents) OVER (ORDER BY day) AS nxt
      FROM daily
    ),
    tp AS (
      SELECT COUNT(*)::BIGINT AS n_interior,
             SUM(CASE WHEN (rev_cents > prev AND rev_cents > nxt)
                        OR (rev_cents < prev AND rev_cents < nxt)
                      THEN 1 ELSE 0 END)::BIGINT AS turns
      FROM lagged WHERE prev IS NOT NULL AND nxt IS NOT NULL
    ),
    nn AS (SELECT COUNT(*)::BIGINT AS n FROM daily)
    -- n >= 2 guard: Var[T] = (16n-29)/90 goes negative below n=2 —
    -- DuckDB errors on sqrt(negative) where Spark yields NaN (r9
    -- empty-table sweep); the test is undefined on a shorter series
    SELECT t.turns, t.n_interior,
           ROUND(2.0 * (n.n - 2) / 3, 4) AS expected,
           ROUND((t.turns - 2.0 * (n.n - 2) / 3)
                 / sqrt((16.0 * n.n - 29) / 90), 4) AS z_score
    FROM tp t CROSS JOIN nn n
    WHERE n.n >= 2
    """,
)
def ts_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-point test for serial randomness: count interior local
    extrema of the daily revenue series (exact integer-cents
    comparisons) against the i.i.d. null E[T] = 2(n−2)/3,
    Var[T] = (16n−29)/90. |z| ≫ 0 low means the series is smoother
    than noise (trend/seasonality present), high means oscillation
    (negative autocorrelation — often a sign of alternating batch
    effects). The zero-cost sanity gate before any forecasting model.

    Scale shape: one day-grain aggregate, one lag/lead window over the
    domain-sized series."""
    daily = _daily_cents(spark, sf_dir)
    w = Window.orderBy("day")
    lagged = daily.select(
        "rev_cents",
        F.lag("rev_cents").over(w).alias("prev"),
        F.lead("rev_cents").over(w).alias("nxt"),
    )
    tp = lagged.filter(
        F.col("prev").isNotNull() & F.col("nxt").isNotNull()
    ).agg(
        F.count(F.lit(1)).alias("n_interior"),
        F.sum(
            F.when(
                ((F.col("rev_cents") > F.col("prev"))
                 & (F.col("rev_cents") > F.col("nxt")))
                | ((F.col("rev_cents") < F.col("prev"))
                   & (F.col("rev_cents") < F.col("nxt"))),
                1,
            ).otherwise(0)
        ).alias("turns"),
    )
    nn = daily.agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") >= 2)
    return tp.crossJoin(F.broadcast(nn)).select(
        "turns",
        "n_interior",
        F.round(2.0 * (F.col("n") - 2) / 3, 4).alias("expected"),
        F.round(
            (F.col("turns") - 2.0 * (F.col("n") - 2) / 3)
            / F.sqrt((16.0 * F.col("n") - 29) / 90),
            4,
        ).alias("z_score"),
    )
