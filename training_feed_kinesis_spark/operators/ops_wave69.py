"""Wave 69: Hodges-Lehmann robust location, SAX symbolic similarity.

  * ``stat_hodges_lehmann``: the median-of-Walsh-averages location
    estimator on the daily value series — robust to outlier days where
    the mean is not, exact via integer pair sums.
  * ``ts_sax_similarity``: SAX symbolization (z-normalize, Gaussian
    breakpoints, 4-letter alphabet) of each event type's daily series
    and the pairwise symbol-agreement matrix — the cheap "which metrics
    move together" screen before any correlation math.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_STAT = "2.L statistics"
CAT_TS = "2.L time-series analytics"


@register(
    "stat_hodges_lehmann",
    CAT_STAT,
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    walsh AS (
      SELECT a.v + b.v AS s
      FROM daily a JOIN daily b ON a.d <= b.d
    )
    -- unrounded emission (r11 projected-magnitude lint, 5.3.9a): every
    -- statistic here is a quotient of exact integers (cents medians
    -- interpolate to exact halves), so both engines hold the identical
    -- double at any magnitude; daily revenue is a grower
    SELECT (SELECT COUNT(*) FROM daily)::BIGINT AS n_days,
           COUNT(*)::BIGINT AS n_walsh,
           percentile_cont(0.5) WITHIN GROUP (ORDER BY s) / 200.0
             AS hl_estimate,
           (SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY v)
            FROM daily) / 100.0 AS plain_median,
           (SELECT CAST(SUM(v) AS DOUBLE) / (100.0 * COUNT(v)) FROM daily)
             AS mean
    FROM walsh
    """,
)
def stat_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann location estimate of daily revenue: the median of
    all Walsh averages (pairwise means, i ≤ j) — the estimator behind
    the Wilcoxon test, ~30% more efficient than the plain median at the
    Gaussian yet still 29%-breakdown robust (one crazy day cannot drag
    it the way it drags the mean). Pair SUMS stay exact BIGINTs of
    cents; the single division by 2 happens after the median, so the
    only float is the final report.

    Scale shape: the pair set is over the DAY-grain series (n(n+1)/2 of
    #days, not of rows) — the O(n²) lives entirely in the domain-sized
    aggregate, the fact scan is one daily rollup."""
    # NULL ts dropped on both engines (the r8 NULL-time seam)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")).cast("bigint").alias("v")
    ).localCheckpoint()
    a = daily.select(F.col("d").alias("da"), F.col("v").alias("va"))
    b = daily.select(F.col("d").alias("db"), F.col("v").alias("vb"))
    walsh = a.join(b, F.col("da") <= F.col("db")).select(
        (F.col("va") + F.col("vb")).alias("s")
    )
    n_days = daily.count()
    # unrounded: exact-integer quotients both engines (r11 lint, 5.3.9a);
    # the mean is one division of the exact cents SUM, never AVG(double)
    scalars = daily.agg(
        F.expr("percentile(v, 0.5)").alias("med_v"),
        (F.sum("v").cast("double") / (100.0 * F.count("v"))).alias("mean"),
    )
    return (
        walsh.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_walsh"),
            (F.expr("percentile(s, 0.5)") / 200.0).alias("hl_estimate"),
        )
        .crossJoin(F.broadcast(scalars))
        .select(
            F.lit(n_days).cast("bigint").alias("n_days"),
            "n_walsh",
            "hl_estimate",
            (F.col("med_v") / 100.0).alias("plain_median"),
            "mean",
        )
    )


# Gaussian quartile breakpoints for a 4-symbol SAX alphabet
_BP = (-0.6745, 0.0, 0.6745)


@register(
    "ts_sax_similarity",
    CAT_TS,
    f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             COUNT(*)::DOUBLE AS v
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    norm AS (
      SELECT d.event_type, d.d,
             (d.v - s.mu) / s.sd AS z
      FROM daily d JOIN (
        SELECT event_type, AVG(v) AS mu,
               sqrt(SUM(v * v) / COUNT(*) - AVG(v) * AVG(v)) AS sd
        FROM daily GROUP BY event_type
      ) s ON s.event_type = d.event_type
    ),
    sym AS (
      SELECT event_type, d,
             CASE WHEN z < {_BP[0]} THEN 'a'
                  WHEN z < {_BP[1]} THEN 'b'
                  WHEN z < {_BP[2]} THEN 'c'
                  ELSE 'd' END AS s
      FROM norm
    ),
    strings AS (
      SELECT event_type, string_agg(s, '' ORDER BY d) AS sax,
             COUNT(*)::BIGINT AS n_days
      FROM sym GROUP BY event_type
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           a.n_days,
           CAST(list_sum(list_transform(range(1, CAST(a.n_days AS INT) + 1),
             i -> CASE WHEN substr(a.sax, i, 1) = substr(b.sax, i, 1)
                       THEN 1 ELSE 0 END)) AS BIGINT) AS n_agree
    FROM strings a JOIN strings b ON a.event_type < b.event_type
    """,
)
def ts_sax_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX (Symbolic Aggregate approXimation) series comparison: each
    event type's daily count series is z-normalized and quantized to a
    4-letter alphabet at the Gaussian quartile breakpoints; series
    similarity is then positionwise symbol agreement — the O(length)
    screen for "which metrics move together" that needs no covariance
    math and is robust to scale differences between series. Both
    engines evaluate the identical z and breakpoint comparisons (same
    population-σ spelling), so the symbol strings match exactly.

    Scale shape: one (type × day) aggregate, per-type moments, map-side
    symbolization, and a type×type comparison over 30-char strings —
    the pairwise part is domain-sized (5×5), never data-sized."""
    # NULL ts dropped on both engines (the r8 NULL-time seam)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("v"))
    stats = daily.groupBy("event_type").agg(
        F.avg("v").alias("mu"),
        F.sqrt(
            F.sum(F.col("v") * F.col("v")) / F.count(F.lit(1))
            - F.avg("v") * F.avg("v")
        ).alias("sd"),
    )
    norm = daily.join(F.broadcast(stats), "event_type").select(
        "event_type", "d", ((F.col("v") - F.col("mu")) / F.col("sd")).alias("z")
    )
    sym = norm.select(
        "event_type",
        "d",
        F.when(F.col("z") < _BP[0], "a")
        .when(F.col("z") < _BP[1], "b")
        .when(F.col("z") < _BP[2], "c")
        .otherwise("d")
        .alias("s"),
    )
    strings = sym.groupBy("event_type").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "s"))), lambda r: r.s
            ),
            "",
        ).alias("sax"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    a = strings.select(
        F.col("event_type").alias("type_a"),
        F.col("sax").alias("sax_a"),
        "n_days",
    )
    b = strings.select(
        F.col("event_type").alias("type_b"), F.col("sax").alias("sax_b")
    )
    agree = F.expr(
        "aggregate(zip_with(split(sax_a, ''), split(sax_b, ''),"
        " (x, y) -> IF(x = y AND x != '', 1, 0)), 0, (acc, v) -> acc + v)"
    )
    return (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            "n_days",
            agree.cast("bigint").alias("n_agree"),
        )
    )
