"""Wave 73: classical inference over the feed — Welch's t, exact-integer
Spearman, Kendall's tau-b, Theil–Sen robust trend.

Completes the two-sample / correlation / robust-regression corner of the
stats family (beside mann_whitney, anova_oneway, ks_2sample, chi2):

  * ``stat_welch_ttest``: unequal-variance two-sample t with the
    Welch–Satterthwaite df — pure moment arithmetic, one aggregate.
  * ``stat_spearman``: rank correlation on CENTERED DOUBLED midranks —
    every intermediate is an exact BIGINT (2·midrank and its centering
    are integers even under ties), so both engines produce bit-identical
    moments; the only float op is the final ratio.
  * ``stat_kendall_tau``: tau-b with tie corrections from an explicit
    concordant/discordant census over the domain-sized daily series
    (C(30,2) pairs — bounded, never data-sized).
  * ``stat_theil_sen``: median of pairwise slopes over the daily revenue
    series (integer cents / integer day gaps — slopes are exact-input
    doubles), the estimator that shrugs off outlier days.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._json_compat import duck_json_int, spark_json_int
from ..tables import load_table

CAT_STAT = "2.L statistics"


@register(
    "stat_welch_ttest",
    CAT_STAT,
    """
    WITH g AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 'a' ELSE 'b' END AS grp,
             value AS x
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    m AS (
      SELECT grp, COUNT(*)::DOUBLE AS n, AVG(x) AS mean, VAR_SAMP(x) AS v
      FROM g GROUP BY grp
    ),
    w AS (
      SELECT MAX(CASE WHEN grp = 'a' THEN n END) AS na,
             MAX(CASE WHEN grp = 'b' THEN n END) AS nb,
             MAX(CASE WHEN grp = 'a' THEN mean END) AS ma,
             MAX(CASE WHEN grp = 'b' THEN mean END) AS mb,
             MAX(CASE WHEN grp = 'a' THEN v END) AS va,
             MAX(CASE WHEN grp = 'b' THEN v END) AS vb
      FROM m
    )
    SELECT CAST(na AS BIGINT) AS n_purchase, CAST(nb AS BIGINT) AS n_click,
           ROUND(ma - mb, 4) AS mean_diff,
           ROUND((ma - mb) / sqrt(va / na + vb / nb), 4) AS t_stat,
           ROUND(pow(va / na + vb / nb, 2)
                 / (pow(va / na, 2) / (na - 1) + pow(vb / nb, 2) / (nb - 1)),
                 4) AS df_welch
    FROM w
    """,
)
def stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test (purchase vs click
    event values): t = (m_a−m_b)/√(v_a/n_a+v_b/n_b) with the
    Welch–Satterthwaite effective df. Unlike the pooled Student t, this
    stays valid when the groups' variances differ — the default
    two-sample test a metrics platform should reach for.

    Scale shape: one map-combinable moment aggregate over the filtered
    scan, folded to a single row — no second pass, no sort."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        F.when(F.col("event_type") == "purchase", "a").otherwise("b").alias("grp"),
        F.col("value").alias("x"),
    )
    m = g.groupBy("grp").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("x").alias("mean"),
        F.var_samp("x").alias("v"),
    )
    pick = lambda grp, c: F.max(F.when(F.col("grp") == grp, F.col(c)))  # noqa: E731
    w = m.agg(
        pick("a", "n").alias("na"), pick("b", "n").alias("nb"),
        pick("a", "mean").alias("ma"), pick("b", "mean").alias("mb"),
        pick("a", "v").alias("va"), pick("b", "v").alias("vb"),
    )
    se2 = F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    return w.select(
        F.col("na").cast("long").alias("n_purchase"),
        F.col("nb").cast("long").alias("n_click"),
        F.round(F.col("ma") - F.col("mb"), 4).alias("mean_diff"),
        F.round((F.col("ma") - F.col("mb")) / F.sqrt(se2), 4).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("va") / F.col("na"), 2) / (F.col("na") - 1)
                + F.pow(F.col("vb") / F.col("nb"), 2) / (F.col("nb") - 1)
            ),
            4,
        ).alias("df_welch"),
    )


@register(
    "stat_spearman",
    CAT_STAT,
    f"""
    WITH base AS (
      SELECT value AS x, {duck_json_int("props", "$.k", "BIGINT")} AS y
      FROM events
    ),
    nn AS (
      -- NULL ranks diverge across engines (Spark windows sort NULLS FIRST,
      -- DuckDB NULLS LAST): a missing/non-numeric props.k must be excluded,
      -- not ranked. Complete-case analysis is also the statistically
      -- standard Spearman treatment.
      SELECT x, y FROM base WHERE x IS NOT NULL AND y IS NOT NULL
    ),
    ranked AS (
      SELECT
        -- centered doubled midrank: 2*midrank - (n+1); exact BIGINT under ties
        CAST(2 * RANK() OVER (ORDER BY x) + COUNT(*) OVER (PARTITION BY x)
             - 1 - (COUNT(*) OVER () + 1) AS BIGINT) AS cx,
        CAST(2 * RANK() OVER (ORDER BY y) + COUNT(*) OVER (PARTITION BY y)
             - 1 - (COUNT(*) OVER () + 1) AS BIGINT) AS cy
      FROM nn
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(cx * cy) AS DOUBLE)
                 / sqrt(CAST(SUM(cx * cx) AS DOUBLE)
                        * CAST(SUM(cy * cy) AS DOUBLE)), 4) AS rho
    FROM ranked
    """,
)
def stat_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between event value and the props.k
    payload field, complete-case (rows with a missing or non-numeric
    props.k are excluded BEFORE ranking — ranking NULLs would diverge
    across engines: Spark windows sort NULLS FIRST, DuckDB NULLS LAST),
    tie-correct via midranks — spelled so that EVERY
    intermediate is an exact integer: the doubled midrank
    2·rank + tiecount − 1 is a BIGINT even for .5 midranks, centering by
    (n+1) keeps it integral with exact zero mean, and the three moment
    sums (Σc_xc_y, Σc_x², Σc_y²) accumulate in BIGINT (bounded by n³ —
    safe to ~2M rows; beyond that, pre-aggregate or widen to DECIMAL).
    The only floating-point operation is the final ratio of two exact
    integers — bit-identical on any engine, partition count, or order.

    Scale shape: global ranking is the one genuinely serial step — at
    100 TB it becomes a range-partitioned sort (Spark already plans
    window-without-partition as a single-partition sort; shard by a
    stratum key and aggregate per stratum when n forbids that)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.col("value").alias("x"),
        spark_json_int("props", "$.k", "long").alias("y"),
    ).where(F.col("x").isNotNull() & F.col("y").isNotNull())
    n_all = Window.partitionBy()
    cx = (
        2 * F.rank().over(Window.orderBy("x"))
        + F.count(F.lit(1)).over(Window.partitionBy("x"))
        - 1
        - (F.count(F.lit(1)).over(n_all) + 1)
    ).cast("long")
    cy = (
        2 * F.rank().over(Window.orderBy("y"))
        + F.count(F.lit(1)).over(Window.partitionBy("y"))
        - 1
        - (F.count(F.lit(1)).over(n_all) + 1)
    ).cast("long")
    ranked = base.select(cx.alias("cx"), cy.alias("cy"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("cx") * F.col("cy")).cast("double")
            / F.sqrt(
                F.sum(F.col("cx") * F.col("cx")).cast("double")
                * F.sum(F.col("cy") * F.col("cy")).cast("double")
            ),
            4,
        ).alias("rho"),
    )


@register(
    "stat_kendall_tau",
    CAT_STAT,
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents,
             COUNT(*)::BIGINT AS n_events
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    pairs AS (
      SELECT CASE WHEN (a.rev_cents - b.rev_cents) * (a.n_events - b.n_events) > 0
                  THEN 1 ELSE 0 END AS conc,
             CASE WHEN (a.rev_cents - b.rev_cents) * (a.n_events - b.n_events) < 0
                  THEN 1 ELSE 0 END AS disc,
             CASE WHEN a.rev_cents = b.rev_cents THEN 1 ELSE 0 END AS tie_x,
             CASE WHEN a.n_events = b.n_events THEN 1 ELSE 0 END AS tie_y
      FROM daily a JOIN daily b ON a.day < b.day
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(conc) AS BIGINT) AS concordant,
           CAST(SUM(disc) AS BIGINT) AS discordant,
           ROUND((SUM(conc) - SUM(disc))
                 / sqrt(CAST((COUNT(*) - SUM(tie_x))
                             * (COUNT(*) - SUM(tie_y)) AS DOUBLE)), 4)
             AS tau_b
    FROM pairs
    """,
)
def stat_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between daily revenue and daily event volume,
    tie-corrected: tau_b = (C−D)/√((n₀−n_x)(n₀−n_y)) from an explicit
    concordant/discordant pair census. The pair join is over the DAILY
    series — C(30,2) = 435 pairs regardless of raw data size — so the
    quadratic step is domain-bounded, the pattern every pairwise rank
    statistic must follow at scale (aggregate to the analysis grain
    FIRST, then go quadratic on the tiny frame).

    Revenue is compared in integer cents, so concordance tests are
    exact integer sign checks on both engines."""
    # NULL ts dropped on both engines (the r8 NULL-time seam)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")).cast("long").alias("rev_cents"),
        F.count(F.lit(1)).alias("n_events"),
    )
    a, b = daily.alias("a"), daily.alias("b")
    sgn = (F.col("a.rev_cents") - F.col("b.rev_cents")) * (
        F.col("a.n_events") - F.col("b.n_events")
    )
    pairs = a.join(b, F.col("a.day") < F.col("b.day")).select(
        F.when(sgn > 0, 1).otherwise(0).alias("conc"),
        F.when(sgn < 0, 1).otherwise(0).alias("disc"),
        F.when(F.col("a.rev_cents") == F.col("b.rev_cents"), 1)
        .otherwise(0)
        .alias("tie_x"),
        F.when(F.col("a.n_events") == F.col("b.n_events"), 1)
        .otherwise(0)
        .alias("tie_y"),
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("conc").alias("concordant"),
        F.sum("disc").alias("discordant"),
        F.round(
            (F.sum("conc") - F.sum("disc"))
            / F.sqrt(
                (
                    (F.count(F.lit(1)) - F.sum("tie_x"))
                    * (F.count(F.lit(1)) - F.sum("tie_y"))
                ).cast("double")
            ),
            4,
        ).alias("tau_b"),
    )


@register(
    "stat_theil_sen",
    CAT_STAT,
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) - DATE '2024-01-01' AS d,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    slopes AS (
      SELECT CAST(b.rev_cents - a.rev_cents AS DOUBLE)
             / CAST(b.d - a.d AS DOUBLE) AS slope
      FROM daily a JOIN daily b ON a.d < b.d
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(quantile_cont(slope, 0.5) / 100, 4) AS sen_slope_per_day
    FROM slopes
    """,
)
def stat_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of daily revenue: the median of all
    pairwise slopes (Δrevenue/Δday). Up to ~29% of days can be corrupt
    (outages, backfills, bot floods) without moving the estimate — the
    trend line to fit BEFORE trusting least squares on ops data.

    Every slope is a ratio of exact integers (revenue cents, day gaps),
    so both engines interpolate the median over identical doubles.
    Scale shape: same grain discipline as stat_kendall_tau — quadratic
    only on the 30-row daily aggregate (435 slopes), reported in
    currency units per day."""
    # NULL ts dropped on both engines (the r8 NULL-time seam)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        F.datediff(F.date_trunc("day", "ts"), F.lit("2024-01-01")).alias("d")
    ).agg(
        F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")).cast("long").alias("rev_cents")
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(b, F.col("a.d") < F.col("b.d")).select(
        (
            (F.col("b.rev_cents") - F.col("a.rev_cents")).cast("double")
            / (F.col("b.d") - F.col("a.d")).cast("double")
        ).alias("slope")
    )
    return slopes.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.expr("percentile(slope, 0.5)") / 100, 4).alias(
            "sen_slope_per_day"
        ),
    )
