"""Second statistics wave: independence testing, Benford audit, streak
analysis, robust outliers, weighted median, centroid geometry.

  * ``stat_chi2_independence``: chi-squared statistic for event_type ×
    day-of-week — is traffic mix time-of-week dependent?
  * ``dq_benford``: first-significant-digit distribution of order totals vs
    Benford's law — the classic synthetic-data / fraud audit.
  * ``ts_gap_islands``: per-user consecutive-active-day streaks via the
    row_number-offset (gaps-and-islands) idiom; streak-length distribution.
  * ``events_anomaly_mad``: robust outlier counts per event type using
    median absolute deviation (1.4826·MAD ≈ σ), immune to the outliers it
    hunts — unlike z-scores.
  * ``agg_weighted_median``: price-weighted median quantity per return flag
    with exact integer-cents weights (float cumsum order can flip the
    boundary row cross-engine; integer weights cannot).
  * ``vec_label_centroid_sim``: pairwise cosine similarity between label
    centroids of the embedding corpus — the coarse-codebook geometry check
    behind IVF routing (see llm_sim_ivf).

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md §0.1);
capability surface reconstructed per SURVEY.md §2 and BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table

CAT_QM = "2.L quality & mining"
CAT_TS = "2.L time-series analytics"
CAT_AGG = "2.D aggregations"
CAT_SIM = "2.J llm-pipeline (similarity)"


@register(
    "stat_chi2_independence",
    CAT_QM,
    """
    WITH c AS (
      SELECT event_type AS et, dayofweek(ts) AS dw, COUNT(*)::BIGINT AS n
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT n,
             SUM(n) OVER (PARTITION BY et)::BIGINT AS rt,
             SUM(n) OVER (PARTITION BY dw)::BIGINT AS ct,
             SUM(n) OVER ()::BIGINT AS tot,
             et, dw
      FROM c
    )
    SELECT ROUND(SUM(POWER(n - rt::DOUBLE * ct / tot, 2)
                     / (rt::DOUBLE * ct / tot)), 4) AS chi2,
           ((COUNT(DISTINCT et) - 1) * (COUNT(DISTINCT dw) - 1))::BIGINT AS dof,
           MAX(tot) AS n_events
    FROM m
    """,
)
def stat_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence statistic for the event_type × day-of-week
    contingency table: cell counts once, margins via three window sums over
    the tiny cell grid, then Σ (O−E)²/E. Day-of-week encodings differ
    across engines (Spark 1=Sun, DuckDB 0=Sun) but only partition identity
    matters, so the statistic is encoding-invariant. Assumes the observed
    grid is dense (it is: 5 types × 7 days over 10k+ events).

    Scale: one map-side-combinable count per cell; everything after runs on
    |types|×7 rows regardless of event volume.
    """
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        F.col("event_type").alias("et"), F.dayofweek("ts").alias("dw")
    ).agg(F.count(F.lit(1)).alias("n"))
    m = c.select(
        "n",
        "et",
        "dw",
        F.sum("n").over(Window.partitionBy("et")).alias("rt"),
        F.sum("n").over(Window.partitionBy("dw")).alias("ct"),
        F.sum("n").over(Window.partitionBy()).alias("tot"),
    )
    e = F.col("rt").cast("double") * F.col("ct") / F.col("tot")
    return m.agg(
        F.round(F.sum(F.pow(F.col("n") - e, 2) / e), 4).alias("chi2"),
        (
            (F.countDistinct("et") - 1) * (F.countDistinct("dw") - 1)
        ).cast("bigint").alias("dof"),
        F.max("tot").alias("n_events"),
    )


@register(
    "dq_benford",
    CAT_QM,
    """
    WITH d AS (
      SELECT CAST(FLOOR(o_totalprice
                        / POWER(10, FLOOR(LOG10(o_totalprice)))) AS INT)
               AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    c AS (SELECT digit, COUNT(*)::BIGINT AS n FROM d GROUP BY digit),
    t AS (SELECT SUM(n)::BIGINT AS tot FROM c)
    SELECT digit, n,
           ROUND(n::DOUBLE / tot, 4) AS observed,
           ROUND(LOG10(1.0 + 1.0 / digit), 4) AS benford,
           ROUND(ABS(n::DOUBLE / tot - LOG10(1.0 + 1.0 / digit)), 4)
             AS abs_dev
    FROM c, t
    """,
)
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: first significant digit via
    floor(x / 10^floor(log10 x)) (pure IEEE double ops — bit-identical on
    both engines, no string formatting), observed share vs log10(1+1/d),
    absolute deviation per digit. Synthetic uniform-ish prices should
    deviate; real ledger data shouldn't — either way the op is the audit.

    Scale: single scan, 9-row result; the totals join is a broadcast of one
    row.
    """
    o = load_table(spark, sf_dir, "orders")
    d = o.filter(F.col("o_totalprice") > 0).select(
        F.floor(
            F.col("o_totalprice")
            / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
        ).cast("int").alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("tot"))
    share = F.col("n").cast("double") / F.col("tot")
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        F.round(share, 4).alias("observed"),
        F.round(benford, 4).alias("benford"),
        F.round(F.abs(share - benford), 4).alias("abs_dev"),
    )


@register(
    "ts_gap_islands",
    CAT_TS,
    """
    WITH d AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day
      FROM events WHERE ts IS NOT NULL
    ),
    r AS (
      SELECT user_id, day,
             date_diff('day', TIMESTAMP '1970-01-01', day)
               - row_number() OVER (PARTITION BY user_id ORDER BY day)
               AS grp
      FROM d
    ),
    s AS (
      SELECT user_id, grp, COUNT(*)::BIGINT AS streak_len
      FROM r GROUP BY user_id, grp
    )
    SELECT streak_len,
           COUNT(*)::BIGINT AS n_streaks,
           COUNT(DISTINCT user_id)::BIGINT AS n_users
    FROM s GROUP BY streak_len
    """,
)
def ts_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive active days per user.
    Distinct (user, day), then the classic epoch_day − row_number anchor
    (constant within a consecutive run), group to streaks, then the
    streak-length distribution with how many users ever achieved each
    length.

    Scale: one shuffle on user_id serves both the dedup and the window;
    everything downstream is per-user-tiny. This is the retention-streak
    primitive behind "7-day streak" product metrics. NULL ts dropped on
    both engines (the r8 NULL-time seam: a NULL day row perturbs the
    row_number anchor for its whole user partition).
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    d = ev.select("user_id", F.date_trunc("day", "ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    r = d.select(
        "user_id",
        (
            F.datediff("day", F.lit("1970-01-01")) - F.row_number().over(w)
        ).alias("grp"),
    )
    s = r.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("streak_len"))
    return s.groupBy("streak_len").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "events_anomaly_mad",
    CAT_TS,
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med
      FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
      SELECT event_type, MAX(med) AS med,
             quantile_cont(ABS(value - med), 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           COUNT(*)::BIGINT AS n,
           SUM(CASE WHEN ABS(d.value - a.med) > 3.0 * 1.4826 * a.mad
                    THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
           ROUND(MAX(a.med), 4) AS med,
           ROUND(MAX(a.mad), 4) AS mad
    FROM events d JOIN mad a ON d.event_type = a.event_type
    GROUP BY d.event_type
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median, then median
    absolute deviation, then count of |x−med| > 3·1.4826·MAD. MAD-based
    scores stay stable when the outliers themselves inflate the variance —
    the failure mode of plain z-scores (compare ts_anomaly_zscore).
    Spark ``percentile`` ≡ DuckDB ``quantile_cont`` (both interpolate).

    Scale: two aggregate passes with a broadcast per-type stats join each —
    no per-row shuffle beyond the groupBys; at 100 TB swap the exact
    percentile for approx_percentile with bounded error.
    """
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5D)").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.max("med").alias("med"),
        F.expr("percentile(abs(value - med), 0.5D)").alias("mad"),
    )
    out = ev.join(F.broadcast(mad), "event_type")
    thresh = 3.0 * 1.4826 * F.col("mad")
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.abs(F.col("value") - F.col("med")) > thresh, 1).otherwise(0)
        ).alias("n_outliers"),
        F.round(F.max("med"), 4).alias("med"),
        F.round(F.max("mad"), 4).alias("mad"),
    )


@register(
    "agg_weighted_median",
    CAT_AGG,
    """
    WITH g AS (
      SELECT l_returnflag, l_quantity,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))::BIGINT AS w
      FROM lineitem GROUP BY l_returnflag, l_quantity
    ),
    c AS (
      SELECT l_returnflag, l_quantity,
             SUM(w) OVER (PARTITION BY l_returnflag
                          ORDER BY l_quantity)::BIGINT AS cw,
             SUM(w) OVER (PARTITION BY l_returnflag)::BIGINT AS tw
      FROM g
    )
    SELECT l_returnflag,
           MIN(l_quantity) AS wmedian_qty,
           MAX(tw) AS total_weight_cents
    FROM c WHERE cw * 2 >= tw GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-weighted (lower) median quantity per return flag: weights are
    exact integer cents (round(price·100) as BIGINT) so the cumulative-sum
    boundary test ``2·cw ≥ tw`` is exact integer arithmetic — float weight
    cumsums can differ in the last ulp across engines and flip the boundary
    row; integers cannot. Values collapse to one row per (flag, quantity)
    before the window, giving a total order.

    Scale: the window runs over distinct (flag, quantity) pairs only —
    bounded by value cardinality, not row count.
    """
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag", "l_quantity").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("w")
    )
    wp = Window.partitionBy("l_returnflag")
    c = g.select(
        "l_returnflag",
        "l_quantity",
        F.sum("w").over(wp.orderBy("l_quantity")).alias("cw"),
        F.sum("w").over(wp).alias("tw"),
    )
    return (
        c.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("l_quantity").alias("wmedian_qty"),
            F.max("tw").alias("total_weight_cents"),
        )
    )


@register(
    "vec_label_centroid_sim",
    CAT_SIM,
    """
    WITH c AS (
      SELECT label, pos,
             ROUND(AVG(CAST(embedding[pos] AS DOUBLE)), 4) AS v
      FROM embeddings, (SELECT unnest(range(1, 65)) AS pos)
      GROUP BY label, pos
    ),
    p AS (
      SELECT a.label AS la, b.label AS lb,
             SUM(a.v * b.v) AS dot,
             SUM(a.v * a.v) AS sa,
             SUM(b.v * b.v) AS sb
      FROM c a JOIN c b ON a.pos = b.pos AND a.label < b.label
      GROUP BY 1, 2
    )
    SELECT la, lb, ROUND(dot / (SQRT(sa) * SQRT(sb)), 4) AS cos_sim
    FROM p
    """,
)
def vec_label_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between label centroids — the coarse-
    codebook geometry audit for IVF routing (llm_sim_ivf): near-identical
    centroids mean cells don't separate and nprobe must rise. Centroids are
    element-wise means ROUNDed to 4dp BEFORE the dot product on both
    engines, pinning the only order-sensitive float reduction; the 64-term
    dot products over rounded values then agree to well past 4dp.

    Scale: centroid agg collapses map-side to |labels|×64 states; the
    pairwise join runs on |labels|² rows — driver-trivial forever.
    """
    em = load_table(spark, sf_dir, "embeddings")
    c = (
        em.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "val"),
        )
        .groupBy("label", (F.col("pos0") + 1).alias("pos"))
        .agg(F.round(F.avg("val"), 4).alias("v"))
    )
    a = c.alias("a")
    b = c.alias("b")
    p = (
        a.join(b, (F.col("a.pos") == F.col("b.pos")) & (F.col("a.label") < F.col("b.label")))
        .groupBy(F.col("a.label").alias("la"), F.col("b.label").alias("lb"))
        .agg(
            F.sum(F.col("a.v") * F.col("b.v")).alias("dot"),
            F.sum(F.col("a.v") * F.col("a.v")).alias("sa"),
            F.sum(F.col("b.v") * F.col("b.v")).alias("sb"),
        )
    )
    return p.select(
        "la",
        "lb",
        F.round(F.col("dot") / (F.sqrt("sa") * F.sqrt("sb")), 4).alias("cos_sim"),
    )
