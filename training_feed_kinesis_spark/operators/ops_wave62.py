"""Wave 62: exact isotonic calibration, DiD event study.

  * ``ml_isotonic_calibration``: isotonic (monotone) regression of the
    per-score positive rate via the exact minimax formula — the
    calibration map a ranking model ships with, computed without any
    iterative pooling loop.
  * ``events_event_study``: per-day treatment-control gaps relative to
    the pre-period baseline — the event-study readout that shows WHEN a
    difference-in-differences effect arrives (and validates parallel
    pre-trends).

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

# the shared deterministic score/label construction of the ml_eval family
from .ml_eval import _LABEL_SQL, _SCORE_SQL

CAT_ML = "2.L ML-relational"
CAT_EXP = "2.L experimentation"


@register(
    "ml_isotonic_calibration",
    CAT_ML,
    f"""
    WITH base AS (
      -- unscorable rows excluded (NULL l_orderkey => NULL score;
      -- NULL-PK r9 — engines order the NULL score group differently)
      SELECT {_SCORE_SQL} AS score, {_LABEL_SQL} AS lab FROM lineitem
      WHERE {_SCORE_SQL} IS NOT NULL
    ),
    g AS (SELECT score, COUNT(*)::BIGINT AS n, SUM(lab)::BIGINT AS k
          FROM base GROUP BY score),
    ord AS (SELECT score, n, k, ROW_NUMBER() OVER (ORDER BY score) AS i FROM g),
    pre AS (
      SELECT i, score, n, k,
             SUM(n) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS cn,
             SUM(k) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS ck
      FROM ord
    ),
    trip AS (
      SELECT c.i AS i, j.i AS j,
             (kk.ck - COALESCE(jm.ck, 0))
               / CAST(kk.cn - COALESCE(jm.cn, 0) AS DOUBLE) AS a
      FROM pre c
      JOIN pre j ON j.i <= c.i
      JOIN pre kk ON kk.i >= c.i
      LEFT JOIN pre jm ON jm.i = j.i - 1
    ),
    mins AS (SELECT i, j, MIN(a) AS m FROM trip GROUP BY i, j),
    fit AS (SELECT i, MAX(m) AS iso FROM mins GROUP BY i)
    SELECT p.score, p.n, p.k,
           ROUND(CAST(p.k AS DOUBLE) / p.n, 4) AS raw_rate,
           ROUND(f.iso, 4) AS isotonic_rate
    FROM pre p JOIN fit f ON f.i = p.i
    """,
)
def ml_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration: the least-squares MONOTONE fit of positive
    rate as a function of model score, via the exact minimax identity
    fit(i) = max_{{j≤i}} min_{{k≥i}} mean(y_j..y_k) — no pool-adjacent-
    violators loop, no iteration, just three bounded relational passes
    over the SCORE-GROUP table (97 groups here): prefix sums, a
    (i, j, k) triple bounded by j≤i≤k (≈n³/6 rows of the GROUP table,
    never the data), an inner MIN and an outer MAX. Every averaged value
    is a ratio of exact integer prefix sums, so the minimax winner is
    identical across engines. This is the calibration map that turns a
    ranking score into a usable probability, with monotonicity
    guaranteed by construction.

    Scale shape: the data-sized work is ONE groupBy(score); everything
    after operates on the score-cardinality table (a model's score
    buckets — hundreds, not rows). The cubic term lives entirely in
    that tiny domain."""
    b = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.expr(_SCORE_SQL).alias("score"),
            F.expr(_LABEL_SQL).alias("lab"),
        )
        .filter(F.col("score").isNotNull())
    )
    g = b.groupBy("score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("lab").cast("bigint").alias("k"),
    )
    w = Window.orderBy("score")
    pre = g.select(
        "score",
        "n",
        "k",
        F.row_number().over(w).alias("i"),
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cn"),
        F.sum("k").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("ck"),
    ).localCheckpoint()
    c = pre.select(F.col("i").alias("ci"))
    j = pre.select(F.col("i").alias("ji"), F.col("cn").alias("jcn"), F.col("ck").alias("jck"))
    jm = pre.select(
        (F.col("i") + 1).alias("ji"),
        F.col("cn").alias("pcn"),
        F.col("ck").alias("pck"),
    )
    kk = pre.select(F.col("i").alias("ki"), F.col("cn").alias("kcn"), F.col("ck").alias("kck"))
    trip = (
        c.join(j, F.col("ji") <= F.col("ci"))
        .join(jm, "ji", "left")
        .join(kk, F.col("ki") >= F.col("ci"))
        .select(
            "ci",
            "ji",
            (
                (F.col("kck") - F.coalesce("pck", F.lit(0)))
                / (F.col("kcn") - F.coalesce("pcn", F.lit(0))).cast("double")
            ).alias("a"),
        )
    )
    mins = trip.groupBy("ci", "ji").agg(F.min("a").alias("m"))
    fit = mins.groupBy("ci").agg(F.max("m").alias("iso"))
    return (
        pre.join(fit, pre.i == fit.ci)
        .select(
            "score",
            "n",
            "k",
            F.round(F.col("k").cast("double") / F.col("n"), 4).alias("raw_rate"),
            F.round("iso", 4).alias("isotonic_rate"),
        )
    )


_TREAT_DAY = 15


@register(
    "events_event_study",
    CAT_EXP,
    f"""
    WITH assigned AS (
      SELECT CASE WHEN strpos('02468ace',
                    substr(md5(user_id::VARCHAR), 1, 1)) > 0
                  THEN 'T' ELSE 'C' END AS arm,
             CAST(date_part('day', ts) AS INT) AS day,
             value
      FROM events
    ),
    cells AS (
      SELECT day, arm, AVG(value) AS m, COUNT(*)::BIGINT AS n
      FROM assigned GROUP BY day, arm
    ),
    gaps AS (
      SELECT day,
             MAX(CASE WHEN arm = 'T' THEN m END)
               - MAX(CASE WHEN arm = 'C' THEN m END) AS gap,
             CAST(SUM(n) AS BIGINT) AS n_events
      FROM cells GROUP BY day
    ),
    base AS (
      SELECT SUM(CASE WHEN day < {_TREAT_DAY} THEN gap ELSE 0 END)
             / SUM(CASE WHEN day < {_TREAT_DAY} THEN 1 ELSE 0 END) AS pre_gap
      FROM gaps
    )
    SELECT g.day,
           g.day >= {_TREAT_DAY} AS post,
           g.n_events,
           ROUND(g.gap, 4) AS raw_gap,
           ROUND(g.gap - b.pre_gap, 4) AS effect_vs_pretrend
    FROM gaps g, base b
    """,
)
def events_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-study readout around a day-{_TREAT_DAY} rollout: per day,
    the treatment−control mean gap, re-centered on the PRE-period
    average gap — post-period bars are the dynamic treatment effect,
    pre-period bars near zero validate the parallel-trends assumption a
    plain difference-in-differences silently relies on
    (``events_did_estimator`` gives the pooled number; this shows when
    it arrives and whether the design was sound).

    Scale shape: one (day × arm) cell aggregate (map-side combinable),
    a day-grain pivot, and a broadcast 1-row baseline."""
    ev = load_table(spark, sf_dir, "events")
    assigned = ev.select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).isin(
                *list("02468ace")
            ),
            "T",
        )
        .otherwise("C")
        .alias("arm"),
        F.dayofmonth("ts").alias("day"),
        "value",
    )
    cells = assigned.groupBy("day", "arm").agg(
        F.avg("value").alias("m"), F.count(F.lit(1)).alias("n")
    )
    gaps = cells.groupBy("day").agg(
        (
            F.max(F.when(F.col("arm") == "T", F.col("m")))
            - F.max(F.when(F.col("arm") == "C", F.col("m")))
        ).alias("gap"),
        F.sum("n").cast("bigint").alias("n_events"),
    )
    base = gaps.agg(
        (
            F.sum(F.when(F.col("day") < _TREAT_DAY, F.col("gap")).otherwise(0.0))
            / F.sum(F.when(F.col("day") < _TREAT_DAY, 1).otherwise(0))
        ).alias("pre_gap")
    )
    return gaps.crossJoin(F.broadcast(base)).select(
        "day",
        (F.col("day") >= _TREAT_DAY).alias("post"),
        "n_events",
        F.round("gap", 4).alias("raw_gap"),
        F.round(F.col("gap") - F.col("pre_gap"), 4).alias("effect_vs_pretrend"),
    )
