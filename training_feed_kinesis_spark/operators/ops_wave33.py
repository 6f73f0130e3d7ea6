"""Wave 33: retention decay fit, quality-length confound check.

  * ``retention_decay_fit``: log-linear decay rate fitted to the
    day-offset retention curve — the single "how fast do users decay"
    number product reviews track.
  * ``llm_quality_length_confound``: correlation between document length
    and unigram-NLL quality — the confound audit run BEFORE
    perplexity-filtering a corpus (if quality strongly tracks length,
    the filter silently becomes a length filter).

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_TS = "2.L time-series analytics"
CAT_TEXT = "2.J llm-pipeline (text)"


@register(
    "retention_decay_fit",
    CAT_TS,
    """
    WITH firsts AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS d0 FROM events
      GROUP BY user_id
    ),
    actives AS (
      SELECT DISTINCT e.user_id,
             date_diff('day', f.d0, date_trunc('day', e.ts)) AS day_offset
      FROM events e JOIN firsts f ON f.user_id = e.user_id
    ),
    curve AS (
      SELECT day_offset, COUNT(*)::DOUBLE AS n_active
      FROM actives WHERE day_offset BETWEEN 1 AND 14 GROUP BY day_offset
    ),
    base AS (SELECT COUNT(*)::DOUBLE AS n0 FROM firsts),
    pts AS (
      SELECT day_offset::DOUBLE AS x, ln(n_active / (SELECT n0 FROM base)) AS y
      FROM curve
    )
    SELECT COUNT(*)::BIGINT AS n_points,
           ROUND((AVG(x * y) - AVG(x) * AVG(y))
                 / (AVG(x * x) - AVG(x) * AVG(x)), 4) AS decay_per_day,
           ROUND(exp(AVG(y) - (AVG(x * y) - AVG(x) * AVG(y))
                     / (AVG(x * x) - AVG(x) * AVG(x)) * AVG(x)), 4)
             AS day0_intercept
    FROM pts
    """,
)
def retention_decay_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention decay rate: per-offset active share over days 1-14 after
    first touch, log-linear OLS slope — retention(t) ≈ a·e^(slope·t), one
    number per product review ('we lose X%/day'). Composes the cohort
    curve (``retention_cohorts``) with the closed-form OLS the
    ``agg_regression`` family uses.

    Scale shape: first-touch and distinct-active aggregates are the only
    data-sized steps; the fit runs over ≤14 points."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("d0")
    )
    actives = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("d0")).alias(
                "day_offset"
            ),
        )
        .distinct()
    )
    curve = (
        actives.filter(F.col("day_offset").between(1, 14))
        .groupBy("day_offset")
        .agg(F.count(F.lit(1)).cast("double").alias("n_active"))
    )
    base = firsts.agg(F.count(F.lit(1)).cast("double").alias("n0"))
    pts = curve.crossJoin(F.broadcast(base)).select(
        F.col("day_offset").cast("double").alias("x"),
        F.log(F.col("n_active") / F.col("n0")).alias("y"),
    )
    slope = (
        F.avg(F.col("x") * F.col("y")) - F.avg("x") * F.avg("y")
    ) / (F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x"))
    return pts.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.round(slope, 4).alias("decay_per_day"),
        F.round(F.exp(F.avg("y") - slope * F.avg("x")), 4).alias(
            "day0_intercept"
        ),
    )


@register(
    "llm_quality_length_confound",
    CAT_TEXT,
    """
    WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
                 FROM documents),
    cnt AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
    tot AS (SELECT SUM(c)::DOUBLE AS n FROM cnt),
    nll AS (
      SELECT doc_id, COUNT(*)::DOUBLE AS n_tokens,
             AVG(-ln(c::DOUBLE / n)) AS avg_nll
      FROM tok JOIN cnt USING (t), tot
      GROUP BY doc_id
    )
    SELECT COUNT(*)::BIGINT AS n_docs,
           ROUND(corr(ln(n_tokens), avg_nll), 4) AS corr_loglen_nll,
           ROUND(AVG(avg_nll), 4) AS mean_nll,
           ROUND(AVG(CASE WHEN n_tokens >= 300 THEN avg_nll END)
                 - AVG(CASE WHEN n_tokens < 300 THEN avg_nll END), 4)
             AS long_minus_short_nll
    FROM nll
    """,
)
def llm_quality_length_confound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-length confound audit: corr(log length, unigram NLL) plus
    the long-vs-short mean NLL gap. Run BEFORE perplexity-filtering: a
    strong correlation means the 'quality' threshold silently selects on
    LENGTH, skewing the surviving mixture — the standard fix is binning
    the filter threshold by length band, and this table is the evidence
    that decides it.

    Scale shape: the unigram NLL pass is ``llm_unigram_logprob``'s plan;
    the audit itself is one combinable aggregate over per-doc rows."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("t"))
    cnt = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").cast("double").alias("n"))
    nll = (
        tok.join(F.broadcast(cnt), "t")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_tokens"),
            F.avg(-F.log(F.col("c") / F.col("n"))).alias("avg_nll"),
        )
    )
    is_long = F.col("n_tokens") >= 300
    return nll.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.corr(F.log("n_tokens"), F.col("avg_nll")), 4).alias(
            "corr_loglen_nll"
        ),
        F.round(F.avg("avg_nll"), 4).alias("mean_nll"),
        F.round(
            F.avg(F.when(is_long, F.col("avg_nll")))
            - F.avg(F.when(~is_long, F.col("avg_nll"))),
            4,
        ).alias("long_minus_short_nll"),
    )
