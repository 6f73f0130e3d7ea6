"""Wave 30: stratified treatment effect, seeded-draw stability.

  * ``events_stratified_ate``: arm-vs-arm conversion difference within
    activity strata, size-weighted to an overall effect — the
    post-stratified estimate that removes activity confounding a raw
    A/B difference carries.
  * ``llm_mixture_seed_stability``: the same α-mixture draw under three
    release seeds — per-language kept-count spread, demonstrating that
    seeded md5 draws give independent-but-reproducible samples (the
    property that makes corpus builds re-runnable to the byte).

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table

CAT_WORK = "2.M workloads"
CAT_TEXT = "2.J llm-pipeline (text)"

_N_STRATA = 5
_KEEP_RATE = 0.5
_SEEDS = (0, 1, 2)


@register(
    "events_stratified_ate",
    CAT_WORK,
    f"""
    WITH users AS (
      SELECT user_id,
             CASE WHEN strpos('02468ace',
                    substr(md5(user_id::VARCHAR), 1, 1)) > 0
                  THEN 'A' ELSE 'B' END AS variant,
             COUNT(*)::DOUBLE AS activity,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ),
    strat AS (
      SELECT *, NTILE({_N_STRATA}) OVER (ORDER BY activity, user_id) AS stratum
      FROM users
    ),
    cells AS (
      SELECT stratum, variant, COUNT(*)::DOUBLE AS n,
             AVG(converted::DOUBLE) AS rate
      FROM strat GROUP BY stratum, variant
    ),
    wide AS (
      SELECT stratum,
             SUM(n) AS n_stratum,
             MAX(CASE WHEN variant = 'A' THEN rate END) AS rate_a,
             MAX(CASE WHEN variant = 'B' THEN rate END) AS rate_b
      FROM cells GROUP BY stratum
    )
    SELECT stratum::BIGINT AS stratum,
           n_stratum::BIGINT AS n_users,
           ROUND(rate_a, 4) AS rate_a,
           ROUND(rate_b, 4) AS rate_b,
           ROUND(rate_b - rate_a, 4) AS effect,
           ROUND((rate_b - rate_a) * n_stratum
                 / SUM(n_stratum) OVER (), 4) AS weighted_contrib
    FROM wide
    """,
)
def events_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratified treatment effect: users bucketed into five
    activity strata (deterministic NTILE with user tiebreak), arm
    conversion rates compared WITHIN each stratum, contributions
    size-weighted — Σ weighted_contrib is the stratified ATE, free of
    the activity imbalance a raw arm difference would carry. The
    warehouse-side causal baseline one rung above ``events_uplift_ab``.

    Scale shape: one user aggregate, a strata-sized pivot, a window
    total — nothing after the first aggregate scales with data (the
    global NTILE swaps to approx-quantile thresholds at size, as in
    ``llm_perplexity_buckets``)."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("activity"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    ).select(
        "user_id",
        "activity",
        "converted",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).isin(
                *"02468ace"
            ),
            "A",
        )
        .otherwise("B")
        .alias("variant"),
    )
    strat = users.withColumn(
        "stratum",
        F.ntile(_N_STRATA).over(Window.orderBy("activity", "user_id")),
    )
    cells = strat.groupBy("stratum", "variant").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg(F.col("converted").cast("double")).alias("rate"),
    )
    wide = cells.groupBy("stratum").agg(
        F.sum("n").alias("n_stratum"),
        F.max(F.when(F.col("variant") == "A", F.col("rate"))).alias("rate_a"),
        F.max(F.when(F.col("variant") == "B", F.col("rate"))).alias("rate_b"),
    )
    w_all = Window.partitionBy()
    return wide.select(
        F.col("stratum").cast("long").alias("stratum"),
        F.col("n_stratum").cast("long").alias("n_users"),
        F.round("rate_a", 4).alias("rate_a"),
        F.round("rate_b", 4).alias("rate_b"),
        F.round(F.col("rate_b") - F.col("rate_a"), 4).alias("effect"),
        F.round(
            (F.col("rate_b") - F.col("rate_a"))
            * F.col("n_stratum")
            / F.sum("n_stratum").over(w_all),
            4,
        ).alias("weighted_contrib"),
    )


_U = (
    "list_sum(list_transform(range(1, 14), "
    "i -> (strpos('0123456789abcdef', "
    "substr(md5('seed' || {s} || ':' || doc_id::VARCHAR), i, 1)) - 1) "
    "* power(16.0, -i)))"
)
_U_SPARK = (
    "aggregate(transform(sequence(1, 13), "
    "i -> (locate(substr(md5(concat('seed', '{s}', ':', "
    "cast(doc_id AS string))), i, 1), '0123456789abcdef') - 1) "
    "* power(16.0D, -cast(i AS double))), 0.0D, (a, b) -> a + b)"
)


@register(
    "llm_mixture_seed_stability",
    CAT_TEXT,
    f"""
    WITH draws AS (
      SELECT d.lang, s.seed,
             CASE WHEN (CASE s.seed
                          WHEN 0 THEN {_U.format(s="'0'")}
                          WHEN 1 THEN {_U.format(s="'1'")}
                          ELSE {_U.format(s="'2'")} END) < {_KEEP_RATE}
                  THEN 1 ELSE 0 END AS kept
      FROM documents d
      CROSS JOIN (SELECT unnest({list(_SEEDS)!r}) AS seed) s
    ),
    per AS (
      SELECT lang, seed, SUM(kept)::DOUBLE AS n_kept
      FROM draws GROUP BY lang, seed
    )
    SELECT lang,
           MIN(n_kept)::BIGINT AS min_kept,
           MAX(n_kept)::BIGINT AS max_kept,
           ROUND(AVG(n_kept), 4) AS mean_kept,
           ROUND(stddev_samp(n_kept), 4) AS sd_kept
    FROM per GROUP BY lang
    """,
)
def llm_mixture_seed_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded-draw stability: the same 50% keep-rate draw under three
    release seeds (md5('seed<k>:'||doc) hex-fraction uniforms), reporting
    per-language min/max/mean/sd of kept counts. The spread matches
    binomial sampling noise — the seeds give INDEPENDENT samples — while
    any single seed reproduces byte-identically on any engine, which is
    the whole reproducibility contract of hash-seeded corpus builds.

    Scale shape: 3 row-local draws per doc, one (lang, seed) aggregate,
    then a languages-sized rollup."""
    d = load_table(spark, sf_dir, "documents")
    seeds = F.explode(F.array(*[F.lit(s) for s in _SEEDS])).alias("seed")
    u = (
        F.when(F.col("seed") == 0, F.expr(_U_SPARK.format(s="0")))
        .when(F.col("seed") == 1, F.expr(_U_SPARK.format(s="1")))
        .otherwise(F.expr(_U_SPARK.format(s="2")))
    )
    draws = d.select("doc_id", "lang", seeds).select(
        "lang",
        "seed",
        F.when(u < _KEEP_RATE, 1).otherwise(0).alias("kept"),
    )
    per = draws.groupBy("lang", "seed").agg(
        F.sum("kept").cast("double").alias("n_kept")
    )
    return per.groupBy("lang").agg(
        F.min("n_kept").cast("long").alias("min_kept"),
        F.max("n_kept").cast("long").alias("max_kept"),
        F.round(F.avg("n_kept"), 4).alias("mean_kept"),
        F.round(F.stddev_samp("n_kept"), 4).alias("sd_kept"),
    )
