"""Wave 54: experiment integrity, structural breaks, causal weighting,
quality routing, parameterized SQL.

  * ``events_ab_srm_check``: sample-ratio-mismatch χ² on the hash
    assignment — the FIRST check any experiment readout must pass
    (a biased split invalidates ``events_uplift_ab`` before any math).
  * ``ts_best_split``: single structural break in the daily value series
    by exact SSE minimization over every candidate split day.
  * ``events_ipw_ate``: inverse-propensity-weighted (Hájek) treatment
    effect with per-stratum propensities — the weighting companion to
    the post-stratified estimator (``events_stratified_ate``).
  * ``llm_quality_router``: confidence-banded routing between the cheap
    gate and the expensive judge, with queue sizes and judge cost.
  * ``sql_named_parameters``: Spark 3.4+ parameterized ``spark.sql``
    (named args) — the injection-safe query surface.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from .exact import CENTS_SUM_SQL, cents_sum
from ..tables import load_table

# exact integer-cents SUM of events.value, unrounded (r11 projected-
# magnitude lint, SURVEY 5.3.9a): total_value is a SUM-driven grower
_VAL_CENTS_SUM = CENTS_SUM_SQL.format(col="value")

CAT_EXP = "2.L experimentation"
CAT_TS = "2.L time series"
CAT_TEXT = "2.J llm-pipeline (text)"
CAT_SQL = "2.L sql surface"

# house A/B assignment (events_uplift_ab): md5 first nibble parity
_ASSIGN_SQL = (
    "CASE WHEN strpos('02468ace', substr(md5(user_id::VARCHAR), 1, 1)) > 0"
    " THEN 'A' ELSE 'B' END"
)
def _assign_spark():
    # built lazily: Column construction needs an active SparkContext, and
    # this module must be importable before any session exists
    return F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).isin(
            *list("02468ace")
        ),
        "A",
    ).otherwise("B")


@register(
    "events_ab_srm_check",
    CAT_EXP,
    f"""
    WITH assigned AS (
      SELECT user_id, {_ASSIGN_SQL} AS variant
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT
        COUNT(*) FILTER (WHERE variant = 'A')::BIGINT AS n_a,
        COUNT(*) FILTER (WHERE variant = 'B')::BIGINT AS n_b,
        COUNT(*)::BIGINT AS n
      FROM assigned
    )
    SELECT n_a, n_b,
           ROUND((n_a - n / 2.0) * (n_a - n / 2.0) / (NULLIF(n, 0) / 2.0)
                 + (n_b - n / 2.0) * (n_b - n / 2.0) / (NULLIF(n, 0) / 2.0),
                 4) AS chi2,
           ((n_a - n / 2.0) * (n_a - n / 2.0) / (NULLIF(n, 0) / 2.0)
            + (n_b - n / 2.0) * (n_b - n / 2.0) / (NULLIF(n, 0) / 2.0))
             > 3.841 AS srm_detected
    FROM arms
    """,
)
def events_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio mismatch: χ² of the observed arm sizes against the
    designed 50/50 split (1 dof; 3.841 = p<0.05). SRM is the canonical
    experiment-integrity gate — assignment bugs, bot filtering applied to
    one arm, or logging loss all surface here first, and any of them
    invalidates the uplift readout regardless of its p-value. Counts are
    exact integers; χ² is one fixed-form double expression.

    Scale shape: one user-grain aggregate (map-side combinable) and a
    1-row report."""
    ev = load_table(spark, sf_dir, "events")
    assigned = ev.groupBy("user_id").agg(
        F.first(_assign_spark()).alias("variant")
    )
    # COALESCE: the oracle's COUNT FILTER arms are 0 over an empty
    # corpus where SUM is NULL (empty-corpus census r6)
    arms = assigned.agg(
        F.coalesce(
            F.sum(F.when(F.col("variant") == "A", 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_a"),
        F.coalesce(
            F.sum(F.when(F.col("variant") == "B", 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_b"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    # NULLIF the divisor: n = 0 over an empty corpus means chi2 is NULL
    # on both engines rather than an ANSI divide-by-zero error
    # (empty-corpus census r6)
    da = F.col("n_a") - F.col("n") / 2.0
    db = F.col("n_b") - F.col("n") / 2.0
    half = F.expr("NULLIF(n, 0) / 2.0")
    chi2 = da * da / half + db * db / half
    return arms.select(
        "n_a",
        "n_b",
        F.round(chi2, 4).alias("chi2"),
        (chi2 > 3.841).alias("srm_detected"),
    )


@register(
    "ts_best_split",
    CAT_TS,
    # all moments from BIGINT 1e-4-unit daily sums: every candidate SSE
    # is the same fixed double expression over exact integers on both
    # engines, so the argmin cannot diverge
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    seq AS (
      SELECT v,
             ROW_NUMBER() OVER (ORDER BY d) AS i,
             COUNT(*) OVER () AS n,
             SUM(v) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cs,
             SUM(v * v) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS css,
             SUM(v) OVER () AS ts_,
             SUM(v * v) OVER () AS tss,
             d
      FROM daily
    ),
    cand AS (
      SELECT d AS split_day, i, n,
             (css - CAST(cs AS DOUBLE) * cs / i)
             + ((tss - css) - CAST(ts_ - cs AS DOUBLE) * (ts_ - cs) / (n - i))
               AS sse_split,
             tss - CAST(ts_ AS DOUBLE) * ts_ / n AS sse_single
      FROM seq WHERE i < n
    ),
    best AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY sse_split, split_day) AS rn
      FROM cand
    )
    -- SSE growers emit UNROUNDED (r11 magnitude lint, 5.3.9a): both
    -- engines hold the identical double from exact integer moments;
    -- the bounded r2_gain ratio keeps the 4dp round
    SELECT split_day, n::BIGINT AS n_days,
           sse_single / 1e4 AS sse_single,
           sse_split / 1e4 AS sse_split,
           ROUND(1 - sse_split / sse_single, 4) AS r2_gain
    FROM best WHERE rn = 1
    """,
)
def ts_best_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single structural break in the daily value series: the split day
    minimizing total within-segment SSE, found by evaluating every
    candidate from one pass of prefix sums (sum, sum-of-squares) — the
    binary-segmentation primitive under changepoint detection (recurse
    on the segments for more breaks). Daily values quantize to BIGINT
    cents (coarser than the usual 1e-4 so the cumulative sum of squares
    stays inside BIGINT) so every candidate's SSE is the identical double
    expression over exact integers on both engines — the argmin is
    deterministic, unlike a float-accumulated spelling.

    Scale shape: O(days) state after the daily aggregate; the candidate
    scan is a window over the day series, not the event stream. NULL ts
    dropped on both engines (the r8 NULL-time seam)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")).cast("bigint").alias("v")
    )
    w_ord = Window.orderBy("d")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    seq = daily.select(
        "d",
        "v",
        F.row_number().over(w_ord).alias("i"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("v").over(w_cum).alias("cs"),
        F.sum(F.col("v") * F.col("v")).over(w_cum).alias("css"),
        F.sum("v").over(w_all).alias("ts_"),
        F.sum(F.col("v") * F.col("v")).over(w_all).alias("tss"),
    )
    sse_split = F.expr(
        "(css - cast(cs AS double) * cs / i)"
        " + ((tss - css) - cast(ts_ - cs AS double) * (ts_ - cs) / (n - i))"
    )
    cand = seq.filter(F.col("i") < F.col("n")).select(
        F.col("d").alias("split_day"),
        "n",
        sse_split.alias("sse_split"),
        (
            F.col("tss") - F.col("ts_").cast("double") * F.col("ts_") / F.col("n")
        ).alias("sse_single"),
    )
    best = cand.withColumn(
        "rn", F.row_number().over(Window.orderBy("sse_split", "split_day"))
    ).filter(F.col("rn") == 1)
    return best.select(
        "split_day",
        F.col("n").cast("bigint").alias("n_days"),
        (F.col("sse_single") / 1e4).alias("sse_single"),
        (F.col("sse_split") / 1e4).alias("sse_split"),
        F.round(1 - F.col("sse_split") / F.col("sse_single"), 4).alias("r2_gain"),
    )


@register(
    "events_ipw_ate",
    CAT_EXP,
    f"""
    WITH per_user AS (
      SELECT user_id,
             {_ASSIGN_SQL} AS variant,
             COUNT(*)::BIGINT AS activity,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      FROM events GROUP BY user_id
    ),
    strat AS (
      SELECT *, NTILE(5) OVER (ORDER BY activity, user_id) AS stratum
      FROM per_user
    ),
    prop AS (
      SELECT stratum,
             SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END)
               / CAST(COUNT(*) AS DOUBLE) AS p
      FROM strat GROUP BY stratum
    ),
    wtd AS (
      SELECT s.variant, s.y,
             CASE WHEN s.variant = 'A' THEN 1 / p.p
                  ELSE 1 / (1 - p.p) END AS w
      FROM strat s JOIN prop p ON p.stratum = s.stratum
    )
    SELECT
      ROUND(SUM(CASE WHEN variant = 'A' THEN w * y ELSE 0 END)
            / SUM(CASE WHEN variant = 'A' THEN w ELSE 0 END), 4) AS rate_treat,
      ROUND(SUM(CASE WHEN variant = 'B' THEN w * y ELSE 0 END)
            / SUM(CASE WHEN variant = 'B' THEN w ELSE 0 END), 4) AS rate_control,
      ROUND(SUM(CASE WHEN variant = 'A' THEN w * y ELSE 0 END)
            / SUM(CASE WHEN variant = 'A' THEN w ELSE 0 END)
            - SUM(CASE WHEN variant = 'B' THEN w * y ELSE 0 END)
            / SUM(CASE WHEN variant = 'B' THEN w ELSE 0 END), 4) AS ate_ipw
    FROM wtd
    """,
)
def events_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hájek inverse-propensity-weighted treatment effect: propensity
    estimated per activity quintile (NTILE under a unique total order),
    each unit weighted 1/p (treated) or 1/(1−p) (control), effect =
    difference of weighted outcome means. The weighting companion to
    ``events_stratified_ate`` — IPW and post-stratification must agree
    when strata are the propensity model, which is exactly the
    consistency a causal-inference reviewer checks first.

    Scale shape: user-grain aggregate → one NTILE sort over users →
    5-row propensity table broadcast back → one weighted aggregate."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.first(_assign_spark()).alias("variant"),
        F.count(F.lit(1)).alias("activity"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "y"
        ),
    )
    strat = per_user.withColumn(
        "stratum", F.ntile(5).over(Window.orderBy("activity", "user_id"))
    )
    prop = strat.groupBy("stratum").agg(
        (
            F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
            / F.count(F.lit(1)).cast("double")
        ).alias("p")
    )
    wtd = strat.join(F.broadcast(prop), "stratum").select(
        "variant",
        "y",
        F.when(F.col("variant") == "A", 1 / F.col("p"))
        .otherwise(1 / (1 - F.col("p")))
        .alias("w"),
    )
    wy = lambda v: F.sum(  # noqa: E731
        F.when(F.col("variant") == v, F.col("w") * F.col("y")).otherwise(0.0)
    )
    ww = lambda v: F.sum(  # noqa: E731
        F.when(F.col("variant") == v, F.col("w")).otherwise(0.0)
    )
    return wtd.agg(
        F.round(wy("A") / ww("A"), 4).alias("rate_treat"),
        F.round(wy("B") / ww("B"), 4).alias("rate_control"),
        F.round(wy("A") / ww("A") - wy("B") / ww("B"), 4).alias("ate_ipw"),
    )


@register(
    "llm_quality_router",
    CAT_TEXT,
    """
    WITH banded AS (
      SELECT lang, n_chars,
             NTILE(10) OVER (ORDER BY n_chars, doc_id) AS decile
      FROM documents WHERE n_chars IS NOT NULL
    ),
    routed AS (
      SELECT lang, n_chars,
             CASE WHEN decile >= 8 THEN 'auto_keep'
                  WHEN decile <= 2 THEN 'auto_drop'
                  ELSE 'judge_queue' END AS route
      FROM banded
    )
    SELECT lang, route,
           COUNT(*)::BIGINT AS n_docs,
           CAST(SUM(CASE WHEN route = 'judge_queue' THEN n_chars ELSE 0 END)
                AS BIGINT) AS judge_chars
    FROM routed GROUP BY lang, route
    """,
)
def llm_quality_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confidence-banded quality routing: the cheap gate (length decile
    under a unique total order) auto-keeps the confident top band,
    auto-drops the confident bottom band, and sends only the uncertain
    middle to the expensive judge — with the judge queue's exact
    character cost per language, which is the number that decides
    whether the routing threshold is affordable. The standard two-tier
    curation economics: cheap model everywhere, expensive model only
    where the cheap one is unsure.

    Scale shape: one NTILE sort (or approx-percentile thresholds at
    scale, same plan as hist_equidepth) and a (lang × route) aggregate;
    judge cost is accounted without touching the judge."""
    # complete-case: a doc with unknown length has no decile, and NTILE
    # places NULLs engine-specifically (doc-corruption replay); unknown-
    # length docs are the judge's problem by policy, not the router's
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    )
    banded = d.select(
        "lang",
        "n_chars",
        F.ntile(10).over(Window.orderBy("n_chars", "doc_id")).alias("decile"),
    )
    routed = banded.select(
        "lang",
        "n_chars",
        F.when(F.col("decile") >= 8, "auto_keep")
        .when(F.col("decile") <= 2, "auto_drop")
        .otherwise("judge_queue")
        .alias("route"),
    )
    return routed.groupBy("lang", "route").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(
            F.when(F.col("route") == "judge_queue", F.col("n_chars")).otherwise(0)
        )
        .cast("bigint")
        .alias("judge_chars"),
    )


@register(
    "sql_named_parameters",
    CAT_SQL,
    f"""
    SELECT event_type, COUNT(*)::BIGINT AS n,
           {_VAL_CENTS_SUM} AS total_value
    FROM events
    WHERE event_type IN ('click', 'purchase') AND value > 50.0
    GROUP BY event_type
    """,
)
def sql_named_parameters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized ``spark.sql`` (Spark 3.4+): named parameter markers
    bound from a Python dict — values travel as TYPED literals through
    the parser, not string-spliced SQL, which is the injection-safe way
    an engine exposes user-supplied filters. The oracle inlines the same
    constants, proving parameter binding ≡ literal semantics.

    Scale: parameters fold into the plan as constants, so pushdown and
    partition pruning see them exactly like hand-written literals."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_param_v")
    return spark.sql(
        f"""
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               {_VAL_CENTS_SUM} AS total_value
        FROM events_param_v
        WHERE event_type IN (:et1, :et2) AND value > :minv
        GROUP BY event_type
        """,
        args={"et1": "click", "et2": "purchase", "minv": 50.0},
    )
