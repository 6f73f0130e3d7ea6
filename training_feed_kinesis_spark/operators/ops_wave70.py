"""Wave 70: cart abandonment, Heaps'-law vocabulary growth.

  * ``events_cart_abandonment``: sessions that clicked but never
    purchased, with the engaged value walking away — the commerce
    funnel's leak report at session grain.
  * ``llm_heaps_law_curve``: vocabulary size vs corpus size at nested
    hash subsets (25/50/100%), measured in ONE pass via each type's
    minimal-subset first occurrence — the Heaps'-law curve that predicts
    how much new vocabulary more data will buy.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_REP = "2.L reporting"
CAT_TEXT = "2.J llm-pipeline (text)"


@register(
    "events_cart_abandonment",
    CAT_REP,
    """
    WITH gaps AS (
      SELECT user_id, ts, event_type, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_session
      FROM events WHERE ts IS NOT NULL
    ),
    sess AS (
      SELECT user_id, ts, event_type, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    ),
    flags AS (
      SELECT user_id, session_id,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicked,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS purchased,
             -- exact integer cents at the event grain (r11 magnitude
             -- lint, §5.3.9a): the cross-session total re-sums them
             -- exactly and is emitted unrounded
             SUM(CASE WHEN event_type = 'click'
                 THEN CAST(ROUND(value * 100, 0) AS BIGINT) ELSE 0 END)
               AS click_cents
      FROM sess GROUP BY user_id, session_id
    )
    SELECT
      COUNT(*)::BIGINT AS n_sessions,
      COUNT(*) FILTER (WHERE clicked = 1)::BIGINT AS n_engaged,
      COUNT(*) FILTER (WHERE clicked = 1 AND purchased = 0)::BIGINT
        AS n_abandoned,
      CAST(SUM(CASE WHEN clicked = 1 AND purchased = 0
               THEN click_cents ELSE 0 END) AS DOUBLE) / 100.0
        AS abandoned_value,
      CAST((2 * COUNT(*) FILTER (WHERE clicked = 1 AND purchased = 0) * 10000
            + COUNT(*) FILTER (WHERE clicked = 1))
           // (2 * NULLIF(COUNT(*) FILTER (WHERE clicked = 1), 0))
           AS BIGINT) / 10000.0
        AS abandonment_rate
    FROM flags
    """,
)
def events_cart_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cart abandonment at session grain: sessions that CLICKED (engaged
    intent) but closed without a purchase, plus the clicked value that
    walked away — the funnel leak the conversion rate alone hides
    (same sessionization spelling as the shared oracle; §5.3.1b integer
    half-up for the rate). The recover-revenue number a retargeting
    campaign is sized from.

    Scale shape: one user-keyed session window, one session-grain
    aggregate with map-side flags, a 1-row report. NULL ts dropped on
    both engines (the r8 NULL-time seam)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w_u = Window.partitionBy("user_id").orderBy("ts")
    gaps = ev.select(
        "user_id",
        "ts",
        "event_type",
        "value",
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w_u)
            > 1800,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sess = gaps.withColumn(
        "session_id",
        F.sum("new_session").over(w_u.rowsBetween(Window.unboundedPreceding, 0)),
    )
    flags = sess.groupBy("user_id", "session_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "clicked"
        ),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "purchased"
        ),
        F.sum(
            F.when(
                F.col("event_type") == "click",
                F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("click_cents"),
    )
    abandoned = (F.col("clicked") == 1) & (F.col("purchased") == 0)
    # COALESCE the COUNT-FILTER mirrors and NULLIF the rate divisor:
    # over an EMPTY corpus the oracle's COUNT FILTER arms are 0 and its
    # integer // NULL yields NULL, where a bare SUM is NULL and Spark's
    # ANSI div-by-zero would hard-error (empty-corpus census r6)
    return flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.coalesce(F.sum(F.col("clicked")), F.lit(0))
        .cast("bigint")
        .alias("n_engaged"),
        F.coalesce(F.sum(abandoned.cast("int")), F.lit(0))
        .cast("bigint")
        .alias("n_abandoned"),
        # no COALESCE: over an empty corpus both engines' SUM is NULL and
        # the quotient stays NULL — the oracle's CAST(SUM(..)) mirrors it
        (
            F.sum(
                F.when(abandoned, F.col("click_cents")).otherwise(
                    F.lit(0).cast("bigint")
                )
            ).cast("double")
            / 100.0
        ).alias("abandoned_value"),
    ).select(
        "n_sessions",
        "n_engaged",
        "n_abandoned",
        "abandoned_value",
        (
            F.expr(
                "(2 * n_abandoned * 10000 + n_engaged)"
                " div (2 * NULLIF(n_engaged, 0))"
            )
            .cast("bigint")
            / 10000.0
        ).alias("abandonment_rate"),
    )


@register(
    "llm_heaps_law_curve",
    CAT_TEXT,
    # subset level per doc from its md5 bucket (nested: 25% ⊂ 50% ⊂ 100%);
    # a type's first-occurrence level = MIN over its docs — vocab at level
    # L counts types with min_level <= L, all from ONE census
    """
    WITH docs AS (
      SELECT doc_id, text,
             CASE WHEN substr(md5(doc_id::VARCHAR), 1, 2) < '40' THEN 25
                  WHEN substr(md5(doc_id::VARCHAR), 1, 2) < '80' THEN 50
                  ELSE 100 END AS lvl
      FROM documents
    ),
    tok AS (
      SELECT lvl, unnest(string_split(lower(text), ' ')) AS t FROM docs
    ),
    types AS (
      SELECT t, MIN(lvl) AS first_lvl FROM tok GROUP BY t
    ),
    tokens_per_lvl AS (
      SELECT lvl, COUNT(*)::BIGINT AS toks FROM tok GROUP BY lvl
    )
    SELECT s.lvl AS subset_pct,
           CAST((SELECT SUM(toks) FROM tokens_per_lvl WHERE lvl <= s.lvl)
                AS BIGINT) AS n_tokens,
           (SELECT COUNT(*) FROM types WHERE first_lvl <= s.lvl)::BIGINT
             AS vocab_size,
           (SELECT COUNT(*) FROM types WHERE first_lvl = s.lvl)::BIGINT
             AS new_types
    FROM (SELECT DISTINCT lvl FROM docs) s
    """,
)
def llm_heaps_law_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth measured from ONE pass: documents
    are assigned to nested hash subsets (25% ⊂ 50% ⊂ 100% by md5
    bucket), each token TYPE records the smallest subset containing it,
    and the curve (tokens seen vs distinct types) falls out of two
    domain-sized aggregates — no re-scanning per subset. The slope of
    log(vocab) vs log(tokens) is Heaps' β; a flattening curve says more
    data buys repetition, not coverage — the measurement behind
    tokenizer sizing (llm_vocab_coverage_curve) and data-budget
    decisions (llm_token_budget_planner).

    Scale shape: one token census with a min-aggregate over types; the
    nested-subset trick turns a k-point curve from k scans into one."""
    d = load_table(spark, sf_dir, "documents")
    lvl = (
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "40", 25
        )
        .when(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "80", 50)
        .otherwise(100)
    )
    tok = d.select(lvl.alias("lvl"), F.explode(F.split(F.lower("text"), " ")).alias("t"))
    types = tok.groupBy("t").agg(F.min("lvl").alias("first_lvl"))
    toks_per = tok.groupBy("lvl").agg(F.count(F.lit(1)).alias("toks"))
    lvls = toks_per.select("lvl").distinct()
    a = lvls.alias("a")
    cum_tokens = (
        a.join(toks_per.alias("tp"), F.col("tp.lvl") <= F.col("a.lvl"))
        .groupBy(F.col("a.lvl").alias("lvl"))
        .agg(F.sum("toks").cast("bigint").alias("n_tokens"))
    )
    vocab = (
        lvls.alias("b")
        .join(types, types.first_lvl <= F.col("b.lvl"))
        .groupBy(F.col("b.lvl").alias("lvl"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
            F.sum((types.first_lvl == F.col("b.lvl")).cast("int"))
            .cast("bigint")
            .alias("new_types"),
        )
    )
    return (
        cum_tokens.join(vocab, "lvl")
        .select(
            F.col("lvl").alias("subset_pct"),
            "n_tokens",
            "vocab_size",
            "new_types",
        )
    )
