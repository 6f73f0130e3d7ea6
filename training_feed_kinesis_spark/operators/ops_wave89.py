"""Wave 89: retrieval rank fusion + interrupted time series.

  * ``llm_retrieval_fusion_rrf``: Reciprocal Rank Fusion (Cormack et
    al., SIGIR'09) of two independent retrieval rankings — unigram-set
    and bigram-set Jaccard against a probe document — RRF(d) =
    Σ 1/(60 + rank_i(d)). The standard zero-tuning hybrid-search
    combiner (lexical + semantic legs in production; two exact lexical
    legs here so every rank is integer-exact).
  * ``events_interrupted_ts``: interrupted time-series analysis — fit
    the pre-period daily revenue trend (exact-integer regression
    moments), project it as the counterfactual across the post period,
    and report per-day and cumulative effects. The causal readout when
    there IS no control group (launches, incidents, policy changes) —
    completing the causal family (DiD, CUPED, IPW, event study) with
    its single-series member.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table, sane_ts, sane_ts_sql

CAT_TEXT = "2.J llm text analysis"
CAT_EV = "2.L event analytics"

RRF_K = 60
BREAK_DAY = 15


@register(
    "llm_retrieval_fusion_rrf",
    CAT_TEXT,
    f"""
    WITH toks AS (
      -- words materialized ONCE per doc (r12 payload campaign): the
      -- split inlined inside the lambda re-evaluates per element --
      -- O(tokens^2) per document, minutes on a single 100 KB doc
      SELECT doc_id,
             list_distinct(w) AS uni,
             list_distinct(list_transform(
               range(1, len(w)),
               i -> w[i] || ' ' || w[i + 1])) AS bi
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
            FROM documents)
    ),
    probe AS (SELECT uni AS p_uni, bi AS p_bi FROM toks WHERE doc_id = 0),
    scored AS (
      SELECT t.doc_id,
             CAST((2 * len(list_intersect(t.uni, p.p_uni)) * 10000
                   + len(list_distinct(list_concat(t.uni, p.p_uni))))
                  // (2 * len(list_distinct(list_concat(t.uni, p.p_uni))))
                  AS BIGINT) AS j_uni_x1e4,
             CAST((2 * len(list_intersect(t.bi, p.p_bi)) * 10000
                   + len(list_distinct(list_concat(t.bi, p.p_bi))))
                  // (2 * len(list_distinct(list_concat(t.bi, p.p_bi))))
                  AS BIGINT) AS j_bi_x1e4
      FROM toks t CROSS JOIN probe p WHERE t.doc_id != 0
    ),
    ranked AS (
      SELECT doc_id, j_uni_x1e4, j_bi_x1e4,
             ROW_NUMBER() OVER (ORDER BY j_uni_x1e4 DESC, doc_id ASC)
               AS r_uni,
             ROW_NUMBER() OVER (ORDER BY j_bi_x1e4 DESC, doc_id ASC)
               AS r_bi
      FROM scored
    )
    SELECT doc_id, r_uni, r_bi,
           ROUND(1.0 / ({RRF_K} + r_uni) + 1.0 / ({RRF_K} + r_bi), 6)
             AS rrf_score,
           ROW_NUMBER() OVER (
             ORDER BY ROUND(1.0 / ({RRF_K} + r_uni)
                            + 1.0 / ({RRF_K} + r_bi), 6) DESC,
                      doc_id ASC) AS fused_rank
    FROM ranked
    ORDER BY fused_rank LIMIT 10
    """,
)
def llm_retrieval_fusion_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal Rank Fusion of two retrieval legs against probe doc 0:
    unigram-set Jaccard and bigram-set Jaccard each rank the corpus
    (integer 1e-4 scores, doc_id tiebreaks), and the fused score
    Σ 1/(k + rank), k = 60, re-ranks — RRF's property is that it needs
    NO score calibration between legs (only ranks), which is why it is
    the default combiner for lexical+vector hybrid search. Ranks are
    exact integers, so the fused doubles are engine-identical.

    Scale shape: one tokenization pass, a broadcast single-probe
    overlap scan (the llm_sim_topk probe shape), two domain-wide
    rank windows. With N probes the same plan partitions by probe."""
    d = load_table(spark, sf_dir, "documents")
    # words projected ONCE before the bigram lambda (r12 payload
    # campaign): split() inlined in the transform re-evaluates per
    # element — O(tokens²) per document, the llm_dedup._SHINGLES trap
    toks = d.select(
        "doc_id", F.split(F.lower("text"), " ").alias("w")
    ).select(
        "doc_id",
        F.array_distinct(F.col("w")).alias("uni"),
        # size guard (r12 payload campaign): sequence(1, 0) runs
        # DESCENDING in Spark, so a 1-word doc would build [1, 0] and
        # element_at(w, 2) ANSI-errors; DuckDB's range(1, 1) is empty.
        # Same guard shape as llm_dedup._SHINGLES.
        F.array_distinct(
            F.expr(
                "CASE WHEN size(w) >= 2 THEN"
                " transform(sequence(1, size(w) - 1),"
                " i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1)))"
                " ELSE array() END"
            )
        ).alias("bi"),
    )
    probe = toks.filter(F.col("doc_id") == 0).select(
        F.col("uni").alias("p_uni"), F.col("bi").alias("p_bi")
    )

    def jacc(a: str, b: str) -> F.Column:
        return F.expr(
            f"CAST((2 * size(array_intersect({a}, {b})) * 10000"
            f" + size(array_distinct(concat({a}, {b}))))"
            f" DIV (2 * size(array_distinct(concat({a}, {b})))) AS BIGINT)"
        )

    scored = (
        toks.filter(F.col("doc_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select(
            "doc_id",
            jacc("uni", "p_uni").alias("j_uni_x1e4"),
            jacc("bi", "p_bi").alias("j_bi_x1e4"),
        )
    )
    ranked = scored.select(
        "doc_id",
        "j_uni_x1e4",
        "j_bi_x1e4",
        F.row_number()
        .over(Window.orderBy(F.col("j_uni_x1e4").desc(), F.col("doc_id")))
        .alias("r_uni"),
        F.row_number()
        .over(Window.orderBy(F.col("j_bi_x1e4").desc(), F.col("doc_id")))
        .alias("r_bi"),
    )
    rrf = F.round(
        1.0 / (RRF_K + F.col("r_uni")) + 1.0 / (RRF_K + F.col("r_bi")), 6
    )
    return (
        ranked.select(
            "doc_id",
            "r_uni",
            "r_bi",
            rrf.alias("rrf_score"),
            F.row_number()
            .over(Window.orderBy(rrf.desc(), F.col("doc_id")))
            .alias("fused_rank"),
        )
        .orderBy("fused_rank")
        .limit(10)
    )


@register(
    "events_interrupted_ts",
    CAT_EV,
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) - DATE '2024-01-01' AS d,
             CAST(ROUND(CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) / 100.0, 0) AS BIGINT) AS y
      FROM events WHERE ts IS NOT NULL AND {sane_ts_sql("ts")} GROUP BY 1
    ),
    pre AS (
      SELECT COUNT(*)::BIGINT AS n, SUM(d)::BIGINT AS sd,
             SUM(y)::BIGINT AS sy, SUM(d * d)::BIGINT AS sdd,
             SUM(d * y)::BIGINT AS sdy
      FROM daily WHERE d < {BREAK_DAY}
    ),
    fit AS (
      SELECT CAST(n * sdy - sd * sy AS DOUBLE)
               / CAST(n * sdd - sd * sd AS DOUBLE) AS b,
             (CAST(sy AS DOUBLE)
              - CAST(n * sdy - sd * sy AS DOUBLE)
                / CAST(n * sdd - sd * sd AS DOUBLE) * sd) / n AS a
      FROM pre
    )
    -- counterfactual unrounded (r11 magnitude lint, 5.3.9a): a and b
    -- are quotients of exact integer moments, so a + b*d is the same
    -- two IEEE ops on identical doubles in both engines — a grower that
    -- must not pass a terminal ROUND
    SELECT CAST(dl.d AS BIGINT) AS day_idx, dl.y AS actual,
           f.a + f.b * dl.d AS counterfactual,
           ROUND(dl.y - (f.a + f.b * dl.d), 4) AS effect,
           ROUND(SUM(dl.y - (f.a + f.b * dl.d)) OVER (
             ORDER BY dl.d ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW), 4) AS cum_effect
    FROM daily dl CROSS JOIN fit f
    WHERE dl.d >= {BREAK_DAY}
    """,
)
def events_interrupted_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interrupted time series: OLS-fit the pre-period (days 0–14)
    daily-revenue trend from exact integer moments, project it across
    the post period as the counterfactual, and report each post day's
    effect plus the running cumulative effect. The single-series causal
    design for events with no control group — its validity rests on the
    pre-trend continuing, which is precisely what events_event_study's
    parallel-trends check interrogates in the two-group setting.

    Scale shape: day-grain aggregate → one 5-integer moment row → a
    broadcast scalar fit applied to the post rows; the cumulative
    window runs over the domain-sized series."""
    # NULL ts dropped on both engines (the r8 NULL-time seam); temporal
    # admission (r12): a year-9999 sentinel puts d ~ 2.9e6 in the moment
    # sums and d*d overflows the 32-bit datediff product
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & sane_ts("ts")
    )
    daily = ev.groupBy(
        F.datediff(F.date_trunc("day", "ts"), F.lit("2024-01-01")).alias("d")
    ).agg(F.round(F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")) / 100.0, 0).cast("long").alias("y"))
    pre = daily.filter(F.col("d") < BREAK_DAY).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").alias("sd"),
        F.sum("y").alias("sy"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum(F.col("d") * F.col("y")).alias("sdy"),
    )
    b = (
        (F.col("n") * F.col("sdy") - F.col("sd") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sdd") - F.col("sd") * F.col("sd")).cast(
            "double"
        )
    )
    fit = pre.select(
        b.alias("b"),
        ((F.col("sy").cast("double") - b * F.col("sd")) / F.col("n")).alias(
            "a"
        ),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    pred = F.col("a") + F.col("b") * F.col("d")
    return (
        daily.filter(F.col("d") >= BREAK_DAY)
        .crossJoin(F.broadcast(fit))
        .select(
            F.col("d").cast("long").alias("day_idx"),
            F.col("y").alias("actual"),
            pred.alias("counterfactual"),
            F.round(F.col("y") - pred, 4).alias("effect"),
            F.round(F.sum(F.col("y") - pred).over(w), 4).alias("cum_effect"),
        )
    )
