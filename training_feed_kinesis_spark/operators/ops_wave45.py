"""Wave 45: attention cost planning, funnel attribution-window sweep.

  * ``llm_attention_cost_table``: per candidate context length (512 /
    2048 / 8192 tokens), the quadratic-attention cost and padding waste
    of chunking the actual corpus — Σ len² over chunks, pad tokens, and
    chunk counts, all integer-exact. The capacity-planning table behind
    choosing a training context length for THIS corpus (not a rule of
    thumb).
  * ``events_funnel_window_sensitivity``: click→purchase conversion under
    1 h / 6 h / 24 h attribution windows in one pass — how much of the
    reported conversion is attribution-window artifact. The sweep version
    of ``funnel_conversion``, structured like
    ``llm_contamination_ngram_decay``: one scan, parameter grid
    broadcast.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_TEXT = "2.J llm-pipeline (text)"
CAT_WORK = "2.M workloads"

CONTEXTS = (512, 2048, 8192)
FUNNEL_WINDOWS_H = (1, 6, 24)


@register(
    "llm_attention_cost_table",
    CAT_TEXT,
    f"""
    WITH lens AS (
      SELECT doc_id, len(string_split(lower(text), ' '))::BIGINT AS n_tok
      FROM documents
    ),
    ctx AS (SELECT unnest([{", ".join(str(c) for c in CONTEXTS)}]) AS c),
    chunked AS (
      SELECT c, n_tok,
             n_tok // c AS n_full,
             n_tok % c AS tail
      FROM lens CROSS JOIN ctx
    )
    SELECT c AS context_len,
           COUNT(*)::BIGINT AS n_docs,
           CAST(SUM(n_full + CASE WHEN tail > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_chunks,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN tail > 0 THEN c - tail ELSE 0 END)
                AS BIGINT) AS pad_tokens,
           CAST(SUM(n_full * c * c + tail * tail) AS BIGINT)
             AS quad_cost,
           ROUND(SUM(n_full * c * c + tail * tail)
                 / CAST(SUM(n_tok) AS DOUBLE), 4) AS cost_per_token
    FROM chunked GROUP BY c
    """,
)
def llm_attention_cost_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attention-cost capacity table: chunk every document at each
    candidate context length and account Σ len² (the O(L²) attention
    term), padding waste if chunks are padded to full length, and chunk
    counts — all in integer arithmetic off ONE tokenization. Reading it:
    `cost_per_token` rises linearly with context (each token attends to
    a longer window) while `pad_tokens` falls as documents stop being
    split — the two curves cross where a packing stage
    (llm_pack_chunks) pays for itself.

    Scale shape: one map-side token count per doc × a 3-row broadcast
    grid → a 3-row combinable aggregate. The corpus is scanned once for
    all contexts."""
    d = load_table(spark, sf_dir, "documents")
    lens = d.select(
        "doc_id",
        F.size(F.split(F.lower("text"), " ")).cast("bigint").alias("n_tok"),
    )
    ctx = spark.createDataFrame([(c,) for c in CONTEXTS], "c int")
    chunked = lens.crossJoin(F.broadcast(ctx)).select(
        "c",
        "n_tok",
        F.floor(F.col("n_tok") / F.col("c")).alias("n_full"),
        (F.col("n_tok") % F.col("c")).alias("tail"),
    )
    has_tail = F.col("tail") > 0
    return chunked.groupBy("c").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("n_full") + F.when(has_tail, 1).otherwise(0))
        .cast("long")
        .alias("n_chunks"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.sum(F.when(has_tail, F.col("c") - F.col("tail")).otherwise(0))
        .cast("long")
        .alias("pad_tokens"),
        F.sum(
            F.col("n_full") * F.col("c") * F.col("c")
            + F.col("tail") * F.col("tail")
        )
        .cast("long")
        .alias("quad_cost"),
        F.round(
            F.sum(
                F.col("n_full") * F.col("c") * F.col("c")
                + F.col("tail") * F.col("tail")
            )
            / F.sum("n_tok").cast("double"),
            4,
        ).alias("cost_per_token"),
    ).select(
        F.col("c").alias("context_len"),
        "n_docs",
        "n_chunks",
        "total_tokens",
        "pad_tokens",
        "quad_cost",
        "cost_per_token",
    )


@register(
    "events_funnel_window_sensitivity",
    CAT_WORK,
    f"""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
      FROM events GROUP BY user_id
    ),
    eligible AS (
      SELECT user_id, t_click, t_buy FROM firsts WHERE t_click IS NOT NULL
    ),
    wins AS (SELECT unnest([{", ".join(str(w) for w in FUNNEL_WINDOWS_H)}])
             AS w_hours)
    SELECT w.w_hours AS window_hours,
           COUNT(*)::BIGINT AS n_clicked,
           CAST(SUM(CASE WHEN e.t_buy IS NOT NULL AND e.t_buy >= e.t_click
                      AND e.t_buy <= e.t_click + w.w_hours * INTERVAL 1 HOUR
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           ROUND(AVG(CASE WHEN e.t_buy IS NOT NULL AND e.t_buy >= e.t_click
                      AND e.t_buy <= e.t_click + w.w_hours * INTERVAL 1 HOUR
                     THEN 1.0 ELSE 0.0 END), 4) AS conversion_rate
    FROM eligible e CROSS JOIN wins w
    GROUP BY w.w_hours
    """,
)
def events_funnel_window_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-window sensitivity: the click→purchase conversion rate
    under 1 h / 6 h / 24 h windows, from one first-touch aggregate. A
    rate that keeps climbing with the window means conversions are slow
    (or coincidental) — the reported number is an artifact of the window
    choice, and THIS table is the context any single-window funnel
    readout (funnel_conversion) should ship with.

    Scale shape: first-touch timestamps aggregate per user once; the
    window grid is a 3-row broadcast; the sweep costs one extra
    low-cardinality aggregate, not three scans."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t_click"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_buy"
        ),
    )
    eligible = firsts.filter(F.col("t_click").isNotNull())
    wins = spark.createDataFrame([(w,) for w in FUNNEL_WINDOWS_H], "w_hours int")
    converted = (
        F.col("t_buy").isNotNull()
        & (F.col("t_buy") >= F.col("t_click"))
        & (
            F.col("t_buy")
            <= F.col("t_click")
            + (F.col("w_hours") * F.expr("INTERVAL 1 HOUR"))
        )
    )
    return (
        eligible.crossJoin(F.broadcast(wins))
        .groupBy("w_hours")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clicked"),
            F.sum(F.when(converted, 1).otherwise(0))
            .cast("long")
            .alias("n_converted"),
            F.round(F.avg(F.when(converted, 1.0).otherwise(0.0)), 4).alias(
                "conversion_rate"
            ),
        )
        .select(
            F.col("w_hours").alias("window_hours"),
            "n_clicked",
            "n_converted",
            "conversion_rate",
        )
    )
