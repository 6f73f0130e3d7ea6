"""Wave 13: BM25 retrieval scoring, Kaplan-Meier conversion survival.

  * ``llm_bm25_topk``: Okapi BM25 document ranking for a fixed query —
    the retrieval scorer behind RAG corpus construction (tf saturation
    k1, length normalization b — the two things TF-IDF lacks).
  * ``events_survival_km``: Kaplan-Meier estimator of click→purchase
    conversion time with right-censoring — time-to-event analytics
    spelled as windowed products (exp of cumsum of logs).

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

CAT_TEXT = "2.J llm-pipeline (text)"
CAT_TS = "2.L time-series analytics"

# --- BM25 ------------------------------------------------------------------

_K1 = 1.2
_B = 0.75
_QUERY = ("hash", "join", "filter", "scan", "broadcast")
_TOPN = 20


@register(
    "llm_bm25_topk",
    CAT_TEXT,
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
      FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*)::DOUBLE AS len FROM tok GROUP BY doc_id),
    avgdl AS (SELECT AVG(len) AS adl FROM dl),
    n_docs AS (SELECT COUNT(*)::DOUBLE AS n FROM documents),
    q AS (SELECT unnest({list(_QUERY)!r}) AS t),
    tf AS (
      SELECT tok.doc_id, tok.t, COUNT(*)::DOUBLE AS f
      FROM tok JOIN q ON q.t = tok.t
      GROUP BY tok.doc_id, tok.t
    ),
    df AS (SELECT t, COUNT(DISTINCT doc_id)::DOUBLE AS d FROM tf GROUP BY t),
    scored AS (
      SELECT tf.doc_id,
             SUM(
               ln(((SELECT n FROM n_docs) - df.d + 0.5) / (df.d + 0.5) + 1)
               * tf.f * ({_K1} + 1)
               / (tf.f + {_K1} * (1 - {_B} + {_B} * dl.len
                                  / (SELECT adl FROM avgdl)))
             ) AS score
      FROM tf
      JOIN df ON df.t = tf.t
      JOIN dl ON dl.doc_id = tf.doc_id
      GROUP BY tf.doc_id
    )
    SELECT doc_id, ROUND(score, 4) AS bm25
    FROM scored
    ORDER BY ROUND(score, 4) DESC, doc_id ASC
    LIMIT {_TOPN}
    """,
)
def llm_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 for a fixed 5-token query: idf (the +1 smoothed
    Robertson form) × tf saturation (k1=1.2) × length normalization
    (b=0.75). The retrieval scorer a RAG pipeline runs over the corpus —
    what TF-IDF lacks (unbounded tf, no length prior), BM25 fixes.

    Scale shape: the query-term semi join reduces the token stream to
    query-term postings BEFORE any aggregation (the inverted-index access
    pattern); doc lengths aggregate map-side; df and the corpus scalars
    broadcast. Top-20 is TakeOrderedAndProject — no global sort."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("t"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("double").alias("len"))
    avgdl = dl.agg(F.avg("len").alias("adl"))
    n_docs = d.agg(F.count(F.lit(1)).cast("double").alias("n"))
    q = spark.createDataFrame([(t,) for t in _QUERY], "t string")
    tf = (
        tok.join(F.broadcast(q), "t")
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).cast("double").alias("f"))
    )
    df_ = tf.groupBy("t").agg(F.countDistinct("doc_id").cast("double").alias("d"))
    idf = F.log(((F.col("n") - F.col("d") + 0.5) / (F.col("d") + 0.5)) + 1)
    denom = F.col("f") + _K1 * (
        1 - _B + _B * F.col("len") / F.col("adl")
    )
    term = idf * F.col("f") * (_K1 + 1) / denom
    return (
        tf.join(F.broadcast(df_), "t")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl))
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(F.sum(term).alias("score"))
        # order by the EMITTED 4-dp precision (ADVICE r2): a one-ulp libm
        # difference at the rank-_TOPN boundary must not flip the selection.
        .orderBy(F.round("score", 4).desc(), F.col("doc_id").asc())
        .limit(_TOPN)
        .select("doc_id", F.round("score", 4).alias("bm25"))
    )


# --- Kaplan-Meier ----------------------------------------------------------

_HORIZON_D = 14  # censor conversions longer than 14 days


@register(
    "events_survival_km",
    CAT_TS,
    f"""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
      FROM events GROUP BY user_id
    ),
    spells AS (
      SELECT user_id,
             CASE WHEN t_buy IS NOT NULL AND t_buy >= t_click
                   AND date_diff('day', t_click, t_buy) <= {_HORIZON_D}
                  THEN date_diff('day', t_click, t_buy) END AS event_day,
             CASE WHEN t_buy IS NOT NULL AND t_buy >= t_click
                   AND date_diff('day', t_click, t_buy) <= {_HORIZON_D}
                  THEN 1 ELSE 0 END AS converted
      FROM firsts WHERE t_click IS NOT NULL
    ),
    n_total AS (SELECT COUNT(*)::DOUBLE AS n FROM spells),
    daily AS (
      SELECT event_day AS d, COUNT(*)::DOUBLE AS d_events
      FROM spells WHERE converted = 1 GROUP BY event_day
    ),
    km AS (
      SELECT d, d_events,
             (SELECT n FROM n_total)
               - COALESCE(SUM(d_events) OVER (ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS at_risk
      FROM daily
    )
    SELECT d::BIGINT AS day,
           d_events::BIGINT AS n_converted,
           at_risk::BIGINT AS n_at_risk,
           ROUND(exp(SUM(ln(1 - d_events / at_risk))
                 OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)), 4) AS survival
    FROM km
    """,
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival of click→purchase conversion: per user the
    first click opens a spell, the first later purchase within 14 days
    closes it (converted); later or absent purchases are right-censored
    at the horizon (simplified: censored spells exit risk only at the
    horizon, so at_risk(t) = N − converted-before-t for t ≤ horizon).
    S(t) = Π (1 − d_i/n_i), spelled exp∘cumsum∘ln — the multiplicative
    window product Spark and SQL lack natively.

    Scale shape: one user-keyed aggregate builds spells; everything after
    runs on the DAYS-sized table (≤ horizon rows) — the KM curve itself
    costs nothing at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t_click"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_buy"
        ),
    )
    dd = F.datediff(F.col("t_buy"), F.col("t_click"))
    ok = (
        F.col("t_buy").isNotNull()
        & (F.col("t_buy") >= F.col("t_click"))
        & (dd <= _HORIZON_D)
    )
    spells = firsts.filter(F.col("t_click").isNotNull()).select(
        F.when(ok, dd).alias("event_day"),
        F.when(ok, 1).otherwise(0).alias("converted"),
    )
    n_total = spells.agg(F.count(F.lit(1)).cast("double").alias("n"))
    daily = (
        spells.filter(F.col("converted") == 1)
        .groupBy(F.col("event_day").alias("d"))
        .agg(F.count(F.lit(1)).cast("double").alias("d_events"))
    )
    w_prev = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    km = daily.crossJoin(F.broadcast(n_total)).withColumn(
        "at_risk",
        F.col("n") - F.coalesce(F.sum("d_events").over(w_prev), F.lit(0.0)),
    )
    return km.select(
        F.col("d").cast("long").alias("day"),
        F.col("d_events").cast("long").alias("n_converted"),
        F.col("at_risk").cast("long").alias("n_at_risk"),
        F.round(
            F.exp(
                F.sum(F.log(1 - F.col("d_events") / F.col("at_risk"))).over(
                    w_cum
                )
            ),
            4,
        ).alias("survival"),
    )
