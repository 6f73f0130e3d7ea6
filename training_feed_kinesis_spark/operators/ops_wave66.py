"""Wave 66: dynamic-gap session windows, text watermark detection.

  * ``stream_session_dynamic_gap``: session_window with a PER-EVENT gap
    expression (purchases hold sessions open longer than views) — the
    dynamic-gap capability Spark added for session windows, drained and
    checked against a variable-gap batch sessionization oracle.
  * ``llm_watermark_detect``: green-list watermark detector
    (Kirchenbauer-style): the fraction of tokens whose hash lands in a
    fixed pseudo-random "green" half, z-scored against the 0.5 null —
    the statistical test for detecting watermarked synthetic text in a
    training corpus, calibrated against the EMPIRICAL cross-source
    spread (a small shared vocabulary violates the binomial null).

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table, sane_ts

CAT_STREAM = "2.I streaming"
CAT_TEXT = "2.J llm-pipeline (text)"

# purchases keep a session alive 60 minutes, everything else 15
# session_window's gap expression requires CalendarIntervalType —
# DayTime interval literals are rejected, so build via string→interval cast
_GAP_SQL = (
    "CASE WHEN event_type = 'purchase' THEN CAST('60 minutes' AS INTERVAL)"
    " ELSE CAST('15 minutes' AS INTERVAL) END"
)


@register(
    "stream_session_dynamic_gap",
    CAT_STREAM,
    # variable-gap sessionization: a new session starts when this event
    # begins after EVERY previous event's reach (ts_prev + gap_prev);
    # session end = running max of (ts + gap) within the session
    """
    WITH reach AS (
      SELECT user_id, ts,
             ts + CASE WHEN event_type = 'purchase' THEN INTERVAL '60 minutes'
                       ELSE INTERVAL '15 minutes' END AS r
      FROM events WHERE ts IS NOT NULL AND (ts IS NULL OR (ts >= TIMESTAMP '1970-01-01' AND ts < TIMESTAMP '2200-01-01'))
    ),
    marked AS (
      SELECT user_id, ts, r,
             CASE WHEN ts > MAX(r) OVER (
                    PARTITION BY user_id ORDER BY ts, r
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_session
      FROM reach
    ),
    sess AS (
      SELECT user_id, ts, r,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, r
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(r) AS session_end,
           COUNT(*)::BIGINT AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def stream_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a DYNAMIC per-event gap (session_window's
    expression form): a purchase holds its session open 60 minutes, any
    other event 15 — the behavioral reality that a conversion changes
    how long you wait before calling the visit over. Drained append-mode
    result ≡ the variable-gap batch sessionization (new session iff the
    event starts after the running max of every prior event's reach;
    end = max reach), which is exactly what the oracle computes — the
    FIFTH sessionizer in the family, and the only one whose window
    length is data-dependent.

    State shape: same as fixed-gap session windows (one open session per
    key bounded by the watermark), the gap just varies per row."""
    from ..streaming.replay import drain, replay_stream

    # NULL event-time rows dropped on both engines (r8 NULL-time seam)
    stream = replay_stream(spark, sf_dir, "ordered", sentinel=True).filter(
        F.col("ts").isNotNull() & sane_ts("ts")  # temporal admission (r12)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(
            F.session_window("ts", F.expr(_GAP_SQL)),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    res = drain(agg, "append")
    return res.filter(F.col("user_id") >= 0).select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
    )


_WM_SIGMA_FLAG = 3.0  # empirical-spread multiples beyond which we flag


@register(
    "llm_watermark_detect",
    CAT_TEXT,
    f"""
    WITH tok AS (
      SELECT source, unnest(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS t
      FROM documents
    ),
    scored AS (
      SELECT source,
             CASE WHEN strpos('02468ace', substr(md5(t), 1, 1)) > 0
                  THEN 1 ELSE 0 END AS green
      FROM tok
    ),
    per_src AS (
      SELECT source, COUNT(*)::BIGINT AS n_tokens,
             CAST(SUM(green) AS BIGINT) AS n_green,
             CAST(SUM(green) AS DOUBLE) / COUNT(*) AS share
      FROM scored GROUP BY source
    ),
    spread AS (
      SELECT AVG(share) AS mu,
             sqrt(SUM((share - (SELECT AVG(share) FROM per_src))
                      * (share - (SELECT AVG(share) FROM per_src)))
                  / (COUNT(*) - 1)) AS sd
      FROM per_src
    )
    SELECT p.source, p.n_tokens, p.n_green,
           ROUND(p.share, 4) AS green_share,
           ROUND((p.share - s.mu) / s.sd, 4) AS spread_sigma,
           ABS((p.share - s.mu) / s.sd) > {_WM_SIGMA_FLAG} AS flagged
    FROM per_src p, spread s
    """,
)
def llm_watermark_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Green-list watermark detector: a generation-time watermark biases
    sampling toward a pseudo-random "green" half of the vocabulary, so
    watermarked text shows a green-token share significantly above 0.5.
    The detector recomputes membership (md5 nibble parity — the same
    keyed-hash construction a real watermark uses), counts green tokens
    per source, and z-scores against the Binomial(n, ½) null; |z| > 4
    flags a source as likely machine-generated with this key. On this
    human-proxy corpus every source should sit near 0.5 — the operator
    is the MONITOR a training-data pipeline runs to keep watermarked
    synthetic text from contaminating the feed.

    Scale shape: token explode + map-side hash + one source-grain
    aggregate; the z math is per-group scalar algebra."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split(F.expr("translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')"), " ")).alias("t"))
    scored = tok.select(
        "source",
        F.when(
            F.substring(F.md5("t"), 1, 1).isin(*list("02468ace")), 1
        )
        .otherwise(0)
        .alias("green"),
    )
    per_src = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("green").cast("bigint").alias("n_green"),
    )
    per_src = per_src.withColumn(
        "share", F.col("n_green").cast("double") / F.col("n_tokens")
    )
    mu_df = per_src.agg(F.avg("share").alias("mu"))
    spread = per_src.crossJoin(F.broadcast(mu_df)).agg(
        F.first("mu").alias("mu"),
        F.sqrt(
            F.sum((F.col("share") - F.col("mu")) * (F.col("share") - F.col("mu")))
            / (F.count(F.lit(1)) - 1)
        ).alias("sd"),
    )
    dev = (F.col("share") - F.col("mu")) / F.col("sd")
    return per_src.crossJoin(F.broadcast(spread)).select(
        "source",
        "n_tokens",
        "n_green",
        F.round("share", 4).alias("green_share"),
        F.round(dev, 4).alias("spread_sigma"),
        (F.abs(dev) > _WM_SIGMA_FLAG).alias("flagged"),
    )
