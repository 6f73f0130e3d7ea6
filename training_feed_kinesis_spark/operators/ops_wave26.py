"""Wave 26: perceptual-hash multimodal near-dup, seasonal-naive backtest.

  * ``multimodal_phash_pairs``: near-duplicate binary payloads via a
    pHash-style 16-nibble sketch with pigeonhole block matching — the
    image-dedup shape (exact-byte dedup misses re-encodes; a perceptual
    sketch plus Hamming ball catches them). The sketch kernel here is a
    deterministic stand-in (md5 nibbles of the payload source), the
    candidate/verify plumbing is the real thing.
  * ``ts_snaive_backtest``: seasonal-naive forecast (value of the same
    weekday last week) backtested on the final week — MAE/MAPE per
    forecast day, the baseline every fancier forecaster must beat.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table, sane_ts

CAT_MM = "2.J llm-pipeline (multimodal)"
CAT_TS = "2.L time-series analytics"

_HAM_MAX = 3  # Hamming ball radius (nibble-count distance)


@register(
    "multimodal_phash_pairs",
    CAT_MM,
    f"""
    WITH sigs AS (
      SELECT doc_id, md5(text) AS ph,
             CASE doc_id % 3 WHEN 0 THEN 'text' WHEN 1 THEN 'image'
                             ELSE 'audio' END AS modality
      FROM documents
    ),
    img AS (SELECT doc_id, substr(ph, 1, 16) AS sig FROM sigs
            WHERE modality = 'image'),
    blocks AS (
      SELECT doc_id, sig, k, substr(sig, 1 + k * 4, 4) AS blk
      FROM img, (SELECT unnest(range(0, 4)) AS k)
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
             a.sig AS sig_a, b.sig AS sig_b
      FROM blocks a JOIN blocks b
        ON a.k = b.k AND a.blk = b.blk AND a.doc_id <= b.doc_id
    )
    SELECT a_id, b_id,
           (16 - len(list_filter(range(1, 17),
                 i -> substr(sig_a, i, 1) = substr(sig_b, i, 1))))::BIGINT
             AS hamming
    FROM cands
    WHERE 16 - len(list_filter(range(1, 17),
            i -> substr(sig_a, i, 1) = substr(sig_b, i, 1))) <= {_HAM_MAX}
    """,
)
def multimodal_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup pairs for image payloads: a 16-nibble sketch
    per payload, pigeonhole candidates (any two sketches within nibble-
    Hamming 3 agree on one of 4 blocks), exact Hamming verify — the
    re-encode-robust image dedup ladder. The sketch kernel is a
    deterministic md5 stand-in for a real pHash (DCT of the decoded
    image — stubbed per the container's no-imaging-libs constraint); the
    blocking, join and verify are the production plumbing, and self-
    pairs keep the result non-empty on the synthetic corpus.

    Scale: 4 sketch-block rows per image shuffle (never payload bytes);
    verification is a fixed 16-char compare per candidate."""
    d = load_table(spark, sf_dir, "documents")
    img = d.filter(F.col("doc_id") % 3 == 1).select(
        "doc_id", F.substring(F.md5("text"), 1, 16).alias("sig")
    )
    blocks = img.select(
        "doc_id",
        "sig",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k"),
    ).select(
        "doc_id", "sig", "k", F.expr("substr(sig, 1 + k * 4, 4)").alias("blk")
    )
    a = blocks.select(
        F.col("doc_id").alias("a_id"), F.col("sig").alias("sig_a"), "k", "blk"
    )
    b = blocks.select(
        F.col("doc_id").alias("b_id"), F.col("sig").alias("sig_b"), "k", "blk"
    )
    ham = F.lit(16) - F.size(
        F.expr(
            "filter(sequence(1, 16), i -> substr(sig_a, i, 1) = substr(sig_b, i, 1))"
        )
    )
    return (
        a.join(b, ["k", "blk"])
        .filter(F.col("a_id") <= F.col("b_id"))
        .select("a_id", "b_id", "sig_a", "sig_b")
        .distinct()
        .select("a_id", "b_id", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= _HAM_MAX)
    )


@register(
    "ts_snaive_backtest",
    CAT_TS,
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, ROUND(SUM(value), 4) AS rev
      FROM events WHERE ts IS NOT NULL AND (ts IS NULL OR (ts >= TIMESTAMP '1970-01-01' AND ts < TIMESTAMP '2200-01-01')) GROUP BY 1
    ),
    lagged AS (
      SELECT d, rev,
             LAG(rev, 7) OVER (ORDER BY d) AS snaive
      FROM daily
    ),
    horizon AS (SELECT MAX(d) AS dmax FROM daily)
    SELECT d AS day, rev AS actual, ROUND(snaive, 4) AS forecast,
           ROUND(ABS(rev - snaive), 4) AS abs_err,
           ROUND(ABS(rev - snaive) / rev, 4) AS ape
    FROM lagged, horizon
    WHERE snaive IS NOT NULL AND d > dmax - INTERVAL 7 DAY
    """,
)
def ts_snaive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive backtest: forecast(day) = revenue of the same
    weekday last week, evaluated over the final week — per-day absolute
    and percentage error. The floor baseline: any forecasting model that
    cannot beat snaive on these columns should not ship, which makes
    this table the first artifact of every forecast review.

    Scale shape: the day-keyed aggregate is the only data-sized step;
    the lag and the error columns run on the days-sized series. NULL ts
    dropped on both engines (the r8 NULL-time seam)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & sane_ts("ts")  # temporal admission (r12)
    )
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.round(F.sum("value"), 4).alias("actual")
    )
    w = Window.orderBy("day")
    lagged = daily.withColumn("forecast", F.round(F.lag("actual", 7).over(w), 4))
    dmax = daily.agg(F.max("day").alias("dmax"))
    return (
        lagged.crossJoin(F.broadcast(dmax))
        .filter(
            F.col("forecast").isNotNull()
            & (F.col("day") > F.col("dmax") - F.expr("INTERVAL 7 DAY"))
        )
        .select(
            "day",
            "actual",
            "forecast",
            F.round(F.abs(F.col("actual") - F.col("forecast")), 4).alias(
                "abs_err"
            ),
            F.round(
                F.abs(F.col("actual") - F.col("forecast")) / F.col("actual"), 4
            ).alias("ape"),
        )
    )
