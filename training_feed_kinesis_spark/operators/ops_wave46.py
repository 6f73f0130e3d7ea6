"""Wave 46: Holt linear smoothing, hashing-trick feature vectors.

  * ``ts_holt_linear``: Holt's double exponential smoothing (level +
    trend) over the daily event-count series — a genuinely SEQUENTIAL
    recursion, expressed as a row-local array fold in Spark and a
    RECURSIVE CTE in the oracle, with both engines evaluating the
    identical IEEE expression per step. Extends the forecast family
    (ts_snaive_backtest's floor, ts_ewma's level-only smoothing) with
    the trend term + 3-step forecast.
  * ``events_feature_hashing``: the hashing trick (Weinberger et al.
    2009) — (event_type × hour-bucket) categorical crosses hashed into
    16 signed buckets per user, the fixed-width feature vector a linear
    model trains on without a vocabulary build.

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
CAT_ML = "2.L ML-relational"

ALPHA = 0.5   # level smoothing — 0.5 is exact in binary: bit-identical folds
BETA = 0.25   # trend smoothing — 0.25 likewise
N_BUCKETS = 16


@register(
    "ts_holt_linear",
    CAT_TS,
    f"""
    WITH RECURSIVE daily AS (
      SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, n FROM (
        SELECT date_trunc('day', ts) AS d, COUNT(*)::DOUBLE AS n
        FROM events WHERE ts IS NOT NULL GROUP BY date_trunc('day', ts))
    ),
    hw(i, level, trend) AS (
      -- seed MUST be CAST to DOUBLE: a bare 0.0 binds DECIMAL(2,1) and the
      -- whole recursion then runs in decimal arithmetic (SURVEY 5.3 rule 8)
      SELECT 1::BIGINT, (SELECT n FROM daily WHERE i = 1),
             CAST(0.0 AS DOUBLE)
      UNION ALL
      SELECT d.i,
             {ALPHA} * d.n + (1 - {ALPHA}) * (h.level + h.trend),
             {BETA} * (({ALPHA} * d.n + (1 - {ALPHA}) * (h.level + h.trend))
                       - h.level) + (1 - {BETA}) * h.trend
      FROM hw h JOIN daily d ON d.i = h.i + 1
    ),
    last AS (
      SELECT level, trend FROM hw WHERE i = (SELECT MAX(i) FROM daily)
    )
    SELECT (SELECT MAX(i) FROM daily)::BIGINT AS n_days,
           ROUND(level, 4) AS level,
           ROUND(trend, 4) AS trend,
           ROUND(level + 1 * trend, 4) AS forecast_1,
           ROUND(level + 2 * trend, 4) AS forecast_2,
           ROUND(level + 3 * trend, 4) AS forecast_3
    FROM last
    """,
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear method over daily event counts: level_t = α·y_t +
    (1−α)(level+trend), trend_t = β·Δlevel + (1−β)·trend, seeded
    (level=y_1, trend=0), forecast h steps = level + h·trend. The
    recursion is inherently sequential — Spark spells it as ONE
    ``aggregate`` fold over the (tiny, day-count-sized) series array;
    the oracle unrolls the SAME per-step expression through a RECURSIVE
    CTE, and α=0.5 / β=0.25 are exact binary fractions, so both engines
    produce bit-identical doubles before the final ROUND.

    Scale shape: the data-sized work is the daily aggregate (one
    shuffle); the fold runs over #days values on one row — iterate on
    AGGREGATES, never on raw data (the graph_pagerank discipline applied
    to smoothing). NULL ts dropped on both engines: a NULL day would
    seed the fold on Spark (null struct fields sort first in array_sort)
    but end the series on DuckDB (NULLS LAST) — the ADVICE r7 seam."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    )
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    # an EMPTY series must yield an empty result like the oracle's
    # WHERE i = MAX(i) over no days (r9 empty-table sweep: slice with
    # length size(ys)-1 = -1 crashes on a zero-day corpus)
    series = daily.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "n"))), lambda s: s.n
        ).alias("ys")
    ).filter(F.size("ys") >= 1)
    fold = F.expr(
        f"""aggregate(
              slice(ys, 2, size(ys) - 1),
              named_struct('level', ys[0], 'trend', CAST(0.0 AS DOUBLE)),
              (acc, y) -> named_struct(
                'level', {ALPHA} * y + (1 - {ALPHA}) * (acc.level + acc.trend),
                'trend', {BETA} * (({ALPHA} * y
                          + (1 - {ALPHA}) * (acc.level + acc.trend))
                          - acc.level) + (1 - {BETA}) * acc.trend))"""
    )
    return series.select(
        F.size("ys").cast("long").alias("n_days"), fold.alias("hw")
    ).select(
        "n_days",
        F.round(F.col("hw.level"), 4).alias("level"),
        F.round(F.col("hw.trend"), 4).alias("trend"),
        F.round(F.col("hw.level") + 1 * F.col("hw.trend"), 4).alias("forecast_1"),
        F.round(F.col("hw.level") + 2 * F.col("hw.trend"), 4).alias("forecast_2"),
        F.round(F.col("hw.level") + 3 * F.col("hw.trend"), 4).alias("forecast_3"),
    )


@register(
    "events_feature_hashing",
    CAT_ML,
    f"""
    WITH crossed AS (
      SELECT user_id,
             event_type || ':h' || (hour(ts) // 6)::VARCHAR AS feat
      FROM events
    ),
    hashed AS (
      SELECT user_id,
             CAST(strpos('0123456789abcdef', substr(md5(feat), 1, 1)) - 1
                  AS BIGINT) % {N_BUCKETS} AS bucket,
             CASE WHEN strpos('02468ace', substr(md5(feat), 2, 1)) > 0
                  THEN 1 ELSE -1 END AS sign
      FROM crossed
    )
    SELECT user_id, bucket,
           CAST(SUM(sign) AS BIGINT) AS feature_value,
           COUNT(*)::BIGINT AS n_events
    FROM hashed GROUP BY user_id, bucket
    """,
)
def events_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick feature construction: cross event_type with the
    6-hour day-part, hash the cross into one of 16 buckets (md5 nibble —
    engine-portable), with a second-nibble ±1 sign so colliding features
    cancel in expectation (the property that makes feature hashing
    unbiased). Output: the signed per-(user, bucket) feature values a
    linear model consumes directly.

    Scale shape: fully map-side until the (user, bucket) aggregate —
    fixed feature width regardless of category cardinality is the entire
    point of the trick: no vocabulary build, no second pass, no OOV
    handling at serving time."""
    ev = load_table(spark, sf_dir, "events")
    feat = F.concat(
        F.col("event_type"),
        F.lit(":h"),
        F.floor(F.hour("ts") / 6).cast("string"),
    )
    hashed = ev.select(
        "user_id",
        (
            (
                F.instr(
                    F.lit("0123456789abcdef"), F.substring(F.md5(feat), 1, 1)
                )
                - 1
            ).cast("bigint")
            % N_BUCKETS
        ).alias("bucket"),
        F.when(
            F.instr(F.lit("02468ace"), F.substring(F.md5(feat), 2, 1)) > 0, 1
        )
        .otherwise(-1)
        .alias("sign"),
    )
    return hashed.groupBy("user_id", "bucket").agg(
        F.sum("sign").cast("long").alias("feature_value"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


CAT_WORK = "2.M workloads"
DID_SPLIT = "2024-01-15"


@register(
    "events_did_estimator",
    CAT_WORK,
    f"""
    WITH cells AS (
      SELECT user_id,
             CASE WHEN strpos('02468ace',
                    substr(md5(user_id::VARCHAR), 1, 1)) > 0
                  THEN 'A' ELSE 'B' END AS variant,
             COALESCE(SUM(CASE WHEN ts < TIMESTAMP '{DID_SPLIT}'
                               THEN value END), 0) AS pre,
             COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '{DID_SPLIT}'
                               THEN value END), 0) AS post
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*)::BIGINT AS n_users,
           ROUND(AVG(CASE WHEN variant = 'A' THEN pre END), 4) AS pre_a,
           ROUND(AVG(CASE WHEN variant = 'B' THEN pre END), 4) AS pre_b,
           ROUND(AVG(CASE WHEN variant = 'A' THEN post END), 4) AS post_a,
           ROUND(AVG(CASE WHEN variant = 'B' THEN post END), 4) AS post_b,
           ROUND((AVG(CASE WHEN variant = 'A' THEN post END)
                  - AVG(CASE WHEN variant = 'A' THEN pre END))
                 - (AVG(CASE WHEN variant = 'B' THEN post END)
                    - AVG(CASE WHEN variant = 'B' THEN pre END)), 4)
             AS did_effect
    FROM cells
    """,
)
def events_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: the 2×2 (pre/post × A/B) cell means and
    the DiD effect (ΔA − ΔB) — the causal readout when assignment isn't
    randomized and both groups share a time trend (parallel-trends
    assumption; the md5 split here IS randomized, so DiD should agree
    with the plain uplift — which is itself the diagnostic). Completes
    the experimentation family: uplift (post-only), stratified ATE,
    CUPED (covariate), power (MDE), DiD (trend-robust).

    Scale shape: one user-grain aggregate + one combinable global
    aggregate — the standard two-shuffle experiment-readout shape."""
    ev = load_table(spark, sf_dir, "events")
    is_a = F.instr(
        F.lit("02468ace"), F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
    ) > 0
    cells = ev.groupBy("user_id").agg(
        F.when(F.first(is_a), "A").otherwise("B").alias("variant"),
        F.coalesce(
            F.sum(F.when(F.col("ts") < DID_SPLIT, F.col("value"))), F.lit(0.0)
        ).alias("pre"),
        F.coalesce(
            F.sum(F.when(F.col("ts") >= DID_SPLIT, F.col("value"))), F.lit(0.0)
        ).alias("post"),
    )
    m = lambda v, c: F.avg(F.when(F.col("variant") == v, F.col(c)))  # noqa: E731
    return cells.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(m("A", "pre"), 4).alias("pre_a"),
        F.round(m("B", "pre"), 4).alias("pre_b"),
        F.round(m("A", "post"), 4).alias("post_a"),
        F.round(m("B", "post"), 4).alias("post_b"),
        F.round(
            (m("A", "post") - m("A", "pre")) - (m("B", "post") - m("B", "pre")),
            4,
        ).alias("did_effect"),
    )
