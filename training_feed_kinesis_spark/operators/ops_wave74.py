"""Wave 74: ML feature engineering + forecast evaluation.

  * ``ml_target_encoding_loo``: leave-one-out target encoding — the
    standard high-cardinality categorical encoder, spelled as one
    aggregate + broadcast join so each row's own label is excluded
    WITHOUT a second pass (LOO = (S_cat − y_i)/(n_cat − 1)).
  * ``ml_woe_iv``: weight-of-evidence buckets + information value for
    the fixed portable score vs the returns label — the credit-scoring
    feature screen, exact integer ratios inside the log.
  * ``ml_ndcg``: graded-relevance NDCG@10 per user over value-ranked
    events — the ranking-quality metric, ideal ordering computed in the
    same window pass.
  * ``ml_brier_decomposition``: Brier score with the Murphy
    decomposition (reliability − resolution + uncertainty) over
    forecast groups — calibration and discrimination split apart.

Reuses the engine-portable integer score/label from ml_eval (ml_eval.py:36)
so every engine computes identical inputs.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table
from .ml_eval import _LABEL_SQL, _SCORE_SQL

CAT = "2.L ML-relational"


@register(
    "ml_target_encoding_loo",
    CAT,
    """
    WITH lab AS (
      SELECT event_id, user_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    per_cat AS (
      SELECT user_id, COUNT(*)::BIGINT AS n_cat, SUM(y)::BIGINT AS s_cat
      FROM lab GROUP BY user_id
    )
    SELECT l.event_id, l.user_id, l.y,
           CAST(CASE WHEN p.n_cat > 1
                     THEN (2 * (p.s_cat - l.y) * 10000 + (p.n_cat - 1))
                          // (2 * (p.n_cat - 1)) END AS BIGINT)
             AS loo_enc_x1e4
    FROM lab l JOIN per_cat p USING (user_id)
    """,
)
def ml_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of user_id against the purchase
    label: each row is encoded with the purchase rate of its OWN
    category computed WITHOUT itself — (S−y)/(n−1) — the leakage-safe
    form (plain mean encoding leaks the row's label into its feature
    and inflates offline metrics). Emitted as integer half-up 1e-4
    units; singleton categories get NULL (no peers to encode from).

    Scale shape: one map-combinable category aggregate, then a join
    back on the category key — the aggregate side is |categories| rows,
    broadcastable for any realistic cardinality, and the identity
    (S−y)/(n−1) avoids the naive per-row re-aggregation entirely."""
    ev = load_table(spark, sf_dir, "events")
    lab = ev.select(
        "event_id",
        "user_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    per_cat = lab.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_cat"), F.sum("y").alias("s_cat")
    )
    return lab.join(F.broadcast(per_cat), "user_id").select(
        "event_id",
        "user_id",
        "y",
        F.expr(
            "CAST(CASE WHEN n_cat > 1 THEN"
            " (2 * (s_cat - y) * 10000 + (n_cat - 1))"
            " DIV (2 * (n_cat - 1)) END AS BIGINT)"
        ).alias("loo_enc_x1e4"),
    )


@register(
    "ml_woe_iv",
    CAT,
    f"""
    WITH b AS (
      SELECT ({_SCORE_SQL}) // 10 AS bucket, {_LABEL_SQL} AS y
      FROM lineitem
    ),
    cells AS (
      SELECT bucket, SUM(y)::BIGINT AS good,
             (COUNT(*) - SUM(y))::BIGINT AS bad
      FROM b GROUP BY bucket
    ),
    tot AS (SELECT SUM(good)::BIGINT AS g, SUM(bad)::BIGINT AS bd FROM cells)
    SELECT bucket,
           good, bad,
           ROUND(ln((CAST(good AS DOUBLE) * t.bd)
                    / (CAST(bad AS DOUBLE) * t.g)), 4) AS woe,
           ROUND((CAST(good AS DOUBLE) / t.g - CAST(bad AS DOUBLE) / t.bd)
                 * ln((CAST(good AS DOUBLE) * t.bd)
                      / (CAST(bad AS DOUBLE) * t.g)), 4) AS iv_contrib
    FROM cells CROSS JOIN tot t
    """,
)
def ml_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of evidence per score decile against the returns label:
    WoE_b = ln((good_b/G)/(bad_b/B)) — spelled as a single log of an
    exact-integer cross-ratio (good_b·B)/(bad_b·G), so both engines take
    ln of the identical double — plus each bucket's information-value
    contribution (IV = Σ (g%−b%)·WoE screens features before modeling;
    IV < 0.02 is conventionally useless, > 0.5 suspicious).

    Scale shape: one hash aggregate to 10 buckets, one broadcast scalar
    — the screen runs per feature in a single pass each, embarrassingly
    parallel across features."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.expr(f"({_SCORE_SQL}) div 10").alias("bucket"),
        F.expr(_LABEL_SQL).alias("y"),
    )
    cells = b.groupBy("bucket").agg(
        F.sum("y").alias("good"),
        (F.count(F.lit(1)) - F.sum("y")).alias("bad"),
    )
    tot = cells.agg(F.sum("good").alias("g"), F.sum("bad").alias("bd"))
    cross = (F.col("good").cast("double") * F.col("bd")) / (
        F.col("bad").cast("double") * F.col("g")
    )
    woe = F.log(cross)
    return cells.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "good",
        "bad",
        F.round(woe, 4).alias("woe"),
        F.round(
            (
                F.col("good").cast("double") / F.col("g")
                - F.col("bad").cast("double") / F.col("bd")
            )
            * woe,
            4,
        ).alias("iv_contrib"),
    )


@register(
    "ml_ndcg",
    CAT,
    """
    WITH rel AS (
      SELECT user_id, event_id, value,
             CASE event_type WHEN 'purchase' THEN 7 WHEN 'signup' THEN 3
                             WHEN 'click' THEN 1 ELSE 0 END AS gain
      FROM events
    ),
    ranked AS (
      SELECT user_id, gain,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id ASC) AS pos,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY gain DESC, event_id ASC) AS ideal_pos
      FROM rel
    )
    SELECT user_id,
           ROUND(SUM(CASE WHEN pos <= 10
                          THEN gain / log2(pos + 1.0) ELSE 0 END), 4) AS dcg10,
           ROUND(SUM(CASE WHEN ideal_pos <= 10
                          THEN gain / log2(ideal_pos + 1.0) ELSE 0 END), 4)
             AS idcg10,
           ROUND(SUM(CASE WHEN pos <= 10 THEN gain / log2(pos + 1.0)
                          ELSE 0 END)
                 / NULLIF(SUM(CASE WHEN ideal_pos <= 10
                                   THEN gain / log2(ideal_pos + 1.0)
                                   ELSE 0 END), 0), 4) AS ndcg10
    FROM ranked
    GROUP BY user_id
    """,
)
def ml_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded-relevance NDCG@10 per user: events ranked by the value
    column as the "model score", relevance gains 2^rel−1 ∈ {7,3,1,0}
    for purchase/signup/click/other, ideal ordering computed by a
    second window in the SAME pass (no separate ideal join). The
    ranking metric for recommender/feed ordering — position-discounted,
    normalized so users with different activity are comparable.

    Scale shape: two windows over the same user partition — one shuffle
    by user_id, gains and discounts row-local; top-10 truncation keeps
    the metric's cost independent of per-user fan-out."""
    ev = load_table(spark, sf_dir, "events")
    rel = ev.select(
        "user_id",
        "event_id",
        "value",
        F.when(F.col("event_type") == "purchase", 7)
        .when(F.col("event_type") == "signup", 3)
        .when(F.col("event_type") == "click", 1)
        .otherwise(0)
        .alias("gain"),
    )
    w_pos = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    w_ideal = Window.partitionBy("user_id").orderBy(
        F.col("gain").desc(), F.col("event_id").asc()
    )
    ranked = rel.select(
        "user_id",
        "gain",
        F.row_number().over(w_pos).alias("pos"),
        F.row_number().over(w_ideal).alias("ideal_pos"),
    )
    dcg = F.sum(
        F.when(
            F.col("pos") <= 10,
            F.col("gain") / F.log2(F.col("pos") + 1.0),
        ).otherwise(0.0)
    )
    idcg = F.sum(
        F.when(
            F.col("ideal_pos") <= 10,
            F.col("gain") / F.log2(F.col("ideal_pos") + 1.0),
        ).otherwise(0.0)
    )
    return ranked.groupBy("user_id").agg(
        F.round(dcg, 4).alias("dcg10"),
        F.round(idcg, 4).alias("idcg10"),
        F.round(dcg / F.nullif(idcg, F.lit(0.0)), 4).alias("ndcg10"),
    )


@register(
    "ml_brier_decomposition",
    CAT,
    f"""
    WITH b AS (
      SELECT {_SCORE_SQL} AS s, {_LABEL_SQL} AS y FROM lineitem
    ),
    g AS (
      SELECT s, COUNT(*)::BIGINT AS n, SUM(y)::BIGINT AS yk
      FROM b GROUP BY s
    ),
    tot AS (SELECT SUM(n)::BIGINT AS nn, SUM(yk)::BIGINT AS pp FROM g),
    agg AS (
      SELECT MAX(t.nn) AS nn, MAX(t.pp) AS pp,
             CAST(SUM(n * s * s) - 192 * SUM(s * yk) + 9216 * SUM(yk)
                  AS BIGINT) AS brier_num,
             SUM(pow(CAST(s * n - 96 * yk AS DOUBLE), 2) / n) AS rel_num,
             SUM(pow(CAST(yk * t.nn - n * t.pp AS DOUBLE), 2) / n) AS res_num
      FROM g CROSS JOIN tot t
    )
    SELECT ROUND(CAST(brier_num AS DOUBLE) / (9216.0 * nn), 4) AS brier,
           ROUND(rel_num / (9216.0 * nn), 4) AS reliability,
           ROUND(res_num / (CAST(nn AS DOUBLE) * nn * nn), 4) AS resolution,
           ROUND(CAST(pp AS DOUBLE) * (nn - pp) / nn / nn, 4) AS uncertainty
    FROM agg
    """,
)
def ml_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score of the portable forecast p = score/96 against the
    returns label, with the Murphy decomposition over forecast groups:
    Brier = reliability − resolution + uncertainty. Reliability is the
    calibration gap (forecast vs observed rate per group), resolution
    the discrimination (group rates vs base rate), uncertainty the
    irreducible ō(1−ō) — the report that tells you WHETHER to fix the
    model (low resolution) or its calibration map (high reliability).

    Arithmetic: p=s/96 makes every squared term a ratio of exact
    integers — (s·n−96·y_k)² and (y_k·N−n·Y)² are formed in BIGINT /
    exact-double range before any division, so cross-engine drift is
    confined to the final 97-term double sum, far below the 4dp round.

    Scale shape: one hash aggregate to ≤97 forecast groups, then a
    single-row fold — the decomposition costs one scan regardless of N."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(F.expr(_SCORE_SQL).alias("s"), F.expr(_LABEL_SQL).alias("y"))
    g = b.groupBy("s").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("yk")
    )
    tot = g.agg(F.sum("n").alias("nn"), F.sum("yk").alias("pp"))
    agg = g.crossJoin(F.broadcast(tot)).agg(
        F.max("nn").alias("nn"),
        F.max("pp").alias("pp"),
        (
            F.sum(F.col("n") * F.col("s") * F.col("s"))
            - 192 * F.sum(F.col("s") * F.col("yk"))
            + 9216 * F.sum("yk")
        ).cast("long").alias("brier_num"),
        F.sum(
            F.pow((F.col("s") * F.col("n") - 96 * F.col("yk")).cast("double"), 2)
            / F.col("n")
        ).alias("rel_num"),
        F.sum(
            F.pow(
                (F.col("yk") * F.col("nn") - F.col("n") * F.col("pp")).cast(
                    "double"
                ),
                2,
            )
            / F.col("n")
        ).alias("res_num"),
    )
    return agg.select(
        F.round(F.col("brier_num").cast("double") / (9216.0 * F.col("nn")), 4)
        .alias("brier"),
        F.round(F.col("rel_num") / (9216.0 * F.col("nn")), 4)
        .alias("reliability"),
        F.round(
            F.col("res_num")
            / (F.col("nn").cast("double") * F.col("nn") * F.col("nn")),
            4,
        ).alias("resolution"),
        F.round(
            F.col("pp").cast("double")
            * (F.col("nn") - F.col("pp"))
            / F.col("nn")
            / F.col("nn"),
            4,
        ).alias("uncertainty"),
    )
