"""Wave 63: Shapley R² attribution, two-phase annealing schedule.

  * ``ml_shapley_r2``: exact Shapley decomposition of regression R²
    between two features — every coalition's fit comes from ONE moment
    pass, so the attribution needs no retraining loop.
  * ``llm_anneal_schedule``: the two-phase pretraining data schedule
    (temperature-sampled main phase, quality-boosted annealing tail)
    with per-source token budgets for both phases from one pass.

Reference parity note: /root/reference is an EMPTY checkout (SURVEY.md
§0.1); capability surface reconstructed per SURVEY.md §2 and
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

CAT_ML = "2.L ML-relational"
CAT_TEXT = "2.J llm-pipeline (text)"


@register(
    "ml_shapley_r2",
    CAT_ML,
    """
    WITH m AS (
      SELECT COUNT(*)::DOUBLE AS n,
             AVG(l_quantity * l_quantity) - AVG(l_quantity) * AVG(l_quantity)
               AS c11,
             AVG(l_quantity * l_discount) - AVG(l_quantity) * AVG(l_discount)
               AS c12,
             AVG(l_discount * l_discount) - AVG(l_discount) * AVG(l_discount)
               AS c22,
             AVG(l_quantity * l_extendedprice)
               - AVG(l_quantity) * AVG(l_extendedprice) AS c1y,
             AVG(l_discount * l_extendedprice)
               - AVG(l_discount) * AVG(l_extendedprice) AS c2y,
             AVG(l_extendedprice * l_extendedprice)
               - AVG(l_extendedprice) * AVG(l_extendedprice) AS cyy
      FROM lineitem
    ),
    fits AS (
      SELECT n,
             c1y * c1y / (c11 * cyy) AS r2_1,
             c2y * c2y / (c22 * cyy) AS r2_2,
             ((c22 * c1y - c12 * c2y) * c1y + (c11 * c2y - c12 * c1y) * c2y)
               / ((c11 * c22 - c12 * c12) * cyy) AS r2_full
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           ROUND(r2_1, 4) AS r2_x1_alone,
           ROUND(r2_2, 4) AS r2_x2_alone,
           ROUND(r2_full, 4) AS r2_full,
           ROUND((r2_1 + (r2_full - r2_2)) / 2, 4) AS shapley_x1,
           ROUND((r2_2 + (r2_full - r2_1)) / 2, 4) AS shapley_x2
    FROM fits
    """,
)
def ml_shapley_r2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley attribution of regression R² between two features
    (quantity, discount → extended price): each coalition's R² — {1},
    {2}, {1,2}, with R²(∅)=0 — comes in CLOSED FORM from the same
    covariance moments (the OLS identities R²({i}) = c_iy²/(c_ii·c_yy),
    R²(full) = bᵀc_y/c_yy), so the Shapley values φᵢ = ½[(R²({i})−0) +
    (R²(full)−R²({j}))] need one data pass and zero retraining — the
    honest "how much does each feature explain" split that raw
    per-feature R²s double-count under correlation (φ₁+φ₂ = R²(full) by
    construction, which the test asserts).

    Scale shape: ONE combinable moment aggregate → 7 doubles; with d
    features the moment row grows d² and coalitions 2^d — exact Shapley
    stays closed-form for the small d where it's exact anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    x1, x2, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    m = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.avg(x1 * x1) - F.avg(x1) * F.avg(x1)).alias("c11"),
        (F.avg(x1 * x2) - F.avg(x1) * F.avg(x2)).alias("c12"),
        (F.avg(x2 * x2) - F.avg(x2) * F.avg(x2)).alias("c22"),
        (F.avg(x1 * y) - F.avg(x1) * F.avg(y)).alias("c1y"),
        (F.avg(x2 * y) - F.avg(x2) * F.avg(y)).alias("c2y"),
        (F.avg(y * y) - F.avg(y) * F.avg(y)).alias("cyy"),
    )
    r2_1 = F.col("c1y") * F.col("c1y") / (F.col("c11") * F.col("cyy"))
    r2_2 = F.col("c2y") * F.col("c2y") / (F.col("c22") * F.col("cyy"))
    r2_full = (
        (F.col("c22") * F.col("c1y") - F.col("c12") * F.col("c2y")) * F.col("c1y")
        + (F.col("c11") * F.col("c2y") - F.col("c12") * F.col("c1y")) * F.col("c2y")
    ) / ((F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")) * F.col("cyy"))
    fits = m.select(
        "n", r2_1.alias("r2_1"), r2_2.alias("r2_2"), r2_full.alias("r2_full")
    )
    return fits.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.round("r2_1", 4).alias("r2_x1_alone"),
        F.round("r2_2", 4).alias("r2_x2_alone"),
        F.round("r2_full", 4).alias("r2_full"),
        F.round((F.col("r2_1") + (F.col("r2_full") - F.col("r2_2"))) / 2, 4).alias(
            "shapley_x1"
        ),
        F.round((F.col("r2_2") + (F.col("r2_full") - F.col("r2_1"))) / 2, 4).alias(
            "shapley_x2"
        ),
    )


_BUDGET_TOKENS = 1_000_000
_ANNEAL_FRACTION = 0.1   # last 10% of the budget
_ALPHA = 0.7             # temperature exponent, as llm_mixture_temperature
_BOOST = 2.0             # annealing upweight for top-half-quality sources


@register(
    "llm_anneal_schedule",
    CAT_TEXT,
    f"""
    WITH per_src AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS chars,
             AVG(CAST(n_chars AS DOUBLE)) AS avg_len
      FROM documents GROUP BY source
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY avg_len DESC, source)
                  <= (SELECT COUNT(*) FROM per_src) / 2 AS boosted
      FROM per_src
    ),
    wts AS (
      SELECT source, chars, boosted,
             POWER(chars, {_ALPHA}) AS w1,
             POWER(chars, {_ALPHA})
               * CASE WHEN boosted THEN {_BOOST} ELSE 1.0 END AS w2
      FROM ranked
    ),
    tot AS (SELECT SUM(w1) AS t1, SUM(w2) AS t2 FROM wts)
    SELECT w.source, w.chars, w.boosted,
           CAST(ROUND({_BUDGET_TOKENS} * {1 - _ANNEAL_FRACTION} * w.w1 / t.t1,
                      0) AS BIGINT) AS phase1_tokens,
           CAST(ROUND({_BUDGET_TOKENS} * {_ANNEAL_FRACTION} * w.w2 / t.t2,
                      0) AS BIGINT) AS phase2_tokens
    FROM wts w, tot t
    """,
)
def llm_anneal_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase pretraining data schedule: the main phase samples
    sources by temperature-flattened size (w ∝ chars^α, the
    llm_mixture_temperature law), the final annealing phase (last 10% of
    the token budget) doubles the weight of the top-half-quality sources
    (avg doc length as the stand-in quality score) — the standard
    end-of-training quality-upsample. Output: per-source token budgets
    for BOTH phases, from one aggregate pass. Budget rounding is to the
    nearest token; phases are planned independently so a source can be
    (and typically is) upweighted only in the tail.

    Scale shape: one source-grain aggregate (map-combinable), a
    source-count window for the quality split, and broadcast weight
    totals — schedule cost is O(sources)."""
    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.sum("n_chars").cast("bigint").alias("chars"),
        F.avg(F.col("n_chars").cast("double")).alias("avg_len"),
    )
    n_src = per_src.count()
    ranked = per_src.withColumn(
        "boosted",
        F.row_number().over(Window.orderBy(F.col("avg_len").desc(), "source"))
        <= n_src // 2,
    )
    wts = ranked.select(
        "source",
        "chars",
        "boosted",
        F.pow(F.col("chars"), _ALPHA).alias("w1"),
        (
            F.pow(F.col("chars"), _ALPHA)
            * F.when(F.col("boosted"), _BOOST).otherwise(1.0)
        ).alias("w2"),
    )
    tot = wts.agg(F.sum("w1").alias("t1"), F.sum("w2").alias("t2"))
    return wts.crossJoin(F.broadcast(tot)).select(
        "source",
        "chars",
        "boosted",
        F.round(
            _BUDGET_TOKENS * (1 - _ANNEAL_FRACTION) * F.col("w1") / F.col("t1"), 0
        )
        .cast("bigint")
        .alias("phase1_tokens"),
        F.round(_BUDGET_TOKENS * _ANNEAL_FRACTION * F.col("w2") / F.col("t2"), 0)
        .cast("bigint")
        .alias("phase2_tokens"),
    )
