"""Wave 35: ridge regression closed-form, boosted stumps, preference pairs.

  * ``ml_ridge_closed_form``: 2-feature ridge regression solved exactly
    from one aggregation pass (moment matrix + analytic 2×2 inverse) —
    the regularized upgrade of ``agg_regression``; no gradient loop, no
    driver round-trips.
  * ``ml_gbdt_stumps``: two boosting rounds of regression stumps over a
    fixed threshold grid — gradient boosting as a relational plan
    (candidate-grid aggregate → argmin → residual recompute), the same
    unrolled-iteration idiom as ``ml_kmeans_step``/``ml_logreg_step``.
  * ``llm_preference_pairs``: reward-model training-pair mining — per
    (lang, source) slice, pair the highest-quality doc (chosen) with the
    lowest (rejected) plus the score margin; degenerate slices (margin 0)
    are dropped, matching how RLHF pipelines skip uninformative pairs.

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

CAT_ML = "2.L ML-relational"
CAT_TEXT = "2.J llm-pipeline (text)"

RIDGE_LAMBDA = 0.1          # on the covariance-normalized system
STUMP_GRID = (10, 20, 30, 40)   # l_quantity split candidates


@register(
    "ml_ridge_closed_form",
    CAT_ML,
    f"""
    WITH m AS (
      SELECT COUNT(*)::DOUBLE AS n,
             AVG(l_quantity) AS mx1, AVG(l_discount) AS mx2,
             AVG(l_extendedprice) AS my,
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
    solved AS (
      SELECT n, mx1, mx2, my, c11, c12, c22, c1y, c2y, cyy,
             ((c22 + {RIDGE_LAMBDA}) * c1y - c12 * c2y)
             / ((c11 + {RIDGE_LAMBDA}) * (c22 + {RIDGE_LAMBDA}) - c12 * c12)
               AS b1,
             ((c11 + {RIDGE_LAMBDA}) * c2y - c12 * c1y)
             / ((c11 + {RIDGE_LAMBDA}) * (c22 + {RIDGE_LAMBDA}) - c12 * c12)
               AS b2
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           ROUND(my - b1 * mx1 - b2 * mx2, 4) AS b0,
           ROUND(b1, 4) AS b1,
           ROUND(b2, 4) AS b2,
           ROUND(1.0 - (cyy - 2 * b1 * c1y - 2 * b2 * c2y
                        + b1 * b1 * c11 + 2 * b1 * b2 * c12 + b2 * b2 * c22)
                       / cyy, 4) AS r2
    FROM solved
    """,
)
def ml_ridge_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression price ~ quantity + discount, solved in closed form:
    one combinable aggregation computes the 2×2 covariance system, the
    analytic inverse yields coefficients, and training R² follows from the
    same moments (SSE = cyy − 2bᵀc_y + bᵀCb) — no second data pass.

    Scale shape: ONE map-side-combinable aggregate over the fact table →
    a single 10-double row; everything after is constant-time scalar
    algebra. At 100 TB this is a full-scan-one-shuffle job, and adding
    features grows the moment row as d², not the data passes. The same
    moments solve any λ — sweeping regularization costs zero extra scans
    (fit the Gram once, reuse per λ)."""
    li = load_table(spark, sf_dir, "lineitem")
    x1, x2, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    m = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg(x1).alias("mx1"),
        F.avg(x2).alias("mx2"),
        F.avg(y).alias("my"),
        (F.avg(x1 * x1) - F.avg(x1) * F.avg(x1)).alias("c11"),
        (F.avg(x1 * x2) - F.avg(x1) * F.avg(x2)).alias("c12"),
        (F.avg(x2 * x2) - F.avg(x2) * F.avg(x2)).alias("c22"),
        (F.avg(x1 * y) - F.avg(x1) * F.avg(y)).alias("c1y"),
        (F.avg(x2 * y) - F.avg(x2) * F.avg(y)).alias("c2y"),
        (F.avg(y * y) - F.avg(y) * F.avg(y)).alias("cyy"),
    )
    lam = F.lit(RIDGE_LAMBDA)
    det = (F.col("c11") + lam) * (F.col("c22") + lam) - F.col("c12") * F.col("c12")
    b1 = ((F.col("c22") + lam) * F.col("c1y") - F.col("c12") * F.col("c2y")) / det
    b2 = ((F.col("c11") + lam) * F.col("c2y") - F.col("c12") * F.col("c1y")) / det
    solved = m.select(
        "*", b1.alias("b1"), b2.alias("b2")
    )
    sse_over_n = (
        F.col("cyy")
        - 2 * F.col("b1") * F.col("c1y")
        - 2 * F.col("b2") * F.col("c2y")
        + F.col("b1") * F.col("b1") * F.col("c11")
        + 2 * F.col("b1") * F.col("b2") * F.col("c12")
        + F.col("b2") * F.col("b2") * F.col("c22")
    )
    return solved.select(
        F.col("n").cast("long").alias("n_rows"),
        F.round(
            F.col("my") - F.col("b1") * F.col("mx1") - F.col("b2") * F.col("mx2"),
            4,
        ).alias("b0"),
        F.round("b1", 4).alias("b1"),
        F.round("b2", 4).alias("b2"),
        F.round(1.0 - sse_over_n / F.col("cyy"), 4).alias("r2"),
    )


_GRID_SQL = ", ".join(str(t) for t in STUMP_GRID)

# Shared stump math (r10 ROUND-magnitude seam, SURVEY 5.3.9): the leaf
# MSE is ~9e8 dollars-squared, where the old AVG-based spelling had
# engine-ordered float accumulation AND DuckDB's lossy ROUND(x, 4)
# grid. Exact quantized moments (per-term DECIMAL(38,0) widening) make
# every statistic ONE identical float expression on identical inputs;
# the argmin ranks the RAW mse (identical doubles need no rounding, and
# ROUND in the ORDER BY would re-introduce the seam), and mse columns
# are emitted UNROUNDED. Complete-case rows (x and y non-NULL) on both
# engines.

_STUMP_CAND_AGGS = (
    "COUNT(CASE WHEN x <= t THEN yq END) AS nl, "
    "COUNT(CASE WHEN x > t THEN yq END) AS nr, "
    "CAST(COALESCE(SUM(CASE WHEN x <= t THEN CAST(yq AS DECIMAL(38,0)) END), 0)"
    " AS DECIMAL(38,0)) AS sl, "
    "CAST(COALESCE(SUM(CASE WHEN x > t THEN CAST(yq AS DECIMAL(38,0)) END), 0)"
    " AS DECIMAL(38,0)) AS sr, "
    "CAST(COALESCE(SUM(CAST(yq AS DECIMAL(38,0)) * yq), 0)"
    " AS DECIMAL(38,0)) AS syy, "
    "COUNT(yq) AS n"
)


def _stump_mse(unit2: str) -> str:
    return (
        "CASE WHEN nl > 0 AND nr > 0 THEN "
        "(CAST(syy AS DOUBLE)"
        " - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)"
        " - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE))"
        f" / (CAST(n AS DOUBLE) * {unit2}) END"
    )


def _stump_mean(side: str, unit: str) -> str:
    return (
        f"CASE WHEN n{side} > 0 THEN CAST(s{side} AS DOUBLE)"
        f" / (CAST(n{side} AS DOUBLE) * {unit}) END"
    )


@register(
    "ml_gbdt_stumps",
    CAT_ML,
    f"""
    WITH li AS (
      SELECT l_quantity AS x,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS yq,
             l_extendedprice AS y
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    grid AS (SELECT unnest([{_GRID_SQL}]) AS t),
    base AS (
      SELECT COUNT(yq) AS n,
             CAST(COALESCE(SUM(CAST(yq AS DECIMAL(38,0))), 0)
                  AS DECIMAL(38,0)) AS sy,
             CAST(COALESCE(SUM(CAST(yq AS DECIMAL(38,0)) * yq), 0)
                  AS DECIMAL(38,0)) AS syy
      FROM li
    ),
    base_mse AS (
      SELECT (CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(n AS DOUBLE) * 1e4) AS mse0
      FROM base
    ),
    cand1 AS (
      SELECT g.t, {_STUMP_CAND_AGGS}
      FROM li CROSS JOIN grid g GROUP BY g.t
    ),
    scored1 AS (
      SELECT t, {_stump_mean("l", "100.0")} AS ml,
             {_stump_mean("r", "100.0")} AS mr,
             {_stump_mse("1e4")} AS mse
      FROM cand1
    ),
    best1 AS (
      SELECT t, ml, mr, mse FROM scored1
      ORDER BY mse ASC NULLS LAST, t ASC LIMIT 1
    ),
    resid AS (
      SELECT li.x,
             CAST(ROUND((li.y - CASE WHEN li.x <= b.t THEN b.ml ELSE b.mr END)
                        * 10000, 0) AS BIGINT) AS yq
      FROM li CROSS JOIN best1 b
    ),
    cand2 AS (
      SELECT g.t, {_STUMP_CAND_AGGS}
      FROM resid CROSS JOIN grid g GROUP BY g.t
    ),
    scored2 AS (
      SELECT t, {_stump_mean("l", "10000.0")} AS ml,
             {_stump_mean("r", "10000.0")} AS mr,
             {_stump_mse("1e8")} AS mse
      FROM cand2
    ),
    best2 AS (
      SELECT t, ml, mr, mse FROM scored2
      ORDER BY mse ASC NULLS LAST, t ASC LIMIT 1
    )
    SELECT 1::BIGINT AS step, CAST(b.t AS BIGINT) AS threshold,
           (SELECT mse0 FROM base_mse) AS mse_before,
           b.mse AS mse_after,
           ROUND(b.ml, 4) AS left_value, ROUND(b.mr, 4) AS right_value
    FROM best1 b
    UNION ALL
    SELECT 2::BIGINT, CAST(b2.t AS BIGINT),
           (SELECT mse FROM best1),
           b2.mse,
           ROUND(b2.ml, 4), ROUND(b2.mr, 4)
    FROM best2 b2
    """,
)
def ml_gbdt_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rounds of gradient-boosted regression stumps (squared loss,
    learning rate 1): round 1 fits the best single split of price on a
    fixed quantity-threshold grid, round 2 fits the residuals. Per
    round: candidate grid broadcast, per-candidate sufficient statistics
    in ONE aggregate (exact quantized moments — cents in round 1,
    1e-4-dollar residual units in round 2), MSE as one shared float
    expression over those exact moments, argmin on the RAW mse with
    threshold tiebreak, residual recompute from the broadcast 1-row
    winner. mse columns are emitted UNROUNDED: at ~9e8 dollars-squared a
    4dp round sits inside DuckDB's lossy ROUND grid (SURVEY 5.3.9) —
    identical doubles need no round.

    Scale shape: each round = one scan + one |grid|-row shuffle; the
    model state that moves between rounds is one row. Deeper grids/more
    rounds scale the aggregate width, never the number of data passes
    per round — the classic histogram-based GBDT layout (LightGBM-style)
    expressed relationally."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_quantity").isNotNull()
            & F.col("l_extendedprice").isNotNull()
        )
        .select(
            F.col("l_quantity").alias("x"),
            F.expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)")
            .alias("yq"),
            F.col("l_extendedprice").alias("y"),
        )
    )
    grid = spark.createDataFrame([(t,) for t in STUMP_GRID], "t int")
    base = li.agg(
        F.expr(
            "(CAST(CAST(COALESCE(SUM(CAST(yq AS DECIMAL(38,0)) * yq), 0)"
            " AS DECIMAL(38,0)) AS DOUBLE)"
            " - CAST(CAST(COALESCE(SUM(CAST(yq AS DECIMAL(38,0))), 0)"
            "        AS DECIMAL(38,0)) AS DOUBLE)"
            " * CAST(CAST(COALESCE(SUM(CAST(yq AS DECIMAL(38,0))), 0)"
            "        AS DECIMAL(38,0)) AS DOUBLE) / CAST(COUNT(yq) AS DOUBLE))"
            " / (CAST(COUNT(yq) AS DOUBLE) * 1e4)"
        ).alias("mse0")
    )

    def round_fit(data, unit: str, unit2: str):
        cand = (
            data.crossJoin(F.broadcast(grid))
            .groupBy("t")
            .agg(
                F.expr("COUNT(CASE WHEN x <= t THEN yq END)").alias("nl"),
                F.expr("COUNT(CASE WHEN x > t THEN yq END)").alias("nr"),
                F.expr(
                    "CAST(COALESCE(SUM(CASE WHEN x <= t THEN"
                    " CAST(yq AS DECIMAL(38,0)) END), 0) AS DECIMAL(38,0))"
                ).alias("sl"),
                F.expr(
                    "CAST(COALESCE(SUM(CASE WHEN x > t THEN"
                    " CAST(yq AS DECIMAL(38,0)) END), 0) AS DECIMAL(38,0))"
                ).alias("sr"),
                F.expr(
                    "CAST(COALESCE(SUM(CAST(yq AS DECIMAL(38,0)) * yq), 0)"
                    " AS DECIMAL(38,0))"
                ).alias("syy"),
                F.expr("COUNT(yq)").alias("n"),
            )
        )
        scored = cand.select(
            "t",
            F.expr(_stump_mean("l", unit)).alias("ml"),
            F.expr(_stump_mean("r", unit)).alias("mr"),
            F.expr(_stump_mse(unit2)).alias("mse"),
        )
        w = Window.orderBy(F.col("mse").asc_nulls_last(), F.col("t").asc())
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    best1 = round_fit(li, "100.0", "1e4")
    resid = li.crossJoin(F.broadcast(best1.select("t", "ml", "mr"))).select(
        "x",
        F.expr(
            "CAST(ROUND((y - CASE WHEN x <= t THEN ml ELSE mr END) * 10000,"
            " 0) AS BIGINT)"
        ).alias("yq"),
    )
    best2 = round_fit(resid, "10000.0", "1e8")
    row1 = best1.crossJoin(F.broadcast(base)).select(
        F.lit(1).cast("long").alias("step"),
        F.col("t").cast("long").alias("threshold"),
        F.col("mse0").alias("mse_before"),
        F.col("mse").alias("mse_after"),
        F.round("ml", 4).alias("left_value"),
        F.round("mr", 4).alias("right_value"),
    )
    row2 = best2.crossJoin(
        F.broadcast(best1.select(F.col("mse").alias("mse_prev")))
    ).select(
        F.lit(2).cast("long").alias("step"),
        F.col("t").cast("long").alias("threshold"),
        F.col("mse_prev").alias("mse_before"),
        F.col("mse").alias("mse_after"),
        F.round("ml", 4).alias("left_value"),
        F.round("mr", 4).alias("right_value"),
    )
    return row1.unionByName(row2)


@register(
    "llm_preference_pairs",
    CAT_TEXT,
    """
    WITH scored AS (
      SELECT doc_id, lang, source,
             ROUND(len(list_distinct(string_split(lower(text), ' ')))::DOUBLE
                   / GREATEST(len(string_split(lower(text), ' ')), 1), 4)
               AS quality
      -- id-less docs excluded (r10 max-tie sweep): chosen/rejected are
      -- doc_id citations, and a NULL-id election both made the winner
      -- engine-dependent AND silently dropped the pair through the
      -- three-valued t.doc_id != b.doc_id filter
      FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL
    ),
    ranked AS (
      SELECT doc_id, lang, source, quality,
             ROW_NUMBER() OVER (PARTITION BY lang, source
                                ORDER BY quality DESC, doc_id ASC) AS rn_top,
             ROW_NUMBER() OVER (PARTITION BY lang, source
                                ORDER BY quality ASC, doc_id ASC) AS rn_bot
      FROM scored
    )
    SELECT t.lang, t.source,
           t.doc_id AS chosen_id, b.doc_id AS rejected_id,
           t.quality AS chosen_q, b.quality AS rejected_q,
           ROUND(t.quality - b.quality, 4) AS margin
    FROM ranked t
    JOIN ranked b ON b.lang = t.lang AND b.source = t.source AND b.rn_bot = 1
    WHERE t.rn_top = 1 AND t.doc_id != b.doc_id
      AND ROUND(t.quality - b.quality, 4) > 0
    """,
)
def llm_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reward-model preference-pair mining: per (lang, source) slice, pair
    the highest-quality document (chosen) with the lowest (rejected),
    quality = rounded type-token ratio (deterministic, engine-free; rank
    on the ROUNDED score with doc_id tiebreak). Slices where the pair is
    degenerate (same doc, or zero margin at emitted precision) yield no
    pair — uninformative comparisons are exactly what RLHF data builders
    drop.

    Scale shape: scoring is row-local; both rankings ride ONE window
    shuffle on (lang, source); the self-join joins two one-row-per-slice
    extracts (slice-count-bounded, broadcastable). A per-slice top-k
    variant (k chosen × k rejected) only widens the window output, not
    the shuffles."""
    # complete-case: a NULL-text doc has no quality score, and the two
    # rank windows would place its NULL differently per engine (Spark
    # ASC = NULLS FIRST vs DuckDB NULLS LAST — doc-corruption replay).
    # Id-less docs excluded too (r10 max-tie sweep): chosen/rejected are
    # doc_id citations, and a NULL-id election made the winner
    # engine-dependent and NULL-poisoned the != filter.
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("doc_id").isNotNull()
    )
    toks = F.split(F.lower("text"), " ")
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        F.round(
            F.size(F.array_distinct(toks)).cast("double")
            / F.greatest(F.size(toks), F.lit(1)),
            4,
        ).alias("quality"),
    )
    w_top = Window.partitionBy("lang", "source").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    w_bot = Window.partitionBy("lang", "source").orderBy(
        F.col("quality").asc(), F.col("doc_id").asc()
    )
    ranked = scored.select(
        "*",
        F.row_number().over(w_top).alias("rn_top"),
        F.row_number().over(w_bot).alias("rn_bot"),
    )
    top = ranked.filter(F.col("rn_top") == 1).select(
        "lang",
        "source",
        F.col("doc_id").alias("chosen_id"),
        F.col("quality").alias("chosen_q"),
    )
    bot = ranked.filter(F.col("rn_bot") == 1).select(
        "lang",
        "source",
        F.col("doc_id").alias("rejected_id"),
        F.col("quality").alias("rejected_q"),
    )
    return (
        top.join(bot, ["lang", "source"])
        .withColumn("margin", F.round(F.col("chosen_q") - F.col("rejected_q"), 4))
        .filter(
            (F.col("chosen_id") != F.col("rejected_id")) & (F.col("margin") > 0)
        )
    )
