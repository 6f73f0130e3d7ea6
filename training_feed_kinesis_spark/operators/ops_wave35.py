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


@register(
    "ml_gbdt_stumps",
    CAT_ML,
    f"""
    WITH li AS (
      SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
    ),
    grid AS (SELECT unnest([{_GRID_SQL}]) AS t),
    base AS (
      SELECT COUNT(*)::DOUBLE AS n,
             AVG(y * y) - AVG(y) * AVG(y) AS mse0
      FROM li
    ),
    cand1 AS (
      SELECT g.t,
             AVG(CASE WHEN li.x <= g.t THEN li.y END) AS ml,
             AVG(CASE WHEN li.x >  g.t THEN li.y END) AS mr,
             AVG(CASE WHEN li.x <= g.t THEN 1.0 ELSE 0.0 END) AS wl,
             AVG(li.y * li.y) AS myy
      FROM li CROSS JOIN grid g GROUP BY g.t
    ),
    scored1 AS (
      SELECT t, ml, mr,
             myy - wl * ml * ml - (1 - wl) * mr * mr AS mse
      FROM cand1
    ),
    best1 AS (
      SELECT t, ml, mr, mse FROM scored1
      ORDER BY ROUND(mse, 4) ASC, t ASC LIMIT 1
    ),
    resid AS (
      SELECT li.x,
             li.y - CASE WHEN li.x <= b.t THEN b.ml ELSE b.mr END AS y
      FROM li CROSS JOIN best1 b
    ),
    cand2 AS (
      SELECT g.t,
             AVG(CASE WHEN r.x <= g.t THEN r.y END) AS ml,
             AVG(CASE WHEN r.x >  g.t THEN r.y END) AS mr,
             AVG(CASE WHEN r.x <= g.t THEN 1.0 ELSE 0.0 END) AS wl,
             AVG(r.y * r.y) AS myy
      FROM resid r CROSS JOIN grid g GROUP BY g.t
    ),
    scored2 AS (
      SELECT t, ml, mr,
             myy - wl * ml * ml - (1 - wl) * mr * mr AS mse
      FROM cand2
    ),
    best2 AS (
      SELECT t, ml, mr, mse FROM scored2
      ORDER BY ROUND(mse, 4) ASC, t ASC LIMIT 1
    )
    SELECT 1::BIGINT AS step, CAST(b.t AS BIGINT) AS threshold,
           ROUND((SELECT mse0 FROM base), 4) AS mse_before,
           ROUND(b.mse, 4) AS mse_after,
           ROUND(b.ml, 4) AS left_value, ROUND(b.mr, 4) AS right_value
    FROM best1 b
    UNION ALL
    SELECT 2::BIGINT, CAST(b2.t AS BIGINT),
           ROUND((SELECT mse FROM best1), 4),
           ROUND(b2.mse, 4),
           ROUND(b2.ml, 4), ROUND(b2.mr, 4)
    FROM best2 b2
    """,
)
def ml_gbdt_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rounds of gradient-boosted regression stumps (squared loss,
    learning rate 1): round 1 fits the best single split of price on a
    fixed quantity-threshold grid (argmin MSE, ranked on ROUND(mse,4)
    with threshold tiebreak — never raw-float argmin across engines);
    round 2 fits the residuals. Per round: candidate grid broadcast,
    per-candidate sufficient statistics in ONE aggregate (MSE from
    weighted leaf means — no per-candidate data pass), residual recompute
    from the broadcast 1-row winner.

    Scale shape: each round = one scan + one |grid|-row shuffle; the model
    state that moves between rounds is one row. Deeper grids/more rounds
    scale the aggregate width, never the number of data passes per round
    — the classic histogram-based GBDT layout (LightGBM-style) expressed
    relationally."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y")
    )
    grid = spark.createDataFrame([(t,) for t in STUMP_GRID], "t int")
    base = li.agg(
        (F.avg(F.col("y") * F.col("y")) - F.avg("y") * F.avg("y")).alias("mse0")
    )

    def round_fit(data):
        cand = (
            data.crossJoin(F.broadcast(grid))
            .groupBy("t")
            .agg(
                F.avg(F.when(F.col("x") <= F.col("t"), F.col("y"))).alias("ml"),
                F.avg(F.when(F.col("x") > F.col("t"), F.col("y"))).alias("mr"),
                F.avg(
                    F.when(F.col("x") <= F.col("t"), 1.0).otherwise(0.0)
                ).alias("wl"),
                F.avg(F.col("y") * F.col("y")).alias("myy"),
            )
        )
        scored = cand.select(
            "t",
            "ml",
            "mr",
            (
                F.col("myy")
                - F.col("wl") * F.col("ml") * F.col("ml")
                - (1 - F.col("wl")) * F.col("mr") * F.col("mr")
            ).alias("mse"),
        )
        w = Window.orderBy(F.round("mse", 4).asc(), F.col("t").asc())
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    best1 = round_fit(li)
    resid = li.crossJoin(F.broadcast(best1.select("t", "ml", "mr"))).select(
        "x",
        (
            F.col("y")
            - F.when(F.col("x") <= F.col("t"), F.col("ml")).otherwise(F.col("mr"))
        ).alias("y"),
    )
    best2 = round_fit(resid)
    row1 = best1.crossJoin(F.broadcast(base)).select(
        F.lit(1).cast("long").alias("step"),
        F.col("t").cast("long").alias("threshold"),
        F.round("mse0", 4).alias("mse_before"),
        F.round("mse", 4).alias("mse_after"),
        F.round("ml", 4).alias("left_value"),
        F.round("mr", 4).alias("right_value"),
    )
    row2 = best2.crossJoin(
        F.broadcast(best1.select(F.col("mse").alias("mse_prev")))
    ).select(
        F.lit(2).cast("long").alias("step"),
        F.col("t").cast("long").alias("threshold"),
        F.round("mse_prev", 4).alias("mse_before"),
        F.round("mse", 4).alias("mse_after"),
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
